"""Structured Streaming variants of the engine's event operators."""

from .pipeline import streaming_hourly_counts

__all__ = ["streaming_hourly_counts"]
