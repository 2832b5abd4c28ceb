"""Scalar/aggregate function helpers shared across operators."""

from .compare import q2, q2_sql, qavg, qavg_sql, qsum, qsum_sql

__all__ = ["q2", "q2_sql", "qavg", "qavg_sql", "qsum", "qsum_sql"]
