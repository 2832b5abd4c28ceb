"""Scalar/aggregate function helpers shared across operators."""

from .compare import (
    cents,
    cents_long,
    cents_sql,
    chunk_id,
    dsum,
    q2,
    q2_sql,
    qavg,
    qavg_sql,
    qsum,
    qsum_sql,
)

__all__ = ["cents", "cents_long", "cents_sql", "chunk_id", "dsum",
           "q2", "q2_sql", "qavg", "qavg_sql", "qsum", "qsum_sql"]
