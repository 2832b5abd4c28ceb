"""Named-query registry — the driver contract's backing store.

Every operator the engine claims (SURVEY §2 plus north-star
extensions) registers here as a ``(spark, sf_dir) -> DataFrame``
callable, optionally paired with the ANSI-SQL oracle DuckDB runs on
the same parquet tables. ``__spark_entry__.py`` just re-exports these.

Conventions (driver contract):

- Every computed column is aliased identically in the Spark plan and
  the oracle SQL — the driver sorts columns by name before hashing.
- Floating-point aggregates are rounded (ROUND(x, 2..6)) on BOTH
  sides so summation-order drift between engines can't flip a hash.
- Queries must be deterministic sets (no LIMIT without a total order).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    headline: bool = False  # included in bench.py


_REGISTRY: dict[str, QuerySpec] = {}

# Runtime-settable confs every query depends on. The driver invokes
# queries() with ITS OWN SparkSession, which need not have been built
# by session.get_session — without nanosAsLong every events read
# throws PARQUET_TYPE_ILLEGAL, and without UTC the oracle's timestamp
# values shift. Applied per query call (cheap, idempotent).
_REQUIRED_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.adaptive.enabled": "true",
}


def ensure_session_confs(spark: SparkSession) -> None:
    for k, v in _REQUIRED_CONFS.items():
        spark.conf.set(k, v)


def register(name: str, oracle: str | None = None, headline: bool = False):
    """Decorator: add a (spark, sf_dir) -> DataFrame query to the registry."""
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_session_confs(spark)
            return fn(spark, sf_dir)
        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        _REGISTRY[name] = QuerySpec(name, wrapped, oracle, headline)
        return fn
    return deco


def QUERIES() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_all()
    return {n: s.fn for n, s in _REGISTRY.items()}


def ORACLE_SQL() -> dict[str, str]:
    _load_all()
    return {n: s.oracle for n, s in _REGISTRY.items() if s.oracle is not None}


def SPECS() -> dict[str, QuerySpec]:
    _load_all()
    return dict(_REGISTRY)


_loaded = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _loaded
    if _loaded:
        return
    from . import queries_graph  # noqa: F401
    for mod in ("queries_relational", "queries_dedup", "queries_similarity",
                "queries_text", "queries_events", "queries_multimodal",
                "queries_asof", "queries_profiling", "queries_analytics"):
        try:
            __import__(f"{__package__}.{mod}", fromlist=[mod])
        except ImportError:
            pass  # module not built yet (incremental rounds)
    _loaded = True
