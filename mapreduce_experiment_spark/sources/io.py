"""Format round-trip helpers: parquet / ORC / CSV / JSON sinks and
schema-checked readers.

The reference has no writers at all and only a text-line reader
(SURVEY §2: "File formats other than text; no writers of any kind").
Here every sink defaults to snappy-compressed columnar output, and
every reader takes an explicit schema — schema inference is banned at
100 TB (it is an extra full scan for CSV/JSON).

Delta/Iceberg/Hudi connectors need their jars on the classpath, which
this environment does not ship — gated behind an import-try stub.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FORMATS = ("parquet", "orc", "csv", "json")


def write(df: DataFrame, path: str, fmt: str = "parquet",
          mode: str = "overwrite", partition_by: list[str] | None = None,
          **options) -> None:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; use one of {FORMATS}")
    w = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        w = w.option("header", "true")
    if partition_by:
        w = w.partitionBy(*partition_by)
    for k, v in options.items():
        w = w.option(k, v)
    w.save(path)


def read(spark: SparkSession, path: str, fmt: str = "parquet",
         schema: T.StructType | str | None = None, **options) -> DataFrame:
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; use one of {FORMATS}")
    r = spark.read.format(fmt)
    if schema is not None:
        r = r.schema(schema)
    elif fmt in ("csv", "json"):
        raise ValueError(
            f"{fmt} reads require an explicit schema (inference is an "
            "extra full scan — banned at scale)")
    if fmt == "csv":
        r = r.option("header", "true")
    for k, v in options.items():
        r = r.option(k, v)
    return r.load(path)


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   n_buckets: int = 32, mode: str = "overwrite") -> None:
    """Save as a bucketed managed table.

    Bucketing pre-shuffles data at WRITE time: two tables bucketed the
    same way on the join key sort-merge-join with NO exchange — the
    strategy for repeatedly-joined 100 TB fact tables (pay the shuffle
    once, reuse it every query). See tests/test_io.py for the
    plan-level proof.
    """
    (df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
       .sortBy(*bucket_cols).saveAsTable(table))


def gc_stale_dirs(base: str, prefix: str, keep_prefix: str | None = None,
                  horizon_s: int = 86400) -> None:
    """Best-effort sweep of stale per-session artifact directories
    (persisted index tables, streaming sink runs) under ``base``:
    remove ``prefix*`` dirs older than ``horizon_s`` that do not also
    match ``keep_prefix`` (the CURRENT session's own dirs).

    The 24 h default horizon is deliberately NOT session-scale: a
    long-lived concurrent session that wrote its artifact hours ago
    can lazily re-execute a DataFrame that still reads those files,
    and deleting them mid-scan would fail ITS query — a day
    comfortably outlives any session on one box while still bounding
    disk leakage from per-app naming. Failures are swallowed: GC must
    never break the query that triggered it — and swallowed PER
    DIRECTORY (r7 ADVICE): a sibling racing to deletion mid-sweep
    (its getmtime throws) must not abort the remaining iterations, or
    stale dirs sorting after the racer would survive every sweep.
    """
    import os
    import shutil
    import time

    try:
        entries = os.listdir(base)
    except OSError:
        return  # base not created yet — nothing to sweep
    for d in entries:
        if not d.startswith(prefix):
            continue
        if keep_prefix is not None and d.startswith(keep_prefix):
            continue
        full = os.path.join(base, d)
        try:
            if time.time() - os.path.getmtime(full) > horizon_s:
                shutil.rmtree(full, ignore_errors=True)
        except OSError:
            continue


def repo_warehouse(*subdirs: str) -> str:
    """Absolute path under the repo's gitignored ``spark-warehouse``
    (created on demand) — the ONE shared home for per-session
    persisted artifacts (index tables, streaming sink runs), so every
    session's GC sweep sees every session's dirs regardless of what
    ``spark.sql.warehouse.dir`` each session carries."""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    base = os.path.join(repo, "spark-warehouse", *subdirs)
    os.makedirs(base, exist_ok=True)
    return base


def app_artifact_dir(spark: SparkSession, prefix: str, tag: str,
                     subdir: str | None = None) -> str:
    """The per-(Spark application, tag) artifact-directory contract in
    ONE place (r7 ADVICE — three inline copies invited drift in the
    keep_prefix/horizon contract): returns
    ``<repo_warehouse>[/subdir]/<prefix><appId>_<tag>`` after sweeping
    day-old ``prefix`` siblings from PAST applications.

    The app-id naming is what makes concurrent sessions safe (a
    driver-verify run and a local pytest run must never overwrite
    index files the other's already-planned scan is lazily reading);
    the sweep is what stops that naming leaking disk; ``keep_prefix``
    exempts the CURRENT application's dirs so a long session never
    GCs its own artifacts. The dir itself is not pre-created — table
    and stream writers create their own target."""
    import os

    app = spark.sparkContext.applicationId.replace("-", "_")
    base = repo_warehouse(*((subdir,) if subdir else ()))
    gc_stale_dirs(base, prefix, keep_prefix=f"{prefix}{app}_")
    return os.path.join(base, f"{prefix}{app}_{tag}")


def write_delta(df: DataFrame, path: str, **options) -> None:
    """Delta Lake sink — STUB: requires delta-spark jars, not present
    in this environment."""
    try:
        import delta  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "Delta Lake requires the delta-spark package and jars, "
            "which are not available in this environment") from e
    df.write.format("delta").options(**options).save(path)
