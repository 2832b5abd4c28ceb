"""Profiling / robustness queries: SQL-API entry, grouping sets, full
outer join, exact distribution stats, salted hot-key aggregation, and
a generic column profiler."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table, register_views
from .registry import register


@register(
    "grouping_sets_sql",
    oracle="""
SELECT l_returnflag, l_linestatus, count(*) AS n,
       sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""",
)
def q_grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exercises the engine's SQL entry point (spark.sql over
    registered views — SURVEY §3.4 entry 3) with GROUPING SETS.

    The Spark-side ``/ 100.0`` is wrapped in CAST(... AS DOUBLE):
    Spark parses the literal ``100.0`` as DECIMAL, making ``sum_qty``
    a decimal(27,6) whose rendering ('506627.000000') hash-mismatches
    DuckDB's DOUBLE ('506627.0') even though the values are equal —
    the round-2 driver FAIL. DataFrame-API queries never hit this
    (a Python float is a double); only SQL-text entry points do."""
    register_views(spark, sf_dir, ("lineitem",))
    return spark.sql("""
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0
                    AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """)


@register(
    "nation_participants_full_outer",
    oracle="""
WITH c AS (SELECT c_nationkey AS nk, count(*) AS n_customers
           FROM customer GROUP BY c_nationkey),
s AS (SELECT s_nationkey AS nk, count(*) AS n_suppliers
      FROM supplier GROUP BY s_nationkey)
SELECT coalesce(c.nk, s.nk) AS nationkey,
       coalesce(n_customers, 0) AS n_customers,
       coalesce(n_suppliers, 0) AS n_suppliers
FROM c FULL OUTER JOIN s ON c.nk = s.nk
""",
)
def q_nation_participants_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (load_table(spark, sf_dir, "customer")
            .groupBy(F.col("c_nationkey").alias("nk"))
            .agg(F.count(F.lit(1)).alias("n_customers")))
    sup = (load_table(spark, sf_dir, "supplier")
           .groupBy(F.col("s_nationkey").alias("nk2"))
           .agg(F.count(F.lit(1)).alias("n_suppliers")))
    return (
        cust.join(sup, cust.nk == sup.nk2, "full_outer")
        .select(
            F.coalesce("nk", "nk2").alias("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


@register(
    "value_distribution_stats",
    oracle="""
WITH q AS (SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
           FROM events),
a AS (SELECT event_type, count(*) AS n, sum(cents) AS s,
             sum(CAST(cents AS HUGEINT) * cents) AS ss,
             min(cents) AS mn, max(cents) AS mx
      FROM q GROUP BY event_type)
SELECT event_type, n,
       mn / 100.0 AS min_value,
       mx / 100.0 AS max_value,
       floor(CAST(s AS DOUBLE) * 10000.0 / (100 * n) + 0.5) / 10000.0
         AS mean_value,
       CASE WHEN n > 1 THEN
         CASE WHEN CAST(n * ss - s * s AS DOUBLE)
                   / (CAST(n AS DOUBLE) * (n - 1)) < 9.0e18 THEN
           floor(CAST(n * ss - s * s AS DOUBLE)
                 / (CAST(n AS DOUBLE) * (n - 1)) + 0.5) / 10000.0
         ELSE
           CAST(n * ss - s * s AS DOUBLE)
           / (CAST(n AS DOUBLE) * (n - 1)) / 10000.0
         END
       END AS variance
FROM a
""",
)
def q_value_distribution_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution stats with EXACT integer moments: sum and
    sum-of-squares over cents accumulate exactly (order-independent),
    so mean and sample variance are bit-deterministic across engines —
    no Welford-vs-naive or summation-order drift. Sample variance of a
    single-row group is NULL on both sides (the n-1 denominator would
    otherwise hit IEEE-vs-error divide-by-zero divergence).

    The variance numerator is the EXACT integer ``n*ss - s*s``
    (decimal Spark-side, HUGEINT in DuckDB) converted to double ONCE,
    then one mirrored division — the old ``ss - s*s/n`` form
    subtracted two doubles of ~(n*mean²) magnitude whose cancellation
    rounded DIFFERENTLY per engine once values were large (r14
    review, reproduced at 2e9-cent values: 1.6384 vs 1.7067 for a
    true ~1.6667)."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    # Moments accumulate in DECIMAL, not long (r14 review): a cents²
    # term is ~1e14 for a 1e7-cent value, so the int64 sum overflows
    # around 1e5 such rows per group — an ANSI ARITHMETIC_OVERFLOW
    # that kills the query exactly at scale, while DuckDB's BIGINT
    # sum silently promotes to HUGEINT (the engines would diverge on
    # any data big enough to matter). decimal(19,0)² → decimal(38,0)
    # sums are exact to 1e38, and every consumer below converts to
    # double, so shipped-SF values are bit-identical.
    cc = F.col("cents").cast("decimal(19,0)")
    a = ev.select("event_type", cents.alias("cents")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cc).alias("s"),
        F.sum(cc * cc).alias("ss"),
        F.min("cents").alias("mn"),
        F.max("cents").alias("mx"),
    )
    # The cents² variance is floor(+0.5)-quantized only while the
    # quantization is REPRESENTABLE: Spark's floor(double) returns
    # LONG and silently SATURATES at int64 max (observed live:
    # variance 2.3e19 came back as exactly 2^63/1e4) while DuckDB's
    # floor stays DOUBLE — a silent cross-engine divergence for any
    # group whose value spread exceeds ~3e9 cents (r14 widened-domain
    # sweep). Past the 9.0e18 branch point the +0.5 is far below the
    # double ulp anyway, and the unquantized double is already
    # bit-deterministic (exact integer numerator, one conversion, one
    # division — same value both engines), so both engines emit it
    # raw. The branch compares the SAME double on both sides, so the
    # chosen arm can never differ.
    vc2 = ((F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
           .cast("double")
           / (F.col("n").cast("double") * (F.col("n") - 1)))
    return a.select(
        "event_type", "n",
        (F.col("mn") / 100.0).alias("min_value"),
        (F.col("mx") / 100.0).alias("max_value"),
        (F.floor(F.col("s") * 10000.0 / (100 * F.col("n")) + 0.5) / 10000.0)
            .alias("mean_value"),
        F.when(
            F.col("n") > 1,
            F.when(vc2 < 9.0e18, F.floor(vc2 + 0.5) / 10000.0)
             .otherwise(vc2 / 10000.0),
        ).alias("variance"),
    )


@register(
    "price_quantity_correlation",
    oracle="""
WITH q AS (
  SELECT l_returnflag,
         CAST(round(l_quantity * 100) AS BIGINT) AS x,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem
), m AS (
  SELECT l_returnflag, count(*) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(y AS HUGEINT) * y) AS syy,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         median(x) AS med_x
  FROM q GROUP BY l_returnflag
), v AS (
  SELECT l_returnflag, n, med_x,
         n * sxx - sx * sx AS varx,
         n * syy - sy * sy AS vary,
         n * sxy - sx * sy AS cov
  FROM m
)
SELECT l_returnflag, n,
       CASE WHEN varx > 0 AND vary > 0 THEN
         floor(CAST(cov AS DOUBLE)
               / (sqrt(CAST(varx AS DOUBLE)) * sqrt(CAST(vary AS DOUBLE)))
               * 1000000 + 0.5) / 1000000.0
       END AS corr_qty_price,
       med_x / 100.0 AS median_qty
FROM v
""",
)
def q_price_quantity_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + median from EXACT integer moments (the
    int64 sums are order-independent; the final double combination is
    deterministic on identical inputs). Engine corr()/stddev() would
    drift between Welford-style and naive implementations."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.round(F.col("l_quantity") * 100, 0).cast("long")
    y = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    # DECIMAL moment accumulators for the same reason as
    # value_distribution_stats above (r14 review): sum(y²) over
    # price cents overflows int64 near ~1e5 rows per group at TPC-H
    # price magnitudes — ANSI ARITHMETIC_OVERFLOW Spark-side while
    # DuckDB promotes to HUGEINT. All consumers cast to double.
    xd = F.col("x").cast("decimal(19,0)")
    yd = F.col("y").cast("decimal(19,0)")
    m = (
        li.select("l_returnflag", x.alias("x"), y.alias("y"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(xd).alias("sx"), F.sum(yd).alias("sy"),
            F.sum(xd * xd).alias("sxx"),
            F.sum(yd * yd).alias("syy"),
            F.sum(xd * yd).alias("sxy"),
            F.median("x").alias("med_x"),
        )
    )
    # The three second-moment terms are EXACT integers (decimal here,
    # HUGEINT in DuckDB), converted to double once — the old
    # per-engine double arithmetic (n*sxx as double, minus sx²) could
    # round its cancellation to a tiny NEGATIVE where the exact value
    # is ~0, feeding sqrt a negative (Spark NaN, DuckDB hard error).
    # Exact integers make varx/vary provably >= 0 (Cauchy-Schwarz),
    # and the CASE guard covers the zero-variance (constant-column)
    # group: unguarded, Spark 4's ANSI mode hard-fails DIVIDE_BY_ZERO
    # even for DOUBLE division while DuckDB yields NULL — one
    # constant-quantity returnflag group would kill the whole job on
    # one engine only (r14 adversarial TPC-H sweep).
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return m.select(
        "l_returnflag", "n",
        F.when(
            (varx > 0) & (vary > 0),
            F.floor(cov.cast("double")
                    / (F.sqrt(varx.cast("double"))
                       * F.sqrt(vary.cast("double")))
                    * 1_000_000 + 0.5) / 1_000_000.0,
        ).alias("corr_qty_price"),
        (F.col("med_x") / 100.0).alias("median_qty"),
    )


@register(
    "event_type_counts_salted",
    oracle="""
SELECT event_type, count(*) AS n_events
FROM events GROUP BY event_type
""",
)
def q_event_type_counts_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation for pathologically hot keys (5
    distinct event types over every row). Stage 1 aggregates on
    (key, salt) spreading each hot key over 32 reducers; stage 2
    combines the 32 partials. For algebraic aggregates Spark's own
    partial aggregation usually suffices — explicit salting is the
    pattern for when it doesn't (e.g. exact distinct under skew)."""
    ev = load_table(spark, sf_dir, "events")
    salted = ev.withColumn("_salt", (F.col("event_id") % 32).cast("int"))
    partial = (salted.groupBy("event_type", "_salt")
               .agg(F.count(F.lit(1)).alias("pn")))
    return (partial.groupBy("event_type")
            .agg(F.sum("pn").alias("n_events")))


_PROFILE_COLS = ("l_quantity", "l_extendedprice", "l_discount")


@register(
    "lineitem_profile",
    oracle=f"""
SELECT * FROM (
  {" UNION ALL ".join(
    f'''SELECT '{c}' AS column_name,
           count(*) AS n_rows,
           count({c}) AS n_non_null,
           count(DISTINCT {c}) AS n_distinct,
           CAST(round(min({c}) * 100) AS BIGINT) / 100.0 AS min_value,
           CAST(round(max({c}) * 100) AS BIGINT) / 100.0 AS max_value
    FROM lineitem'''
    for c in _PROFILE_COLS)}
)
""",
)
def q_lineitem_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler (data-quality sweep): one stats row per column.
    All three columns profile in ONE scan each via a union of narrow
    aggregates — Catalyst prunes each branch's read schema to its
    single column."""
    li = load_table(spark, sf_dir, "lineitem")
    parts = []
    for c in _PROFILE_COLS:
        parts.append(li.agg(
            F.lit(c).alias("column_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count(c).alias("n_non_null"),
            F.countDistinct(c).alias("n_distinct"),
            (F.round(F.min(c) * 100, 0).cast("long") / 100.0).alias("min_value"),
            (F.round(F.max(c) * 100, 0).cast("long") / 100.0).alias("max_value"),
        ))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
