"""Global-ordering queries: deterministic corpus shuffle with a
value-level oracle.

The oracle replays the portable hash and ranks it with a plain global
``row_number()`` — trivially correct on DuckDB's single node, and the
exact formulation whose SINGLE-PARTITION window the Spark operator
exists to avoid. The hash match therefore proves the distributed
bucket/offset/within-rank algebra equals the naive global sort,
position for position.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.textfns import hash60_sql
from ..operators.ordering import corpus_shuffle
from ..sources.tables import load_table
from .registry import register

_SHUFFLE_SEED = "shuffle-v1"

_H = hash60_sql(f"concat('{_SHUFFLE_SEED}:', CAST(doc_id AS VARCHAR))")


@register(
    "corpus_shuffle",
    oracle=f"""
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY {_H}, doc_id) AS BIGINT)
         AS shuffle_pos
FROM documents
""",
    # headline (r7, r6 verdict item 4): the global-ordering path gets
    # round-over-round plan-work fingerprints alongside the r1-era
    # headliners.
    headline=True,
)
def q_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic seeded training-order shuffle of the corpus —
    the pre-training step that randomizes document order
    reproducibly. The naive ``row_number() OVER (ORDER BY hash)``
    funnels 100 TB through one task; this plan assigns the identical
    global positions scalably (range-bucket the uniform hash →
    per-bucket counts → B-row offset table → bucket-partitioned
    within-rank + broadcast offset join; see
    ``operators.ordering.corpus_shuffle``). Plan-pinned: the only
    single-partition exchange feeds the bucket-count table, never
    corpus rows."""
    return corpus_shuffle(load_table(spark, sf_dir, "documents"),
                          seed=_SHUFFLE_SEED)
