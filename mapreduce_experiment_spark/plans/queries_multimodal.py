"""Multimodal-column queries: binary payload plumbing, value-checked.

The oracle recomputes the byte histogram from codepoints (payloads
are ASCII by construction), which verifies the whole Spark path —
binary encode, mapInPandas Arrow batches, numpy featurizer — at the
value level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import multimodal as MM
from ..sources.tables import load_table
from .registry import register

_CLEAN = "regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')"
_KINDS_CASE = (
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'"
    " ELSE 'video' END"
)


@register(
    "media_metadata",
    oracle=f"""
SELECT doc_id AS media_id, {_KINDS_CASE} AS kind,
       CAST(length({_CLEAN}) AS BIGINT) AS n_bytes,
       'application/octet-stream' AS mime
FROM documents
""",
)
def q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.build_media_table(load_table(spark, sf_dir, "documents"))
    return MM.media_metadata(media)


_HIST_COLS = ",\n       ".join(
    f"CAST(len(list_filter(codes, x -> x = {i})) AS BIGINT) AS b{i}"
    for i in range(MM.N_BUCKETS)
)


@register(
    "media_byte_histograms",
    oracle=f"""
WITH c AS (SELECT doc_id AS media_id, {_CLEAN} AS s FROM documents),
h AS (SELECT media_id,
             list_transform(range(1, length(s) + 1),
                            i -> ascii(substr(s, i, 1)) % {MM.N_BUCKETS})
               AS codes
      FROM c)
SELECT media_id, {_HIST_COLS}
FROM h
""",
)
def q_media_byte_histograms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary featurization through the real mapInPandas path."""
    media = MM.build_media_table(load_table(spark, sf_dir, "documents"))
    return MM.extract_features(media)
