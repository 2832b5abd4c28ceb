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
    # coalesce to '' (r14 adversarial rehearsal): the engine folds a
    # NULL payload (encode of NULL text) to an ALL-ZERO histogram —
    # the defined-behavior choice pinned in extract_features — while
    # the raw _CLEAN let a NULL-text doc emit NULL b0..b15 here. The
    # metadata/frame oracles keep raw _CLEAN deliberately: there the
    # engine also yields NULL n_bytes / drops the frameless row, so
    # NULL-in-NULL-out already matches.
    oracle=f"""
WITH c AS (SELECT doc_id AS media_id, coalesce({_CLEAN}, '') AS s
           FROM documents),
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


@register(
    "media_frame_sample",
    oracle=f"""
WITH m AS (SELECT doc_id AS media_id, {_CLEAN} AS s FROM documents),
f AS (SELECT media_id, s,
             CAST(floor(length(s) / {MM.FRAME_BYTES}) AS BIGINT) AS nf
      FROM m),
idx AS (SELECT media_id, s,
               unnest(range(0, nf, {MM.FRAME_STRIDE})) AS frame_idx
        FROM f WHERE nf >= 1)
SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       md5(substring(s, CAST(frame_idx * {MM.FRAME_BYTES} + 1 AS BIGINT),
                     {MM.FRAME_BYTES})) AS frame_md5
FROM idx
""",
)
def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every 4th 32-byte frame of each payload, fingerprinted — the
    frame-sampling plumbing of a video pipeline, minus codecs. Spark
    slices the real BINARY column; the oracle slices the equivalent
    ASCII string (chars == bytes by construction), so the md5s must
    agree byte-for-byte."""
    media = MM.build_media_table(load_table(spark, sf_dir, "documents"))
    return MM.sample_frames(media)
