"""Multimodal-column queries: binary payloads + typed metadata over
the documents fixture. The metadata query is fully SQL-expressible
(payload = UTF-8 of text, so DuckDB's md5(text) equals Spark's
md5(binary)); decode-dependent operators get row-multiplicity oracles
or rows-only checks, with value determinism asserted in tests."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dagster_etl_spark.operators.multimodal import (
    extract_features,
    media_metadata,
    sample_frames,
    synth_media_table,
)
from dagster_etl_spark.registry import register
from dagster_etl_spark.sources.fixtures import load_table


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return synth_media_table(load_table(spark, sf_dir, "documents"))


_META_ORACLE = """
SELECT doc_id AS asset_id,
       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
       CAST(64 + doc_id % 448 AS INT) AS width,
       CAST(64 + (doc_id * 7) % 448 AS INT) AS height,
       CAST(1000 + (doc_id * 37) % 59000 AS BIGINT) AS duration_ms,
       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'opus' ELSE 'av1' END AS codec,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       md5(text) AS payload_md5
FROM documents
"""


@register(
    "media_metadata",
    oracle=_META_ORACLE,
    tags=("llm", "multimodal"),
    doc="Typed-metadata + payload stats over binary media columns — "
    "struct projection and JVM byte ops, zero decode.",
)
def q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_metadata(_media(spark, sf_dir))


_FRAMES_ORACLE = """
SELECT doc_id AS asset_id,
       CAST(unnest(range(0, CAST(ceil((1000 + (doc_id * 37) % 59000) / 5000.0) AS BIGINT))) AS INT) AS frame_idx
FROM documents
WHERE CAST(doc_id % 3 AS INT) = 2
"""


@register(
    "media_frame_sample",
    oracle=_FRAMES_ORACLE,
    tags=("llm", "multimodal"),
    doc="Video frame sampling (1→N mapInPandas expansion): row "
    "multiplicity ceil(duration/5s) per video asset is the verified "
    "contract; frame payload bytes are stub-decoded.",
)
def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_frames(_media(spark, sf_dir), every_ms=5000).select(
        "asset_id", "frame_idx"
    )


@register(
    "media_features",
    oracle=None,  # decode stub is Python-side; determinism gated in tests
    tags=("llm", "multimodal"),
    doc="Arrow-batched feature extraction over decoded media "
    "(mapInPandas, fixed-dim float vectors). Registered projection is "
    "canonicalizer-safe scalars (the raw array<float> output of "
    "extract_features is the pipeline API; the driver harness sorts "
    "all columns and cannot sort lists).",
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = extract_features(_media(spark, sf_dir), dim=16)
    # scalar fingerprint of the vector: stable across runs because the
    # decode stub is md5-seeded; rounded via format_number so the
    # float->string rendering is fixed-width deterministic
    return feats.selectExpr(
        "asset_id",
        "size(features) AS n_dims",
        "CAST(aggregate(features, CAST(0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE)) AS DOUBLE) AS feat_sum",
        "md5(concat_ws(',', transform(features, v -> format_number(CAST(v AS DOUBLE), 4)))) AS feat_md5",
    )
