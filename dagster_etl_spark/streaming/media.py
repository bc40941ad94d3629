"""Streaming media ingest: binary payloads decoded inside a Structured
Streaming pipeline — the shape of a production media-corpus intake
(files/Kafka drop in, decode + feature-extract per micro-batch, typed
rows out).

Composition proven here: Arrow-batched ``mapInPandas`` operators
(multimodal.synth_real_media_table / decode_stats) run unchanged on a
streaming DataFrame — stateless per-row transforms need no watermark
and keep their batch semantics, so the SAME closed-form DuckDB oracle
that verifies the batch decode verifies the streaming run. At scale
only the source binding changes (file drop -> Kafka/autoloader);
decode cost rides the micro-batch executor parallelism.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from dagster_etl_spark.streaming.windowed import run_stream_to_batch


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents fixture (schema declared
    from a batch read, as streaming sources require)."""
    path = os.path.join(sf_dir, "documents.parquet")
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def streaming_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream documents -> synthesize real container bytes -> REAL
    decode -> integer content stats, executed to completion
    (availableNow, append sink: stateless rows emit per micro-batch)."""
    from dagster_etl_spark.operators.multimodal import (
        decode_stats,
        synth_real_media_table,
    )

    stream = read_documents_stream(spark, sf_dir)
    stats = decode_stats(synth_real_media_table(stream))
    return run_stream_to_batch(stats, mode="append")
