"""Stream-static enrichment: join a live stream against a batch
dimension table.

The static side is planned once and broadcast into every micro-batch
(a stateless join — no streaming state at all, unlike stream-stream
joins), which is exactly how a 100 TB/day event feed picks up its
dimension attributes: the dimension is small and slowly changing, the
stream never waits for it. The reference's analog is the tenant-config
driven extract+transfer join (SURVEY J1) run per daily partition; here
the same enrichment happens continuously.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dagster_etl_spark.functions import scaled_long

from dagster_etl_spark.sources.fixtures import load_table
from dagster_etl_spark.streaming.windowed import (
    read_events_stream,
    run_stream_to_batch,
)


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    on: tuple[str, str],
    how: str = "inner",
) -> DataFrame:
    """Join ``stream`` to the static ``dim`` on ``stream_col == dim_col``.
    The dimension is broadcast — per-batch hash join, no shuffle of the
    stream side, no state store."""
    s_col, d_col = on
    return stream.join(F.broadcast(dim), stream[s_col] == dim[d_col], how)


def streaming_segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query: events stream enriched with the customer
    dimension, aggregated per market segment (complete mode so every
    group is emitted at end-of-stream, matching the batch oracle)."""
    stream = read_events_stream(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    enriched = enrich_stream(stream, cust, on=("user_id", "c_custkey"))
    agg = enriched.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(scaled_long("value", 6)).cast("double") / 1e6).alias("sum_value"),
    )
    return run_stream_to_batch(agg, mode="complete")
