"""Structured Streaming over the ``events`` table: file-source streams,
tumbling-window aggregation with watermark, and a batch-equivalent
runner (trigger availableNow -> memory sink) so streaming plans can be
verified against the same DuckDB oracles as batch queries.

The reference is strictly batch (SURVEY §2.7): its "late data" story is
re-running a daily partition. Here late data is first-class — the
watermark bounds state exactly like the reference's reprocessing window
bounds backfills. At scale the same plan runs against Kafka/file drops
with a real trigger; only the source/sink bindings change.
"""

from __future__ import annotations

import itertools
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dagster_etl_spark.functions import scaled_long

_MEMQ = itertools.count()


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over the events fixture. Schema comes from a
    batch read (streaming sources need it declared up front); ns-long
    timestamps are restored exactly like sources/fixtures.load_table."""
    path = os.path.join(sf_dir, "events.parquet")
    batch_schema = spark.read.parquet(path).schema
    # the file stream source requires a directory: stream the sf dir with
    # a glob filter selecting just the events table
    reader = spark.readStream.schema(batch_schema).option(
        "pathGlobFilter", "events.parquet"
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(sf_dir)
    if dict(stream.dtypes).get("ts") == "bigint":  # nanosAsLong fixture read
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream


def windowed_event_stats(
    events: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling-window per-event-type stats with a watermark bounding
    state. Sum goes through DECIMAL so results are order-independent —
    mandatory under streaming where partial-aggregation order varies
    run to run."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(scaled_long("value", 6)).cast("double") / 1e6).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_stream_to_batch(result: DataFrame, mode: str = "complete") -> DataFrame:
    """Execute a streaming DataFrame to completion (availableNow) into a
    memory sink and return the materialized result as a batch DataFrame."""
    name = f"stream_result_{next(_MEMQ)}"
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = result.sparkSession
    return spark.table(name)


def streaming_windowed_counts(
    spark: SparkSession, sf_dir: str, window: str = "5 minutes"
) -> DataFrame:
    """The registered query: stream the events fixture through the
    windowed aggregation and return the complete result set.

    Complete mode (not append) so every window is emitted regardless of
    where the watermark lands at end-of-stream — matching the batch
    oracle exactly; append-mode emission timing is covered in tests.
    """
    stream = read_events_stream(spark, sf_dir)
    return run_stream_to_batch(windowed_event_stats(stream, window=window))


def error_burst_alerts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    min_errors: int = 2,
) -> DataFrame:
    """Threshold alerting over windowed state: per-user hourly error
    counts, emitting only windows at/over the burst floor — the
    monitoring primitive (alert when a client/device starts failing).
    The filter sits ON the aggregate, so state is the windowed count
    (bounded by the watermark) and the alert stream is the drift, not
    the traffic."""
    return (
        events.filter(F.col("event_type") == "error")
        .filter(F.col("user_id").isNotNull())
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_errors"))
        .filter(F.col("n_errors") >= min_errors)
        .select(
            F.unix_timestamp(F.col("window.start")).alias("window_start"),
            "user_id",
            "n_errors",
        )
    )


def streaming_error_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_stream_to_batch(
        error_burst_alerts(read_events_stream(spark, sf_dir)), mode="complete"
    )
