"""Streaming deduplication: exactly-once semantics on top of an
at-least-once delivery stream.

Real ingest feeds (Kafka with producer retries, file drops re-uploaded
by a flaky uploader) deliver records more than once. The engine's
answer is ``dropDuplicatesWithinWatermark`` keyed on the delivery id:
first-seen rows are emitted *immediately* (so append mode emits the
full stream — no waiting for windows to close); the event-time
watermark only bounds how long a key is remembered, which is what makes
the state size O(events within the watermark horizon) instead of
O(all events ever) — the property that matters at 100 TB/day.

The reference has no streaming at all (SURVEY §2.7); its dedup story is
idempotent daily reprocessing. This operator is the streaming
equivalent: the watermark horizon plays the role of the backfill
window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from dagster_etl_spark.streaming.windowed import (
    read_events_stream,
    run_stream_to_batch,
)


def dedup_stream(
    events: DataFrame,
    key_cols: Sequence[str] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Drop re-delivered records by delivery key, remembering keys for
    one watermark horizon. Emits each first arrival unchanged."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def streaming_dedup_counts(
    spark: SparkSession, sf_dir: str, watermark: str = "30 minutes"
) -> DataFrame:
    """Registered query: simulate at-least-once delivery by unioning the
    events stream with itself (every record arrives twice), dedup on
    ``event_id``, materialize (append mode — dedup emits immediately),
    then aggregate per event type. A correct dedup makes the doubled
    stream bit-identical to the plain batch table, which is exactly what
    the DuckDB oracle computes.
    """
    from pyspark.sql import functions as F

    from dagster_etl_spark.functions import scaled_long

    once = read_events_stream(spark, sf_dir)
    twice = once.unionByName(read_events_stream(spark, sf_dir))
    deduped = run_stream_to_batch(
        dedup_stream(twice, watermark=watermark), mode="append"
    )
    return deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(scaled_long("value", 6)).cast("double") / 1e6).alias("sum_value"),
    )
