"""Stream-stream joins with event-time bounds.

The hardest streaming primitive Spark offers: both sides are unbounded,
so the join buffers each side in state and the event-time range
condition + watermarks bound how long a row can wait for a match —
state is O(rows within the attribution window), not O(stream). The
batch analog is a range join (operators/temporal.py); this is the
continuous version of the same semantics, e.g. view -> purchase
attribution over a click feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dagster_etl_spark.streaming.windowed import (
    read_events_stream,
    run_stream_to_batch,
)


def attribution_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "view_ts",
    right_ts: str = "purchase_ts",
    horizon: str = "30 minutes",
) -> DataFrame:
    """Inner stream-stream join: right events within ``horizon`` AFTER
    the left event, per key. Both sides must carry watermarks; matches
    emit as soon as both rows have arrived (inner joins never wait for
    the watermark — it only evicts state)."""
    r_key = f"__r_{key}"
    right = right.withColumnRenamed(key, r_key)
    cond = F.expr(
        f"{r_key} = {key} AND {right_ts} >= {left_ts} "
        f"AND {right_ts} <= {left_ts} + interval {horizon}"
    )
    return left.join(right, cond).drop(r_key)


def streaming_view_purchase_attribution(
    spark: SparkSession, sf_dir: str, horizon: str = "30 minutes"
) -> DataFrame:
    """Registered query: purchases attributed to the views they
    followed within ``horizon``, per user, as a real stream-stream
    join (two file-source streams, watermarks on both sides)."""
    views = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "view")
        .select("user_id", F.col("ts").alias("view_ts"))
        .withWatermark("view_ts", "1 hour")
    )
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(F.col("user_id"), F.col("ts").alias("purchase_ts"))
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = attribution_join(views, purchases, horizon=horizon)
    out = joined.select(
        "user_id",
        F.unix_timestamp("view_ts").alias("view_sec"),
        F.unix_timestamp("purchase_ts").alias("purchase_sec"),
    )
    return run_stream_to_batch(out, mode="append")
