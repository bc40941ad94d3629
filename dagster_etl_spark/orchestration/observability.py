"""Run observability (SURVEY §2 S13 + A9): step records → DataFrame →
Parquet export, plus the rollup aggregations the reference runs over
its Trino observability tables.

Reference: etl/sensors/run_log_sensor.py:83-127 (event-log export),
etl/utils/observability.py:113-159 (step-duration DataFrames),
docs/trino_observability_ddl.sql:45-65 (example rollups)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from dagster_etl_spark.orchestration.pipeline import RunContext

RUN_EVENT_SCHEMA = StructType(
    [
        StructField("tenant", StringType()),
        StructField("pipeline", StringType()),
        StructField("stage", StringType()),
        StructField("status", StringType()),
        StructField("rows", LongType()),
        StructField("elapsed_sec", DoubleType()),
        StructField("ts", DoubleType()),
        StructField("error", StringType()),
    ]
)


def run_events_df(spark: SparkSession, ctx: RunContext) -> DataFrame:
    """Step records as a typed DataFrame (schema stable even when a
    field never occurred, e.g. no failures)."""
    rows = [
        tuple(r.get(f.name) for f in RUN_EVENT_SCHEMA.fields) for r in ctx.records
    ]
    return spark.createDataFrame(rows, RUN_EVENT_SCHEMA)


def export_run_events(
    spark: SparkSession, ctx: RunContext, base: str, run_id: str, date: str
) -> str:
    """S13: export one run's events under
    ``{base}/logs/run_events/date={date}/{run_id}/``."""
    path = f"{base.rstrip('/')}/logs/run_events/date={date.replace('-', '')}/{run_id}"
    run_events_df(spark, ctx).write.mode("overwrite").parquet(path)
    return path


def step_duration_rollup(events: DataFrame) -> DataFrame:
    """A9: per-(pipeline, stage) duration/row rollup — the engine-side
    twin of the reference's example Trino queries."""
    return (
        events.filter(F.col("status") == "success")
        .groupBy("tenant", "pipeline", "stage")
        .agg(
            F.count(F.lit(1)).alias("n_runs"),
            F.avg("elapsed_sec").alias("avg_sec"),
            F.max("elapsed_sec").alias("max_sec"),
            F.sum("rows").alias("total_rows"),
        )
    )


def failure_rollup(events: DataFrame) -> DataFrame:
    return (
        events.filter(F.col("status") == "failure")
        .groupBy("tenant", "pipeline", "stage")
        .agg(F.count(F.lit(1)).alias("n_failures"), F.max("ts").alias("last_failure_ts"))
    )
