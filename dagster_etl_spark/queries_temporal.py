"""Temporal queries: as-of join (vs DuckDB's native ASOF JOIN),
bucketed range join, and multi-grain rollup — engine extensions beyond
the reference (SURVEY §2.3 lists temporal joins as absent)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dagster_etl_spark.functions import scaled_long

from dagster_etl_spark.operators.temporal import (
    asof_join,
    multigrain_rollup,
    range_join_bands,
)
from dagster_etl_spark.registry import register
from dagster_etl_spark.sources.fixtures import load_table

_ASOF_ORACLE = """
SELECT p.event_id,
       p.user_id,
       v.event_id AS view_event_id,
       v.value AS view_value,
       CAST(floor(epoch(v.ts)) AS BIGINT) AS view_ts_sec
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND v.ts <= p.ts
"""


@register(
    "asof_purchase_prior_view",
    oracle=_ASOF_ORACLE,
    tags=("temporal", "join", "bench"),
    doc="As-of join: each purchase matched to the user's latest view at "
    "or before it — union + ordered-window carry-forward (one shuffle), "
    "verified against DuckDB's native ASOF LEFT JOIN.",
)
def q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter("event_type = 'purchase'").select("event_id", "user_id", "ts")
    views = ev.filter("event_type = 'view'").selectExpr(
        "event_id AS view_event_id",
        "user_id",
        "value AS view_value",
        "ts",
    )
    out = asof_join(
        purchases, views, keys=["user_id"],
        right_vals=["view_event_id", "view_value"],
    )
    return out.selectExpr(
        "event_id",
        "user_id",
        "view_event_id_asof AS view_event_id",
        "view_value_asof AS view_value",
        "CAST(unix_timestamp(ts_asof) AS BIGINT) AS view_ts_sec",
    )


_BANDS_ORACLE = """
SELECT b.band_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(round((e.value) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_value
FROM events e
JOIN (SELECT i AS band_id, i * 50.0 AS lo, (i + 1) * 50.0 AS hi
      FROM range(10) t(i)) b
  ON e.value >= b.lo AND e.value < b.hi
GROUP BY b.band_id
"""


@register(
    "value_band_range_join",
    oracle=_BANDS_ORACLE,
    tags=("temporal", "join"),
    doc="Range (interval) join via uniform bucketing: equi-join on "
    "bucket id + residual predicate instead of a theta join.",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bands = spark.range(10).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 50.0).alias("lo"),
        ((F.col("id") + 1) * 50.0).alias("hi"),
    )
    joined = range_join_bands(ev, bands, value_col="value", bucket_width=50.0)
    return joined.groupBy("band_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(scaled_long("value", 6)).cast("double") / 1e6).alias("sum_value"),
    )


_ROLLUP_ORACLE = """
SELECT grain, bucket_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(round((value) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_value
FROM (
  SELECT '1h' AS grain,
         CAST(floor(floor(epoch(ts)) / 3600) * 3600 AS BIGINT) AS bucket_start,
         event_type, value
  FROM events
  UNION ALL
  SELECT '1d' AS grain,
         CAST(floor(floor(epoch(ts)) / 86400) * 86400 AS BIGINT) AS bucket_start,
         event_type, value
  FROM events
)
GROUP BY grain, bucket_start, event_type
"""


@register(
    "event_rollup_multigrain",
    oracle=_ROLLUP_ORACLE,
    tags=("temporal", "agg", "bench"),
    doc="Hypertable-style continuous aggregate: hourly + daily rollups "
    "in one shuffle (union of grain-bucketed frames into one agg).",
)
def q_multigrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multigrain_rollup(load_table(spark, sf_dir, "events"))


_INCR_ROLLUP_ORACLE = """
SELECT event_type,
       CAST(SUM(CAST(round((value) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_value,
       COUNT(*) AS n_rows,
       (CAST(SUM(CAST(round((value) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0) / COUNT(*) AS avg_value
FROM events
"""


@register(
    "incremental_event_rollup",
    oracle=_INCR_ROLLUP_ORACLE.replace("FROM events", "FROM events GROUP BY event_type"),
    tags=("temporal", "rollup"),
    doc="Continuous-aggregate maintenance: the events table split at a "
    "date boundary, each half aggregated to mergeable fixed-point "
    "state, states merged, finished view emitted. The oracle is the "
    "FULL recompute — hash equality proves merge(state(A), state(B)) "
    "== state(A ∪ B) exactly, the property doubles cannot give.",
)
def q_incremental_event_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dagster_etl_spark.operators.rollup import (
        merge_rollup_state,
        rollup_state,
        rollup_view,
    )

    ev = load_table(spark, sf_dir, "events")
    history = ev.filter(F.to_date("ts") < "2024-01-20")
    delta = ev.filter(F.to_date("ts") >= "2024-01-20")
    keys = ["event_type"]
    merged = merge_rollup_state(
        rollup_state(history, keys, "value"),
        rollup_state(delta, keys, "value"),
        keys,
    )
    return rollup_view(merged, keys)


_GAPFILL_ORACLE = """
WITH b AS (
  SELECT user_id,
         CAST(floor(floor(epoch(ts)) / 900) * 900 AS BIGINT) AS bucket,
         MAX({'ts': ts, 'tb': event_id, 'v': value}) AS m
  FROM events
  WHERE user_id IS NOT NULL
  GROUP BY 1, 2
), grid AS (
  SELECT user_id, unnest(range(MIN(bucket), MAX(bucket) + 1, 900)) AS bucket
  FROM b GROUP BY user_id
), j AS (
  SELECT g.user_id, g.bucket, b.m.v AS v
  FROM grid g LEFT JOIN b ON b.user_id = g.user_id AND b.bucket = g.bucket
)
SELECT user_id, bucket AS bucket_start,
       last_value(v IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY bucket
         ROWS UNBOUNDED PRECEDING) AS value_filled,
       v IS NULL AS is_gap
FROM j
"""


@register(
    "gap_filled_user_timeline",
    oracle=_GAPFILL_ORACLE,
    tags=("temporal", "window"),
    doc="Time-series gap filling at 15-min grain: dense per-user bucket "
    "grid via sequence explode, forward-filled gauge values with a "
    "total-order (ts, tiebreak) representative per bucket — the "
    "continuous-timeline primitive under equipment dashboards.",
)
def q_gap_filled_user_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dagster_etl_spark.operators.temporal import fill_time_gaps

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    return fill_time_gaps(
        ev, keys=["user_id"], ts_col="ts", value_col="value",
        tiebreak_col="event_id", grain_sec=900,
    )
