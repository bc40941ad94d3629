"""Window-function operators — SURVEY.md §2.6.

The reference has no window functions; these are engine capabilities
the reference's users get for free on Spark (per-lot step sequencing,
top-k, sessionization). All orderings carry a unique tiebreaker column
so results are deterministic under any partitioning.

Scale notes: every operator here is a single shuffle on its partition
key; sessionization is the batch twin of the streaming session window
(see dagster_etl_spark.streaming). Skewed partition keys (one user with
millions of events) are the main risk at 100 TB — AQE skew handling
applies, and rank_topk pushes the limit into the window (no global sort).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rank_topk(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence,
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via row_number (deterministic: pass explicit
    tiebreakers in order_cols). Catalyst rewrites the filter into a
    rank-limit per partition — no global sort, no full materialization."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def with_lag_gap(
    df: DataFrame,
    partition_col: str,
    ts_col: str,
    tiebreak_col: str,
    lag_cols: Sequence[str] = (),
    gap_col: str = "gap_seconds",
) -> DataFrame:
    """lead/lag: previous-row attributes + integer-second gap to the
    previous event within a partition."""
    w = Window.partitionBy(partition_col).orderBy(ts_col, tiebreak_col)
    out = df
    for c in lag_cols:
        out = out.withColumn(f"prev_{c}", F.lag(c).over(w))
    return out.withColumn(
        gap_col, F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(F.lag(ts_col).over(w))
    )


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    tiebreak_col: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Batch sessionization: a new session starts when the gap to the
    previous event exceeds ``gap_seconds``. Returns one row per session
    with bounds and event count. Twin of the streaming session window
    (F.session_window) for reprocessing/backfill."""
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    gap = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(F.lag(ts_col).over(w))
    new_session = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    with_ids = df.withColumn(
        "session_seq",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return with_ids.groupBy(user_col, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )
