"""Cycle-time statistics — SURVEY.md §2 A3 + F1/F2.

Reference (reference: etl/common/assets/transfer.py:68-126): parse
start/end timestamps of COMPLETED lots, derive cycle minutes, then
groupwise avg/min/max/count.

Determinism note: the reference averages float minutes; float sums are
order-dependent, which breaks reproducibility under distributed partial
aggregation. We aggregate *integer seconds* (exact, associative) and
convert to minutes after the aggregate — same values, any cluster size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_cycle_seconds(
    df: DataFrame,
    start_col: str,
    end_col: str,
    out_col: str = "cycle_seconds",
) -> DataFrame:
    """F1/F2: timestamp difference as exact integer seconds."""
    return df.withColumn(
        out_col, F.unix_timestamp(F.col(end_col)) - F.unix_timestamp(F.col(start_col))
    )


def cycle_time_stats(
    df: DataFrame,
    group_cols: Sequence[str] = ("process_step", "product_code"),
    start_col: str = "start_time",
    end_col: str = "end_time",
    lot_col: str = "lot_id",
    status_col: str | None = "status",
    completed_value: str = "COMPLETED",
    snapshot_date: str | None = None,
) -> DataFrame:
    """A3: per-group avg/min/max cycle time (minutes) + lot count."""
    if status_col is not None:
        df = df.filter(F.col(status_col) == completed_value)
    df = df.filter(F.col(start_col).isNotNull() & F.col(end_col).isNotNull())
    for k in group_cols:
        df = df.filter(F.col(k).isNotNull())
    df = with_cycle_seconds(df, start_col, end_col)

    out = df.groupBy(*group_cols).agg(
        (F.sum("cycle_seconds").cast("double") / F.count("cycle_seconds") / F.lit(60.0)).alias(
            "avg_cycle_time"
        ),
        (F.min("cycle_seconds") / F.lit(60.0)).alias("min_cycle_time"),
        (F.max("cycle_seconds") / F.lit(60.0)).alias("max_cycle_time"),
        F.count(F.lit(1)).alias("lot_count"),
    )
    if snapshot_date is not None:
        out = out.withColumn("snapshot_date", F.lit(snapshot_date))
    return out
