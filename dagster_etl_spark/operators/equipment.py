"""Equipment-utilization pivot — SURVEY.md §2 A4/A5/A6.

Reference (reference: etl/common/assets/transfer.py:129-174): sum
duration per (equipment, event_type), pivot event types to columns,
0-fill, derive a utilization rate from the RUN column (guarded when the
RUN column is absent).

Spark-first notes
-----------------
* ``pivot`` is given an explicit value list: (a) avoids an extra
  distinct-collection job, (b) pins column order (pandas preserves
  encounter order, Spark sorts — SURVEY §7.2), (c) makes the plan
  static so it survives empty partitions at scale.
* Duration sums go through fixed-point BIGINT so the pivot cells are
  exact and order-independent while staying on the long-backed codegen
  fast path (see functions.money_sum rationale).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dagster_etl_spark.functions import scaled_long


def equipment_utilization(
    df: DataFrame,
    equipment_col: str = "equipment_id",
    type_col: str = "event_type",
    duration_col: str = "duration_minutes",
    event_types: Sequence[str] = ("RUN", "IDLE", "DOWN"),
    rate_numerator: str = "RUN",
    rate_denominator_minutes: float = 24 * 60,
    rate_col: str = "utilization_rate",
    rate_round: int | None = 2,
    snapshot_date: str | None = None,
) -> DataFrame:
    """A4+A5+A6: duration sums pivoted wide + derived utilization rate."""
    df = df.filter(F.col(equipment_col).isNotNull())
    wide = (
        df.groupBy(equipment_col)
        .pivot(type_col, list(event_types))
        .agg(F.sum(scaled_long(duration_col, 6)))
    )
    # exact fixed-point cells -> double, 0-filled (pandas pivot fillna(0))
    wide = wide.select(
        equipment_col,
        *[
            F.coalesce(F.col(t).cast("double") / F.lit(1000000.0), F.lit(0.0)).alias(t)
            for t in event_types
        ],
    )
    if rate_numerator in wide.columns:
        rate = F.col(rate_numerator) / F.lit(rate_denominator_minutes) * F.lit(100.0)
        if rate_round is not None:
            rate = F.round(rate, rate_round)
    else:  # RUN-absent guard (reference: transfer.py:164-169)
        rate = F.lit(0.0)
    wide = wide.withColumn(rate_col, rate)
    if snapshot_date is not None:
        wide = wide.withColumn("snapshot_date", F.lit(snapshot_date))
    return wide
