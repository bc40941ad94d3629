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

from dagster_etl_spark.functions import scaled_long_sql, sql_str_literal


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
    """A4+A5+A6: duration sums pivoted wide + derived utilization rate.

    The pivot is FUSED into one grouped aggregate of per-type
    conditional sums (r18): ``.pivot(col, values)`` plans a second
    aggregate over the first's output — two Exchanges for a
    fixed-value-list pivot whose cells ``SUM(CASE WHEN type = v ...)``
    computes in the single group-key shuffle (guide §2.4: operations
    keyed the same way share one exchange; plan: 2 Exchange -> 1,
    values bit-identical — integer cell sums are order-independent and
    an empty cell is NULL in both shapes before the 0-fill).
    """
    df = df.filter(f"`{equipment_col}` IS NOT NULL")
    scaled = scaled_long_sql(f"`{duration_col}`", 6)
    cells = [
        f"SUM(CASE WHEN `{type_col}` = {sql_str_literal(t)}"
        f" THEN {scaled} END)"
        for t in event_types
    ]
    # exact fixed-point cells -> double, 0-filled (pandas pivot fillna(0))
    wide = df.groupBy(equipment_col).agg(
        *[
            F.expr(
                f"coalesce(CAST({cell} AS DOUBLE) / 1000000.0D, 0.0D)"
            ).alias(t)
            for cell, t in zip(cells, event_types)
        ]
    )
    if rate_numerator in wide.columns:
        rate_sql = (
            f"`{rate_numerator}` / {float(rate_denominator_minutes)!r}D * 100.0D"
        )
        if rate_round is not None:
            rate_sql = f"round({rate_sql}, {int(rate_round)})"
        rate = F.expr(rate_sql)
    else:  # RUN-absent guard (reference: transfer.py:164-169)
        rate = F.lit(0.0)
    wide = wide.withColumn(rate_col, rate)
    if snapshot_date is not None:
        wide = wide.withColumn("snapshot_date", F.lit(snapshot_date))
    return wide
