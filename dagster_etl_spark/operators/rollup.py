"""Incremental aggregate maintenance (continuous-aggregate /
hypertable-rollup shape): keep a MERGEABLE state table, fold new
partitions in without recomputing history, present finished values as
a view.

The trick that makes increments exact: state stores fixed-point
BIGINT sums (functions.scaled_long), never doubles — integer addition
is associative, so ``merge(state(A), state(B)) == state(A ∪ B)``
bit-for-bit (equivalence-tested), which double-typed sums cannot
promise. At 100 TB this turns a daily full-table rollup into
agg(new partition) + groupBy over yesterday's (small) state.

Reference analog: the daily snapshot_date aggregates the WIP pipeline
lands (etl/common/assets/transfer.py:14-65) recomputed per partition;
this is the engine's path to maintaining the all-time rollup too.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dagster_etl_spark.functions import scaled_long

STATE_COLS = ("sum_scaled", "n_rows")


def rollup_state(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    scale: int = 6,
) -> DataFrame:
    """Aggregate raw rows into mergeable state: exact scaled-int sum +
    row count per key."""
    return df.groupBy(*keys).agg(
        F.sum(scaled_long(value_col, scale)).alias("sum_scaled"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def merge_rollup_state(a: DataFrame, b: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Fold two state tables (e.g. all-time state + today's delta):
    union + re-sum. Spark's partial aggregation makes this one small
    shuffle over the combined state, not the raw data."""
    return (
        a.unionByName(b)
        .groupBy(*keys)
        .agg(
            F.sum("sum_scaled").alias("sum_scaled"),
            F.sum("n_rows").alias("n_rows"),
        )
    )


def rollup_view(state: DataFrame, keys: Sequence[str], scale: int = 6) -> DataFrame:
    """Finished values from state: double sum and exact mean — the
    presentation layer; state stays integral."""
    return state.select(
        *keys,
        (F.col("sum_scaled").cast("double") / float(10 ** scale)).alias("sum_value"),
        F.col("n_rows"),
        (
            (F.col("sum_scaled").cast("double") / float(10 ** scale))
            / F.col("n_rows")
        ).alias("avg_value"),
    )
