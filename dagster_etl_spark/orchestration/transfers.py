"""Common transfer functions (U1 registry entries) — the reference's
shared transform suite bound to the fixture schema mapping
(FIXTURES.md: lineitem ≈ lot_history, events ≈ equipment_event).

Signature contract (reference: etl/factories/asset_factory.py:209):
``fn(input_dfs: dict[str, DataFrame], partition_date, tenant_id) ->
DataFrame``. Tenants override by name via TenantPlugins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dagster_etl_spark.operators.wip import priority_wip_aggregate, wip_aggregate
from dagster_etl_spark.functions import scaled_long
from dagster_etl_spark.orchestration.plugins import register_common_transfer


@register_common_transfer("wip")
def wip_transfer(
    inputs: dict[str, DataFrame], partition_date: str, tenant_id: str
) -> DataFrame:
    """A1/A2 WIP aggregation + snapshot_date stamp (reference:
    etl/common/assets/transfer.py:14-65)."""
    (df,) = inputs.values()
    return wip_aggregate(
        df,
        group_cols=("l_linestatus", "l_suppkey"),
        qty_col="l_quantity",
        lot_col="l_orderkey",
        status_col="l_returnflag",
        active_statuses=("N", "A"),
        snapshot_date=partition_date,
    )


@register_common_transfer("events_daily")
def events_daily_transfer(
    inputs: dict[str, DataFrame], partition_date: str, tenant_id: str
) -> DataFrame:
    """A4-analog duration rollup per (user, event_type) over the events
    table (reference: etl/common/assets/transfer.py:129-174)."""
    (df,) = inputs.values()
    return (
        df.filter(F.col("user_id").isNotNull())
        .groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(scaled_long("value", 6)).cast("double") / 1e6).alias("total_value"),
        )
        .withColumn("snapshot_date", F.lit(partition_date))
    )


def priority_wip_transfer(
    inputs: dict[str, DataFrame], partition_date: str, tenant_id: str
) -> DataFrame:
    """Tenant-custom variant (multi-input join, schema-flex priority) —
    registered by the sample tenant, not commonly (reference:
    etl/tenants/project_01/assets/transfer.py:14-91)."""
    li, orders = inputs["lot_history"], inputs["orders_dim"]
    joined = li.join(
        orders.select(
            F.col("o_orderkey").alias("l_orderkey"),
            F.col("o_orderpriority").alias("priority"),
        ),
        on="l_orderkey",
    )
    return priority_wip_aggregate(
        joined,
        priority_col="priority",
        high_value="1-URGENT",
        group_cols=("l_linestatus", "l_suppkey"),
        qty_col="l_quantity",
        lot_col="l_orderkey",
        status_col="l_returnflag",
        active_statuses=("N", "A"),
        snapshot_date=partition_date,
    )
