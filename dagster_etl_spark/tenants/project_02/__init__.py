"""Second sample tenant: proves multi-tenant resolution under name
collision (reference: etl/tenants/project_02 tree; resolution order
tenant-custom > common at etl/config/tenant_loader.py:117-150).

Unlike project_01 (which registers a custom function under a
tenant-only name), this tenant overrides ``events_daily`` — a name
that ALSO exists in the common registry — so resolving it for
project_02 must return this version while project_01 keeps the common
one. The tenant's dbt-analog models (reference:
etl/tenants/project_02/dbt/models/) live in :func:`sql_models`, with
the declared schema tests from _transform__schema.yml as hard gates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dagster_etl_spark.orchestration.plugins import (
    TenantPlugins,
    register_tenant_plugins,
)
from dagster_etl_spark.functions import scaled_long
from dagster_etl_spark.plans.sql_models import ColumnTest, SqlModelProject


def events_daily_transfer_p02(
    inputs: dict[str, DataFrame], partition_date: str, tenant_id: str
) -> DataFrame:
    """Tenant-custom events rollup: same grouping as the common
    ``events_daily`` but adds a mean-value column and keeps NULL users
    under a sentinel bucket instead of dropping them — a deliberate,
    observable behavior difference for the collision test."""
    (df,) = inputs.values()
    return (
        df.withColumn("user_id", F.coalesce(F.col("user_id"), F.lit(-1)))
        .groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(scaled_long("value", 6)).cast("double") / 1e6).alias("total_value"),
            (
                (F.sum(scaled_long("value", 6)).cast("double") / 1e6) / F.count(F.lit(1))
            ).alias("avg_value"),
        )
        .withColumn("snapshot_date", F.lit(partition_date))
    )


register_tenant_plugins(
    "project_02",
    TenantPlugins(
        transfer_functions={"events_daily": events_daily_transfer_p02},
    ),
)


def sql_models() -> SqlModelProject:
    """dbt-analog model set over the staged item master (reference:
    stg_cfg_item_master.sql + tfm_item_master_enriched.sql +
    _transform__schema.yml tests: not_null item_id, accepted_values
    priority_category in HIGH/MEDIUM/LOW)."""
    return (
        SqlModelProject()
        .add(
            "stg_cfg_item_master",
            """SELECT CAST(p_partkey AS STRING) AS item_id,
                      coalesce(p_type, 'UNKNOWN') AS item_type,
                      coalesce(p_name, '') AS item_name,
                      coalesce(p_size, 0) AS item_priority,
                      p_retailprice
               FROM part""",
        )
        .add(
            "tfm_item_master_enriched",
            """SELECT *,
                      CASE WHEN item_priority >= 40 THEN 'HIGH'
                           WHEN item_priority >= 20 THEN 'MEDIUM'
                           ELSE 'LOW' END AS priority_category,
                      item_type IS NOT NULL AND item_type != '' AS is_manufactured
               FROM stg_cfg_item_master""",
            depends_on=("stg_cfg_item_master",),
            materialize="table",
            tests=(
                ColumnTest("item_id", "not_null"),
                ColumnTest("item_id", "unique"),
                ColumnTest(
                    "priority_category",
                    "accepted_values",
                    values=("HIGH", "MEDIUM", "LOW"),
                ),
            ),
        )
    )
