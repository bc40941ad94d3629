"""Sample tenant plug-ins (reference: etl/tenants/project_01/__init__.py:
13-38 — custom extract columns, custom transfer registration)."""

from __future__ import annotations

from dagster_etl_spark.orchestration.config import LoadConfig
from dagster_etl_spark.orchestration.plugins import (
    TenantPlugins,
    register_tenant_plugins,
)
from dagster_etl_spark.orchestration.transfers import priority_wip_transfer

register_tenant_plugins(
    "project_01",
    TenantPlugins(
        transfer_functions={"priority_wip": priority_wip_transfer},  # U1
        extract_queries={  # U2 — SQL override with its own WHERE clause:
            # the runner composes the partition predicate with .filter,
            # so this works where the reference's string-append breaks
            "orders_dim": (
                "SELECT o_orderkey, o_orderpriority, o_orderdate "
                "FROM orders WHERE o_orderpriority IS NOT NULL"
            ),
        },
        load_configs={  # U3
            "lot_history": LoadConfig(
                table="aps_input_wip",
                key_columns=["project_id", "snapshot_date", "l_linestatus", "l_suppkey"],
                mode="upsert",
            ),
        },
    ),
)
