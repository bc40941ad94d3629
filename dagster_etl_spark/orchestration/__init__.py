"""Orchestration shell (SURVEY §3): tenant config tree, plug-in
registries, and the staged extract→transfer→load pipeline runner.

Structure mirrors the reference's Dagster factories; the Dagster
dependency itself is optional — the runner here is plain Python so the
data plane is testable anywhere, and a Dagster asset wrapper is a thin
layer over ``PipelineRunner`` methods when dagster is installed."""

from dagster_etl_spark.orchestration.config import (
    ConfigLoader,
    LoadConfig,
    PipelineConfig,
    TenantConfig,
)
from dagster_etl_spark.orchestration.pipeline import PipelineRunner
from dagster_etl_spark.orchestration.plugins import (
    TenantPlugins,
    register_common_transfer,
    register_tenant_plugins,
    resolve_extract_query,
    resolve_load_config,
    resolve_transfer,
)

__all__ = [
    "ConfigLoader",
    "LoadConfig",
    "PipelineConfig",
    "PipelineRunner",
    "TenantConfig",
    "TenantPlugins",
    "register_common_transfer",
    "register_tenant_plugins",
    "resolve_extract_query",
    "resolve_load_config",
    "resolve_transfer",
]
