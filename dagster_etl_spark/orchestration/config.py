"""Tenant configuration tree (SURVEY §1.1 config model, §3 lifecycle
step 2): pydantic models loaded from per-tenant YAML with
``${VAR:default}`` environment interpolation and per-env enablement.

Reference shape: etl/config/tenant_config.py:178-212 (pydantic tree),
etl/config/config_loader.py:34-157 (env interpolation + tenant scan).
The models keep the reference's vocabulary (pipelines with extract /
transfer / load stages, daily date partitions, key-column upserts) so a
reference config ports by renaming keys only.
"""

from __future__ import annotations

import os
import re
from pathlib import Path

import yaml
from pydantic import BaseModel, Field

_ENV_PATTERN = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)(?::([^}]*))?\}")


def interpolate_env(text: str, env: dict[str, str] | None = None) -> str:
    """Replace ``${VAR}`` / ``${VAR:default}`` with environment values
    (reference: config_loader.py:34-58)."""
    src = os.environ if env is None else env

    def sub(m: re.Match) -> str:
        var, default = m.group(1), m.group(2)
        val = src.get(var)
        if val is None:
            if default is None:
                raise KeyError(f"environment variable {var} not set and no default")
            return default
        return val

    return _ENV_PATTERN.sub(sub, text)


class LoadConfig(BaseModel):
    """Warehouse target for the load stage (reference: load configs at
    tenant_config.py + tenant_loader.py:152-168)."""

    table: str
    key_columns: list[str] = Field(default_factory=list)
    mode: str = "upsert"  # upsert | append | overwrite


class PipelineConfig(BaseModel):
    """One extract[/transfer][/load] pipeline (reference:
    PipelineAssetConfig, tenant_config.py:214-262)."""

    name: str
    source_table: str
    date_column: str | None = None  # None -> non-partitioned master data
    query: str | None = None  # optional extract SQL override
    columns: list[str] | None = None  # explicit SELECT list (P1)
    has_transfer: bool = False
    transfer_function: str | None = None  # registry name; default = name
    transfer_inputs: list[str] = Field(default_factory=list)  # other pipelines
    load: LoadConfig | None = None

    @property
    def transfer_fn_name(self) -> str:
        return self.transfer_function or self.name

    @property
    def input_names(self) -> list[str]:
        return self.transfer_inputs or [self.name]


class TenantConfig(BaseModel):
    """Per-tenant tree (reference: TenantConfig, tenant_config.py:178-212)."""

    tenant_id: str
    enabled_envs: list[str] = Field(default_factory=lambda: ["dev", "prod"])
    timezone: str = "UTC"
    daily_cron: str = "0 2 * * *"  # reference: schedule_factory.py cron per tenant
    pipelines: list[PipelineConfig] = Field(default_factory=list)

    def enabled_in(self, env: str) -> bool:
        return env in self.enabled_envs

    def pipeline(self, name: str) -> PipelineConfig:
        for p in self.pipelines:
            if p.name == name:
                return p
        raise KeyError(f"pipeline {name!r} not configured for {self.tenant_id}")


class ConfigLoader:
    """Scan a tenants directory for ``*/config.yaml`` (reference:
    config_loader.py:81-157), interpolate env vars, parse, filter by
    env enablement."""

    def __init__(self, tenants_dir: str | Path, env: str = "dev"):
        self.tenants_dir = Path(tenants_dir)
        self.env = env

    def load_tenant(self, path: str | Path) -> TenantConfig:
        raw = Path(path).read_text()
        return TenantConfig.model_validate(yaml.safe_load(interpolate_env(raw)))

    def load_all_tenants(self) -> list[TenantConfig]:
        out = []
        for cfg_path in sorted(self.tenants_dir.glob("*/config.yaml")):
            tenant = self.load_tenant(cfg_path)
            if tenant.enabled_in(self.env):
                out.append(tenant)
        return out
