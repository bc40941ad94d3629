"""Staged pipeline runner — the asset-factory analog (SURVEY §3 entry
point 2): extract → transfer → load per partition, with the reference's
stage-handoff contract (each stage writes lake Parquet and passes a
``{"path", "row_count", "tenant_id"}`` dict; reference:
etl/factories/asset_factory.py:105-431).

Spark-first differences, by design:
* the extract partition predicate is composed with ``.filter`` —
  Catalyst pushes it into the scan — instead of string-appending WHERE
  to the source SQL (which breaks on queries that already have WHERE /
  ORDER BY; reference bug at etl/resources/rdb.py:97);
* within a run, the handoff dict also carries the live DataFrame, so
  downstream stages reuse the in-memory plan and the lake write is a
  checkpoint, not the data path (the reference round-trips pandas
  through S3 between every stage);
* the load stage is the distributed keyed-upsert writer, not per-row
  DELETE + 1000-row INSERT literals.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dagster_etl_spark.orchestration.config import PipelineConfig, TenantConfig
from dagster_etl_spark.orchestration.plugins import (
    resolve_extract_query,
    resolve_load_config,
    resolve_transfer,
)
from dagster_etl_spark.sources import lake
from dagster_etl_spark.sources.fixtures import load_table
from dagster_etl_spark.writers.upsert import append_parquet, upsert_parquet, with_tenant

StepHook = Callable[[dict[str, Any]], None]


@dataclass
class RunContext:
    """Step-level observability (A9/S13 substrate): one record per
    stage execution, exportable via orchestration.observability."""

    records: list[dict[str, Any]] = field(default_factory=list)
    hooks: list[StepHook] = field(default_factory=list)

    def record(self, **kw: Any) -> None:
        kw.setdefault("ts", time.time())
        self.records.append(kw)
        for h in self.hooks:
            h(kw)


class PipelineRunner:
    """Runs a tenant's configured pipelines for one partition date."""

    def __init__(
        self,
        spark: SparkSession,
        tenant: TenantConfig,
        source_dir: str,
        lake_base: str,
        warehouse_base: str,
        context: RunContext | None = None,
    ):
        self.spark = spark
        self.tenant = tenant
        self.source_dir = source_dir
        self.lake_base = lake_base
        self.warehouse_base = warehouse_base
        self.ctx = context or RunContext()

    # -- stages ---------------------------------------------------------------

    def extract(self, p: PipelineConfig, partition_date: str | None) -> dict[str, Any]:
        """Source scan (S1/S2): fixture Parquet (or JDBC behind the same
        interface), custom-query override (U2) > config.query > full
        scan, explicit column list (P1), composed partition predicate
        (P5), lake checkpoint write (S4)."""
        t0 = time.time()
        sql = resolve_extract_query(self.tenant.tenant_id, p.name) or p.query
        df = load_table(self.spark, self.source_dir, p.source_table)
        if sql is not None:
            df.createOrReplaceTempView(p.source_table)
            df = self.spark.sql(sql)
        if p.columns:
            df = df.select(*p.columns)
        lake_date = partition_date if p.date_column is not None else None
        if p.date_column is not None and partition_date is not None:
            df = df.filter(F.to_date(F.col(p.date_column)) == F.lit(partition_date))
        path = lake.write_partition(
            df, self.lake_base, self.tenant.tenant_id, "extract", p.name, lake_date
        )
        out = self._handoff(df, path, p, "extract", t0)
        return out

    def transfer(
        self,
        p: PipelineConfig,
        partition_date: str | None,
        upstream: dict[str, dict[str, Any]],
    ) -> dict[str, Any]:
        """U1 transfer function over named inputs; reads the in-run
        DataFrames when available, else re-reads the lake checkpoint."""
        t0 = time.time()
        inputs: dict[str, DataFrame] = {}
        for name in p.input_names:
            if name in upstream:
                inputs[name] = upstream[name]["df"]
            else:
                try:  # master-data inputs checkpoint under latest/
                    in_date = (
                        partition_date
                        if self.tenant.pipeline(name).date_column is not None
                        else None
                    )
                except KeyError:
                    in_date = partition_date
                inputs[name] = lake.read_partition(
                    self.spark, self.lake_base, self.tenant.tenant_id,
                    "extract", name, in_date,
                )
        fn = resolve_transfer(self.tenant.tenant_id, p.transfer_fn_name)
        df = fn(inputs, partition_date or "latest", self.tenant.tenant_id)
        lake_date = partition_date if p.date_column is not None else None
        path = lake.write_partition(
            df, self.lake_base, self.tenant.tenant_id, "transfer", p.name, lake_date
        )
        return self._handoff(df, path, p, "transfer", t0)

    def load(
        self, p: PipelineConfig, partition_date: str | None, staged: dict[str, Any]
    ) -> dict[str, Any]:
        """S8-S12: tenant-column injection + keyed upsert (or append /
        overwrite) into the warehouse path."""
        t0 = time.time()
        cfg = resolve_load_config(self.tenant.tenant_id, p.name) or p.load
        if cfg is None:  # explicit raise, not assert: survives python -O
            raise ValueError(f"load stage without load config: {p.name}")
        df = with_tenant(staged["df"], self.tenant.tenant_id)
        target = f"{self.warehouse_base.rstrip('/')}/{cfg.table}"
        if cfg.mode == "upsert":
            stats = upsert_parquet(self.spark, df, target, cfg.key_columns)
        elif cfg.mode == "append":
            stats = {"deleted": 0, "inserted": append_parquet(df, target)}
        else:
            n = df.count()
            df.write.mode("overwrite").parquet(target)
            stats = {"deleted": -1, "inserted": n}
        rec = {"df": df, "path": target, "row_count": stats["inserted"],
               "tenant_id": self.tenant.tenant_id, **stats}
        self.ctx.record(
            tenant=self.tenant.tenant_id, pipeline=p.name, stage="load",
            status="success", rows=stats["inserted"], elapsed_sec=round(time.time() - t0, 3),
        )
        return rec

    # -- orchestration --------------------------------------------------------

    def run_pipeline(
        self,
        name: str,
        partition_date: str | None,
        upstream: dict[str, dict[str, Any]] | None = None,
    ) -> dict[str, dict[str, Any]]:
        """extract → [transfer] → [load] for one pipeline; returns the
        stage handoffs keyed by stage."""
        p = self.tenant.pipeline(name)
        upstream = dict(upstream or {})
        out: dict[str, dict[str, Any]] = {}
        try:
            out["extract"] = self.extract(p, partition_date)
            upstream[p.name] = out["extract"]
            staged = out["extract"]
            if p.has_transfer:
                out["transfer"] = self.transfer(p, partition_date, upstream)
                staged = out["transfer"]
            if p.load is not None or resolve_load_config(self.tenant.tenant_id, p.name):
                out["load"] = self.load(p, partition_date, staged)
        except Exception as exc:  # failure hook parity (etl_hooks.py:19-82)
            self.ctx.record(
                tenant=self.tenant.tenant_id, pipeline=name, stage="run",
                status="failure", error=str(exc)[:500],
            )
            raise
        return out

    def run_partition(self, partition_date: str | None) -> dict[str, dict[str, Any]]:
        """All configured pipelines, extracts first (shared inputs),
        then transfers/loads — the per-partition daily job."""
        handoffs: dict[str, dict[str, Any]] = {}
        results: dict[str, dict[str, Any]] = {}
        for p in self.tenant.pipelines:
            handoffs[p.name] = self.extract(p, partition_date)
        for p in self.tenant.pipelines:
            staged = handoffs[p.name]
            stages = {"extract": staged}
            if p.has_transfer:
                stages["transfer"] = self.transfer(p, partition_date, handoffs)
                staged = stages["transfer"]
            if p.load is not None or resolve_load_config(self.tenant.tenant_id, p.name):
                stages["load"] = self.load(p, partition_date, staged)
            results[p.name] = stages
        return results

    # -- internals ------------------------------------------------------------

    def _handoff(
        self, df: DataFrame, path: str, p: PipelineConfig, stage: str, t0: float
    ) -> dict[str, Any]:
        n = self.spark.read.parquet(path).count()  # count the checkpoint, not the plan
        self.ctx.record(
            tenant=self.tenant.tenant_id, pipeline=p.name, stage=stage,
            status="success", rows=n, elapsed_sec=round(time.time() - t0, 3),
        )
        return {"df": df, "path": path, "row_count": n, "tenant_id": self.tenant.tenant_id}
