"""Dagster asset graft (SURVEY §3 entry point 1) — builds the same
asset graph shape as the reference's factories
(``[tenant, stage, name]`` keys wired extract → transfer → load with
daily partitions; reference: etl/factories/asset_factory.py:226-353,
etl/__init__.py:94-158) over this engine's ``PipelineRunner`` stages.

Dagster is NOT installed in the test container, so everything here is
gated: ``build_definitions`` raises a clear ImportError without
dagster, and the data plane stays fully runnable through
``PipelineRunner`` alone (tests/test_orchestration.py). With dagster
installed, ``dagster dev -m <module calling build_definitions>``
reproduces the reference's operational surface: daily-partitioned
assets per pipeline stage, per-tenant daily jobs, cron schedules.
"""

from __future__ import annotations

from collections.abc import Callable

from dagster_etl_spark.orchestration.config import TenantConfig


def dagster_available() -> bool:
    try:
        import dagster  # noqa: F401

        return True
    except ImportError:
        return False


def build_definitions(
    tenants: list[TenantConfig],
    spark_factory: Callable,
    source_dir: str,
    lake_base: str,
    warehouse_base: str,
    start_date: str = "2024-01-01",
    timezone: str = "Asia/Seoul",
    daily_cron: str = "0 2 * * *",
):
    """Definitions(assets=[tenant/stage/pipeline...], jobs=[{tenant}_daily_etl_job],
    schedules=[...]) — one asset per configured stage, partitioned daily,
    each calling the corresponding PipelineRunner stage."""
    if not dagster_available():
        raise ImportError(
            "dagster is not installed; run pipelines via "
            "orchestration.PipelineRunner, or pip install dagster to use "
            "the asset graph"
        )
    import dagster as dg

    from dagster_etl_spark.orchestration.pipeline import PipelineRunner

    daily = dg.DailyPartitionsDefinition(
        start_date=start_date, timezone=timezone, fmt="%Y-%m-%d", end_offset=1
    )

    def runner_for(tenant: TenantConfig) -> PipelineRunner:
        return PipelineRunner(
            spark_factory(), tenant, source_dir=source_dir,
            lake_base=lake_base, warehouse_base=warehouse_base,
        )

    assets, jobs, schedules = [], [], []
    for tenant in tenants:
        tenant_assets = []
        for p in tenant.pipelines:
            partitions = daily if p.date_column is not None else None
            extract_key = dg.AssetKey([tenant.tenant_id, "extract", p.name])

            def _extract(context, tenant=tenant, p=p):
                date = context.partition_key if p.date_column else None
                out = runner_for(tenant).extract(p, date)
                return dg.MaterializeResult(
                    metadata={"s3_path": out["path"], "row_count": out["row_count"]}
                )

            extract_asset = dg.asset(
                key=extract_key, partitions_def=partitions, name=None
            )(_extract)
            tenant_assets.append(extract_asset)
            upstream_key = extract_key

            if p.has_transfer:
                transfer_key = dg.AssetKey([tenant.tenant_id, "transfer", p.name])

                def _transfer(context, tenant=tenant, p=p):
                    date = context.partition_key if p.date_column else None
                    out = runner_for(tenant).transfer(p, date, upstream={})
                    return dg.MaterializeResult(
                        metadata={"s3_path": out["path"], "row_count": out["row_count"]}
                    )

                tenant_assets.append(
                    dg.asset(
                        key=transfer_key, partitions_def=partitions,
                        deps=[upstream_key], name=None,
                    )(_transfer)
                )
                upstream_key = transfer_key

            if p.load is not None:

                def _load(context, tenant=tenant, p=p):
                    date = context.partition_key if p.date_column else None
                    r = runner_for(tenant)
                    staged_path_stage = "transfer" if p.has_transfer else "extract"
                    from dagster_etl_spark.sources import lake

                    df = lake.read_partition(
                        r.spark, lake_base, tenant.tenant_id,
                        staged_path_stage, p.name,
                        date if p.date_column else None,
                    )
                    out = r.load(p, date, {"df": df})
                    return dg.MaterializeResult(
                        metadata={"inserted": out["inserted"], "deleted": out["deleted"]}
                    )

                tenant_assets.append(
                    dg.asset(
                        key=dg.AssetKey([tenant.tenant_id, "load", p.name]),
                        partitions_def=partitions, deps=[upstream_key], name=None,
                    )(_load)
                )

        assets.extend(tenant_assets)
        job = dg.define_asset_job(
            f"{tenant.tenant_id}_daily_etl_job",
            selection=dg.AssetSelection.assets(*tenant_assets),
            partitions_def=daily,
        )
        jobs.append(job)
        schedules.append(
            dg.build_schedule_from_partitioned_job(
                job, cron_schedule=tenant.daily_cron or daily_cron
            )
        )

    return dg.Definitions(assets=assets, jobs=jobs, schedules=schedules)
