"""Multi-tenant breadth tests: the second tenant tree (project_02) with
a transfer-name collision resolved tenant-first, per-env enablement
differences, the dbt-analog declared schema tests as hard gates, and
golden SQL for the catalog MERGE path (no transactional catalog ships
in this container — see test_merge_delete_sql_golden)."""

from __future__ import annotations

from pathlib import Path

import pytest

from tests.conftest import SF_SMALL

TENANTS_DIR = Path(__file__).resolve().parents[1] / "dagster_etl_spark" / "tenants"
EVENTS_DATE = "2024-01-12"  # 50 events at sf0.001


@pytest.fixture(scope="module")
def tenants():
    import dagster_etl_spark.tenants.project_01  # noqa: F401 — registers plugins
    import dagster_etl_spark.tenants.project_02  # noqa: F401
    from dagster_etl_spark.orchestration import ConfigLoader

    loaded = ConfigLoader(TENANTS_DIR, env="dev").load_all_tenants()
    return {t.tenant_id: t for t in loaded}


def test_both_tenants_load_and_env_enablement_differs(tenants):
    from dagster_etl_spark.orchestration import ConfigLoader

    assert set(tenants) == {"project_01", "project_02"}
    assert [p.name for p in tenants["project_02"].pipelines] == [
        "cfg_item_master", "lot_history", "equipment_event",
    ]
    # project_02 mirrors the reference's prod.enabled=false
    prod = ConfigLoader(TENANTS_DIR, env="prod").load_all_tenants()
    assert [t.tenant_id for t in prod] == ["project_01"]
    staging = ConfigLoader(TENANTS_DIR, env="staging").load_all_tenants()
    assert [t.tenant_id for t in staging] == ["project_02"]


def test_collision_resolves_tenant_first_per_tenant(tenants):
    """``events_daily`` exists in BOTH the common registry and
    project_02's custom registry: project_02 must get its own version,
    project_01 (no override) the common one — the reference's
    tenant > common order under a real collision."""
    from dagster_etl_spark.orchestration import resolve_transfer
    from dagster_etl_spark.orchestration.transfers import events_daily_transfer
    from dagster_etl_spark.tenants.project_02 import events_daily_transfer_p02

    assert resolve_transfer("project_02", "events_daily") is events_daily_transfer_p02
    assert resolve_transfer("project_01", "events_daily") is events_daily_transfer


def test_collision_e2e_both_tenants_materialize_differently(
    spark, tenants, tmp_path_factory
):
    """Run the SAME pipeline name through both tenants end-to-end: the
    outputs must reflect each tenant's resolved function (custom adds
    avg_value; common does not)."""
    from dagster_etl_spark.orchestration import PipelineRunner

    outs = {}
    for tid in ("project_01", "project_02"):
        base = tmp_path_factory.mktemp(tid)
        runner = PipelineRunner(
            spark,
            tenants[tid],
            source_dir=SF_SMALL,
            lake_base=str(base / "lake"),
            warehouse_base=str(base / "warehouse"),
        )
        outs[tid] = runner.run_pipeline("equipment_event", EVENTS_DATE)

    df1 = outs["project_01"]["transfer"]["df"]
    df2 = outs["project_02"]["transfer"]["df"]
    assert "avg_value" not in df1.columns
    assert "avg_value" in df2.columns
    rows2 = df2.collect()
    assert rows2, "fixture date must produce events"
    for r in rows2:
        assert r.avg_value == pytest.approx(r.total_value / r.n_events)
    # both loads landed under their own tenant column
    assert all(
        r.project_id == "project_02"
        for r in outs["project_02"]["load"]["df"].select("project_id").collect()
    )


def test_sql_model_schema_tests_pass_and_register(spark):
    from dagster_etl_spark.sources.fixtures import load_table
    from dagster_etl_spark.tenants.project_02 import sql_models

    load_table(spark, SF_SMALL, "part").createOrReplaceTempView("part")
    out = sql_models().run(spark)  # declared tests all pass
    cats = {
        r.priority_category
        for r in out["tfm_item_master_enriched"].select("priority_category").distinct().collect()
    }
    assert cats <= {"HIGH", "MEDIUM", "LOW"}


def test_sql_model_schema_tests_hard_fail(spark):
    """A violating model must raise before downstream models build —
    dbt's build-stops-on-test-failure semantics as a hard gate."""
    from dagster_etl_spark.plans.sql_models import (
        ColumnTest,
        SqlModelProject,
        SqlModelTestError,
    )
    from dagster_etl_spark.sources.fixtures import load_table

    load_table(spark, SF_SMALL, "part").createOrReplaceTempView("part")
    proj = (
        SqlModelProject()
        .add(
            "bad_model",
            "SELECT p_partkey, CASE WHEN p_partkey % 2 = 0 THEN NULL ELSE p_type END AS t FROM part",
            tests=(ColumnTest("t", "not_null"),),
        )
        .add(
            "downstream",
            "SELECT COUNT(*) AS n FROM bad_model",
            depends_on=("bad_model",),
        )
    )
    with pytest.raises(SqlModelTestError, match=r"t__not_null \(\d+ rows\)"):
        proj.run(spark)
    # accepted_values violation also gates
    proj2 = SqlModelProject().add(
        "bad_vals",
        "SELECT CASE WHEN p_partkey % 7 = 0 THEN 'WEIRD' ELSE 'LOW' END AS cat FROM part",
        tests=(ColumnTest("cat", "accepted_values", values=("HIGH", "MEDIUM", "LOW")),),
    )
    with pytest.raises(SqlModelTestError, match="cat__accepted_values"):
        proj2.run(spark)
    # unique violation
    proj3 = SqlModelProject().add(
        "bad_unique",
        "SELECT p_partkey % 10 AS k FROM part",
        tests=(ColumnTest("k", "unique"),),
    )
    with pytest.raises(SqlModelTestError, match="k__unique"):
        proj3.run(spark)


def test_merge_delete_sql_golden():
    """The catalog (Iceberg/Delta) MERGE branch cannot execute here —
    no transactional catalog jars ship in this container — so the
    emitted SQL is pinned for every key shape instead: simple,
    composite, and null-safe (<=>) semantics for NULL-able keys."""
    from dagster_etl_spark.writers.upsert import merge_delete_sql

    assert merge_delete_sql("lake.aps.wip", ["id"]) == (
        "MERGE INTO lake.aps.wip t USING __source s ON t.id <=> s.id "
        "WHEN MATCHED THEN DELETE"
    )
    sql = merge_delete_sql(
        "lake.aps.wip", ["project_id", "snapshot_date", "process_step"]
    )
    assert sql == (
        "MERGE INTO lake.aps.wip t USING __source s ON "
        "t.project_id <=> s.project_id AND t.snapshot_date <=> s.snapshot_date "
        "AND t.process_step <=> s.process_step WHEN MATCHED THEN DELETE"
    )
    # null-safe operator present for every key — NULL keys must match
    # NULL target keys (reference: trino.py:206-207 IS NULL branch)
    assert sql.count("<=>") == 3 and " = " not in sql
