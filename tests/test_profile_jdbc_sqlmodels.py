"""Tests for profiling (P11/P12), the JDBC source interface (S1-S3
option building + predicate composition), and the SQL model layer (U5)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


def test_preview_and_null_counts(spark):
    from dagster_etl_spark.operators.profile import null_counts, preview
    from dagster_etl_spark.sources.fixtures import load_table

    orders = load_table(spark, SF_SMALL, "orders")
    head = preview(orders, n=5)
    assert len(head) == 5 and "o_orderkey" in head[0]

    nc = null_counts(orders.selectExpr(
        "o_orderkey",
        "CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE o_orderstatus END AS status",
    ))
    assert nc["o_orderkey"] == 0 and nc["status"] > 0


def test_null_profile_long_form(spark):
    from dagster_etl_spark.operators.profile import null_profile
    from dagster_etl_spark.sources.fixtures import load_table

    orders = load_table(spark, SF_SMALL, "orders")
    prof = {r.column_name: (r.n_nulls, r.n_rows) for r in null_profile(orders).collect()}
    n = orders.count()
    assert set(prof) == set(orders.columns)
    assert all(v == (0, n) for v in prof.values())


def test_jdbc_option_building(spark):
    from dagster_etl_spark.sources.jdbc import JdbcSource, read_query

    src = JdbcSource(url="jdbc:postgresql://h:5432/db", user="u", password="p")
    assert src.options()["driver"] == "org.postgresql.Driver"
    # no database in the container: assert the reader plan carries the
    # subquery + partitioning options without executing it
    reader = spark.read.format("jdbc").options(**src.options()).option(
        "dbtable", "(SELECT * FROM t) src_q"
    )
    assert reader is not None
    with pytest.raises(Exception):  # connecting must fail, options are wired
        read_query(spark, src, "SELECT 1").collect()


def test_jdbc_partition_filter_composes_on_any_query(spark):
    """The composed predicate works where the reference's string-append
    breaks: a base query that already has WHERE and ORDER BY."""
    from pyspark.sql import functions as F

    from dagster_etl_spark.sources.fixtures import load_table
    from dagster_etl_spark.sources.jdbc import with_partition_filter

    li = load_table(spark, SF_SMALL, "lineitem")
    li.createOrReplaceTempView("li_v")
    base = spark.sql(
        "SELECT * FROM li_v WHERE l_returnflag = 'N' ORDER BY l_orderkey"
    )
    out = with_partition_filter(base, "l_shipdate", "1995-04-05")
    rows = out.collect()
    direct = li.filter(
        (F.col("l_returnflag") == "N")
        & (F.to_date("l_shipdate") == "1995-04-05")
    ).count()
    assert len(rows) == direct > 0


def test_sql_models_run_in_dependency_order(spark):
    """The dbt-analog: staging view -> enriched transform, same shape as
    the reference's stg_cfg_item_master -> tfm_item_master_enriched."""
    from dagster_etl_spark.plans.sql_models import SqlModelProject
    from dagster_etl_spark.sources.fixtures import load_table

    load_table(spark, SF_SMALL, "part").createOrReplaceTempView("part")
    proj = (
        SqlModelProject()
        .add(
            "tfm_part_enriched",
            """SELECT p_partkey,
                      CASE WHEN p_size >= 40 THEN 'HIGH'
                           WHEN p_size >= 20 THEN 'MEDIUM'
                           ELSE 'LOW' END AS size_category,
                      current_timestamp() AS loaded_at
               FROM stg_part""",
            depends_on=("stg_part",),
            materialize="table",
        )
        .add(
            "stg_part",
            """SELECT p_partkey, coalesce(p_type, 'UNKNOWN') AS p_type,
                      coalesce(p_size, 0) AS p_size
               FROM part WHERE p_partkey IS NOT NULL""",
        )
    )
    assert proj.build_order() == ["stg_part", "tfm_part_enriched"]
    out = proj.run(spark)
    assert out["tfm_part_enriched"].count() == out["stg_part"].count() > 0
    cats = {r.size_category for r in out["tfm_part_enriched"].select("size_category").distinct().collect()}
    assert cats <= {"HIGH", "MEDIUM", "LOW"}
    # models are queryable as views afterwards (ref()-style)
    assert spark.sql("SELECT COUNT(*) n FROM tfm_part_enriched").collect()[0].n > 0
