"""dbt-template front end for the SQL model layer: ref/source/var/
config resolution, macro expansion, auto-derived dependencies, and an
end-to-end staging->transform run on Spark mirroring the reference's
model tree shape (project_01/dbt/models: staging cleans a source,
transform derives business columns via ref)."""

from __future__ import annotations

import pytest

from dagster_etl_spark.plans.dbt_templates import DbtProject, parse_macros, render
from dagster_etl_spark.plans.sql_models import ColumnTest, SqlModelTestError
from tests.conftest import SF_SMALL


def test_render_ref_source_var_config():
    r = render(
        """
        {{ config(materialized='table') }}
        select * from {{ source('source_db', 'cfg_item_master') }}
        join {{ ref('stg_other') }} using (k)
        where project_id = '{{ var("project", "p0") }}'
        """,
        sources={("source_db", "cfg_item_master"): "item_master_raw"},
    )
    assert "item_master_raw" in r.sql
    assert "stg_other" in r.sql
    assert "'p0'" in r.sql
    assert r.refs == ("stg_other",)
    assert r.materialize == "table"
    # declared var wins over default
    r2 = render("select '{{ var('project', 'p0') }}' as p", variables={"project": "P9"})
    assert "'P9'" in r2.sql


def test_macro_expansion_positional_keyword_default_nested():
    macros = parse_macros(
        """
        {% macro cents(col, scale=100) %}CAST(round({{ col }} * {{ scale }}) AS BIGINT){% endmacro %}
        {% macro money_sum(col) %}SUM({{ cents(col) }}){% endmacro %}
        """
    )
    r = render(
        "select {{ money_sum('qty') }} as s, {{ cents('price', 1000) }} as m from t",
        macros=macros,
    )
    assert "SUM(CAST(round(qty * 100) AS BIGINT))" in r.sql
    assert "CAST(round(price * 1000) AS BIGINT)" in r.sql


def test_macro_missing_arg_and_unknown_call_raise():
    macros = parse_macros("{% macro f(a) %}{{ a }}{% endmacro %}")
    with pytest.raises(TypeError):
        render("select {{ f() }}", macros=macros)
    with pytest.raises(NameError):
        render("select {{ nonexistent_macro(1) }}")
    with pytest.raises(ValueError):
        render("select 1 {% if x %}bad{% endif %}")


def test_compile_auto_deps_and_unknown_ref():
    p = (
        DbtProject()
        .add("stg_a", "select 1 as k")
        .add("tfm_b", "select * from {{ ref('stg_a') }}")
    )
    proj = p.compile()
    assert proj.models["tfm_b"].depends_on == ("stg_a",)
    assert proj.build_order().index("stg_a") < proj.build_order().index("tfm_b")

    bad = DbtProject().add("m", "select * from {{ ref('missing') }}")
    with pytest.raises(KeyError):
        bad.compile()


def test_end_to_end_staging_transform_on_spark(spark):
    """The reference's model-tree shape (staging cleans a source with
    coalesce defaults; transform refs staging and derives a CASE
    priority class), templated with source/ref/var/macro, run through
    SqlModelProject with a hard schema-test gate.

    Reference: project_01/dbt/models/staging/stg_cfg_item_master.sql,
    transform/tfm_item_master_enriched.sql, dbt_factory.py:102-147."""
    from dagster_etl_spark.sources.fixtures import load_table

    load_table(spark, SF_SMALL, "part").createOrReplaceTempView("src_part")
    project = DbtProject(
        sources={("source_db", "part"): "src_part"},
        variables={"min_size": "10"},
        macros_sql="""
        {% macro clean_str(col, default='UNKNOWN') %}coalesce({{ col }}, '{{ default }}'){% endmacro %}
        """,
    )
    project.add(
        "stg_part",
        """
        select p_partkey,
               {{ clean_str('p_type') }} as p_type,
               {{ clean_str('p_brand', 'NONE') }} as p_brand,
               p_size
        from {{ source('source_db', 'part') }}
        where p_size >= {{ var('min_size') }}
        """,
    )
    project.add(
        "tfm_part_enriched",
        """
        {{ config(materialized='table') }}
        select *,
               case when p_size >= 40 then 'LARGE'
                    when p_size >= 25 then 'MEDIUM'
                    else 'SMALL' end as size_class
        from {{ ref('stg_part') }}
        """,
    )
    project.tests["tfm_part_enriched"] = (
        ColumnTest("p_type", "not_null"),
        ColumnTest("size_class", "accepted_values", ("LARGE", "MEDIUM", "SMALL")),
        ColumnTest("p_partkey", "unique"),
    )
    out = project.compile().run(spark)
    got = out["tfm_part_enriched"]
    assert got.filter("p_size < 10").count() == 0
    assert got.filter("p_type IS NULL").count() == 0
    sizes = {r.size_class for r in got.select("size_class").distinct().collect()}
    assert sizes <= {"LARGE", "MEDIUM", "SMALL"}

    # the hard gate still fires through the templated path
    bad = DbtProject().add("m_bad", "select NULL as x union all select 1 as x")
    bad.tests["m_bad"] = (ColumnTest("x", "not_null"),)
    with pytest.raises(SqlModelTestError):
        bad.compile().run(spark)


def test_incremental_model_first_and_merge_runs(spark, tmp_path):
    """dbt incremental contract end-to-end: first run full-builds the
    target; the second run sees only rows newer than {{ this }}'s
    high-water mark (is_incremental() block kept) and MERGEs them by
    unique_key through the S9 upsert writer — updated keys replaced,
    old keys kept, new keys appended."""
    lake = str(tmp_path / "lake")
    spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b")], "k int, batch int, v string"
    ).createOrReplaceTempView("src_events")

    project = DbtProject()
    project.add(
        "inc_model",
        """
        {{ config(materialized='incremental', unique_key='k') }}
        select k, batch, v from src_events
        {% if is_incremental() %}
          where batch > (select max(batch) from {{ this }})
        {% endif %}
        """,
    )
    compiled = project.compile()
    m = compiled.models["inc_model"]
    assert m.unique_key == ("k",)
    assert "where batch >" not in m.sql  # full build has no gate
    assert "inc_model__current" in m.incremental_sql

    first = compiled.run(spark, lake_root=lake)["inc_model"]
    assert sorted((r.k, r.batch, r.v) for r in first.collect()) == [
        (1, 10, "a"), (2, 20, "b"),
    ]

    # new source state: k=2 updated in a newer batch, k=3 added, and a
    # stale duplicate of k=1 from an OLD batch that the incremental
    # filter must exclude
    spark.createDataFrame(
        [(1, 10, "a"), (1, 5, "stale"), (2, 30, "b2"), (3, 30, "c")],
        "k int, batch int, v string",
    ).createOrReplaceTempView("src_events")
    second = compiled.run(spark, lake_root=lake)["inc_model"]
    assert sorted((r.k, r.batch, r.v) for r in second.collect()) == [
        (1, 10, "a"), (2, 30, "b2"), (3, 30, "c"),
    ]

    # missing unique_key is a compile-time error
    bad = DbtProject().add(
        "m", "{{ config(materialized='incremental') }} select 1 as k"
    )
    with pytest.raises(ValueError):
        bad.compile()


def test_incremental_only_ref_enters_dependency_graph():
    """A ref() that appears ONLY inside {% if is_incremental() %} must
    still create a dependency edge (dbt derives deps from all branches)
    and still fail the unknown-model check."""
    p = (
        DbtProject()
        .add("dim", "select 1 as k, 'x' as grp")
        .add(
            "inc",
            """
            {{ config(materialized='incremental', unique_key='k') }}
            select 1 as k, 2 as v
            {% if is_incremental() %}
              where k in (select k from {{ ref('dim') }})
            {% endif %}
            """,
        )
    )
    compiled = p.compile()
    assert compiled.models["inc"].depends_on == ("dim",)
    assert compiled.build_order().index("dim") < compiled.build_order().index("inc")

    bad = DbtProject().add(
        "inc",
        """
        {{ config(materialized='incremental', unique_key='k') }}
        select 1 as k
        {% if is_incremental() %}
          where k in (select k from {{ ref('missing') }})
        {% endif %}
        """,
    )
    with pytest.raises(KeyError):
        bad.compile()


def test_unknown_source_raises():
    """A typo'd source() must fail loudly, not silently bind to a
    schema_table view name."""
    with pytest.raises(KeyError, match="unknown source"):
        render(
            "select * from {{ source('raw', 'nope') }}",
            sources={("raw", "part"): "src_part"},
        )


def test_direct_incremental_without_unique_key_raises(spark, tmp_path):
    """SqlModelProject.add(materialize='incremental') without unique_key
    bypasses DbtProject.compile — _run_incremental must still raise a
    clear error instead of an opaque reduce() TypeError."""
    from dagster_etl_spark.plans.sql_models import SqlModelProject

    spark.createDataFrame([(1,)], "k int").createOrReplaceTempView("src_k")
    proj = SqlModelProject().add(
        "m", "select k from src_k", materialize="incremental"
    )
    lake = str(tmp_path / "lake")
    with pytest.raises(ValueError, match="unique_key"):
        proj.run(spark, lake_root=lake)


_SCHEMA_YML = """
version: 2
models:
  - name: stg_a
    description: staging
    columns:
      - name: k
        tests:
          - not_null
          - unique
      - name: cls
        tests:
          - accepted_values:
              values: ['hi', 'lo']
"""


def test_schema_yml_tests_gate_the_build(spark):
    """dbt schema.yml declarations become hard-fail ColumnTests: a
    passing model materializes, a violating one raises with the test
    label (reference: _transform__schema.yml)."""
    from dagster_etl_spark.plans.dbt_templates import parse_schema_yml
    from dagster_etl_spark.plans.sql_models import SqlModelTestError

    parsed = parse_schema_yml(_SCHEMA_YML)
    assert [t.test for t in parsed["stg_a"]] == ["not_null", "unique", "accepted_values"]

    spark.createDataFrame(
        [(1, "hi"), (2, "lo")], "k int, cls string"
    ).createOrReplaceTempView("src_ab")
    good = (
        DbtProject()
        .add("stg_a", "select k, cls from src_ab")
        .with_schema_yml(_SCHEMA_YML)
        .compile()
    )
    assert good.run(spark)["stg_a"].count() == 2

    spark.createDataFrame(
        [(1, "hi"), (1, "bad")], "k int, cls string"
    ).createOrReplaceTempView("src_ab")
    with pytest.raises(SqlModelTestError, match="cls__accepted_values"):
        good.run(spark)


def test_schema_yml_unknown_model_and_test_raise():
    from dagster_etl_spark.plans.dbt_templates import parse_schema_yml

    with pytest.raises(ValueError, match="unknown schema test"):
        parse_schema_yml(
            "models:\n- name: m\n  columns:\n  - name: c\n    tests: [relationships]\n"
        )
    bad = (
        DbtProject()
        .add("other", "select 1 as k")
        .with_schema_yml("models:\n- name: missing\n  columns:\n  - name: k\n    tests: [not_null]\n")
    )
    with pytest.raises(KeyError, match="unknown model"):
        bad.compile()
