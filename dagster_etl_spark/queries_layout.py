"""Driver-green queries for the physical-layout and dbt-template
layers: the Z-order interleave math with an exact DuckDB oracle, a
two-run dbt incremental materialization whose merged end state equals a
plain SQL query over the source table, and a small-file compaction
rewrite proven row-identical to its source.

Reference anchors: dbt model tree + materializations
(etl/tenants/project_01/dbt/models/transform/
tfm_item_master_enriched.sql:1-20, dbt_project.yml); clustered writes
are a beyond-parity extension (plans/layout.py:zorder_write).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dagster_etl_spark.plans.layout import zvalue_expr
from dagster_etl_spark.registry import register
from dagster_etl_spark.sources.fixtures import load_table

# ---------------------------------------------------------------------------
# Z-order clustering effect, exact-rank variant.

_ZBITS = 4  # 16 buckets per dimension -> z in [0, 256), 16 files

# DuckDB Morton interleave, mirroring zvalue_expr's bit placement:
# bit i of column j lands at position i * n_cols + j (column 0 = even
# bits, column 1 = odd bits).
_DUCK_Z = " | ".join(
    f"(((b_x >> {i}) & 1) << {2 * i}) | (((b_y >> {i}) & 1) << {2 * i + 1})"
    for i in range(_ZBITS)
)

_ZORDER_ORACLE = f"""
WITH m AS (
  SELECT doc_id,
         (doc_id * 7919) % 997 AS x,
         (doc_id * 104729) % 997 AS y
  FROM documents
), r AS (
  SELECT x, y,
         ((ROW_NUMBER() OVER (ORDER BY x, doc_id) - 1) * 16) // COUNT(*) OVER () AS b_x,
         ((ROW_NUMBER() OVER (ORDER BY y, doc_id) - 1) * 16) // COUNT(*) OVER () AS b_y
  FROM m
), z AS (
  SELECT x, y, b_x, ({_DUCK_Z}) AS zv FROM r
)
SELECT 'zorder' AS layout, CAST(zv // 16 AS BIGINT) AS file_id,
       COUNT(*) AS n_rows,
       CAST(MAX(x) - MIN(x) AS BIGINT) AS span_x,
       CAST(MAX(y) - MIN(y) AS BIGINT) AS span_y
FROM z GROUP BY 2
UNION ALL
SELECT 'linear' AS layout, CAST(b_x AS BIGINT) AS file_id,
       COUNT(*) AS n_rows,
       CAST(MAX(x) - MIN(x) AS BIGINT) AS span_x,
       CAST(MAX(y) - MIN(y) AS BIGINT) AS span_y
FROM z GROUP BY 2
"""


@register(
    "zorder_span_stats",
    oracle=_ZORDER_ORACLE,
    tags=("layout", "zorder"),
    doc="Z-order clustering effect with an exact oracle: two "
    "decorrelated metrics are exact-rank bucketed (16 buckets), Morton "
    "interleaved via the production zvalue_expr, and range-assigned to "
    "16 files; per-file min/max spans of BOTH metrics are returned for "
    "the z-order layout vs a linear sort on x. The z-layout bounds both "
    "spans at once — the property row-group pruning exploits. Exact "
    "ranks (global window) make the result oracle-checkable; the "
    "production write path (plans/layout.py:zorder_write) uses "
    "approxQuantile + repartitionByRange with no global window and is "
    "covered by row-group-stats tests.",
)
def q_zorder_span_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        ((F.col("doc_id") * 7919) % 997).alias("x"),
        ((F.col("doc_id") * 104729) % 997).alias("y"),
    )
    n = Window.partitionBy()
    ranked = docs.select(
        "x",
        "y",
        F.expr(
            "(row_number() OVER (ORDER BY x, doc_id) - 1) * 16"
        ).alias("rx"),
        F.expr(
            "(row_number() OVER (ORDER BY y, doc_id) - 1) * 16"
        ).alias("ry"),
        F.count(F.lit(1)).over(n).alias("cnt"),
    ).select(
        "x",
        "y",
        F.expr("rx div cnt").alias("b_x"),
        F.expr("ry div cnt").alias("b_y"),
    )
    zed = ranked.withColumn("zv", zvalue_expr(["b_x", "b_y"], bits=_ZBITS))

    def spans(df: DataFrame, file_col, layout: str) -> DataFrame:
        return (
            df.groupBy(file_col.cast("long").alias("file_id"))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                (F.max("x") - F.min("x")).cast("long").alias("span_x"),
                (F.max("y") - F.min("y")).cast("long").alias("span_y"),
            )
            .select(F.lit(layout).alias("layout"), "*")
        )

    return spans(zed, F.expr("zv div 16"), "zorder").unionByName(
        spans(zed, F.col("b_x"), "linear")
    )


# ---------------------------------------------------------------------------
# dbt incremental materialization, run twice; end state == plain SQL.

_DBT_INC_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice,
       CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 'expedite' ELSE 'standard' END AS priority_class
FROM orders
"""

_STG_MODEL = """
select o_orderkey, o_custkey, o_totalprice, o_orderdate,
       {{ priority_class('o_orderpriority') }} as priority_class
from {{ source('lake', 'orders') }}
"""

_INC_MODEL = """
{{ config(materialized='incremental', unique_key='o_orderkey') }}
select * from {{ ref('stg_orders') }}
{% if is_incremental() %}
  where o_orderdate > (select max(o_orderdate) from {{ this }})
{% endif %}
"""

_MACROS = (
    "{% macro priority_class(col) %}"
    "CASE WHEN {{ col }} IN ('1-URGENT', '2-HIGH') "
    "THEN 'expedite' ELSE 'standard' END"
    "{% endmacro %}"
)


@register(
    "dbt_incremental_orders",
    oracle=_DBT_INC_ORACLE,
    tags=("parity", "dbt"),
    doc="U5 end-to-end: a templated model tree (source/ref/macro/"
    "config) with an incremental model materialized TWICE — first on "
    "pre-1999 history (full build), then on the full table, where the "
    "is_incremental() date gate admits only rows newer than the "
    "materialized max and the unique_key upsert merges them. The final "
    "lake state must equal the one-shot SQL over all orders.",
)
def q_dbt_incremental_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dagster_etl_spark.plans.dbt_templates import DbtProject
    from dagster_etl_spark.scratch import scratch_dir

    lake = scratch_dir("dbt_inc_orders")
    orders = load_table(spark, sf_dir, "orders")
    project = DbtProject(
        sources={("lake", "orders"): "src_orders_batch"},
        macros_sql=_MACROS,
    )
    project.add("stg_orders", _STG_MODEL)
    project.add("inc_orders", _INC_MODEL)
    compiled = project.compile()

    # batch 1: history before the cutoff -> first run does a full build
    orders.filter(F.col("o_orderdate") < F.lit("1999-01-01")).createOrReplaceTempView(
        "src_orders_batch"
    )
    compiled.run(spark, lake_root=lake)

    # batch 2: the complete table arrives; only rows newer than the
    # materialized max date pass the incremental gate and are upserted
    orders.createOrReplaceTempView("src_orders_batch")
    out = compiled.run(spark, lake_root=lake)["inc_orders"]
    return out.select("o_orderkey", "o_custkey", "o_totalprice", "priority_class")


# ---------------------------------------------------------------------------
# Small-file compaction: content preservation proven against the source.

_COMPACT_ORACLE = """
SELECT doc_id, text, lang, source, n_chars FROM documents
"""


@register(
    "compacted_scan",
    oracle=_COMPACT_ORACLE,
    tags=("layout", "maintenance"),
    doc="Lake maintenance: the documents table is exploded into ~48 "
    "kilobyte-scale files (the accreted-micro-batch pathology), "
    "compact_parquet coalesces them to the byte-target file count via "
    "a materialize-then-swap rewrite, and the compacted directory must "
    "scan back row-identical to the source table.",
)
def q_compacted_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dagster_etl_spark.plans.layout import compact_parquet, compaction_plan
    from dagster_etl_spark.scratch import scratch_dir

    path = scratch_dir("compact_scan") + "/documents"
    docs = load_table(spark, sf_dir, "documents")
    docs.repartition(48).write.mode("overwrite").parquet(path)
    stats = compact_parquet(spark, path, target_file_mb=128)
    # explicit raise, not assert: the rewrite check must survive python -O
    if not stats["rewritten"]:
        raise RuntimeError("compact_parquet did not rewrite the directory")
    files_after = compaction_plan(spark, path)["files"]
    if files_after >= 48:
        raise RuntimeError(f"compaction left {files_after} files (expected < 48)")
    return spark.read.parquet(path).select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
