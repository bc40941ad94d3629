"""Item-master staging + enrichment — SURVEY.md §2 P4/P6-P9, U5.

Reference dbt models (reference: etl/tenants/project_01/dbt/models/
staging/stg_cfg_item_master.sql and transform/tfm_item_master_enriched.sql):
staging coalesces nullable attributes; transform buckets priority into
HIGH/MEDIUM/LOW and derives an ``is_manufactured`` flag.

Implemented as plain Catalyst expressions (the ~25 lines of dbt SQL need
no dbt runtime); a ``spark.sql`` string variant is exposed for the U5
SQL-model extension point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stage_item_master(
    df: DataFrame,
    item_id: str = "item_id",
    item_type: str = "item_type",
    item_name: str = "item_name",
    item_priority: str = "item_priority",
    project_filter: tuple[str, str] | None = None,
) -> DataFrame:
    """Staging model: constant-predicate filter + null-coalescing
    projection (P4, P6)."""
    if project_filter is not None:
        col, val = project_filter
        df = df.filter(F.col(col) == val)
    return df.select(
        F.col(item_id).cast("string").alias("item_id"),
        F.coalesce(F.col(item_type), F.lit("UNKNOWN")).alias("item_type"),
        F.coalesce(F.col(item_name), F.lit("")).alias("item_name"),
        F.coalesce(F.col(item_priority), F.lit(0)).cast("int").alias("item_priority"),
        *[c for c in df.columns if c not in {item_id, item_type, item_name, item_priority}],
    )


def enrich_item_master(
    staged: DataFrame,
    prod_type_col: str | None = "prod_type",
    high_threshold: int = 8,
    medium_threshold: int = 4,
    with_loaded_at: bool = False,
) -> DataFrame:
    """Transform model: CASE bucketing (P8) + boolean flag (P7) +
    optional load timestamp (P9, excluded from oracle comparisons —
    nondeterministic)."""
    out = staged.withColumn(
        "priority_category",
        F.when(F.col("item_priority") >= high_threshold, "HIGH")
        .when(F.col("item_priority") >= medium_threshold, "MEDIUM")
        .otherwise("LOW"),
    )
    if prod_type_col is not None and prod_type_col in staged.columns:
        manufactured = F.col(prod_type_col).isNotNull() & (F.col(prod_type_col) != "")
    else:
        manufactured = F.lit(False)
    out = out.withColumn("is_manufactured", manufactured)
    if with_loaded_at:
        out = out.withColumn("dbt_loaded_at", F.current_timestamp())
    return out
