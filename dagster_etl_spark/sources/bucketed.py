"""Bucketed warehouse tables — co-located joins without a shuffle
(SURVEY §4 / task brief: "bucketing for co-located joins").

Writing both fact tables bucketed by the join key pre-shuffles them
once at write time; every subsequent join on that key reads bucket i
against bucket i with NO exchange on either side — at 100 TB this
converts the recurring join shuffle (the dominant cost of fact-fact
joins) into a one-time write cost. The test asserts the Exchange
operators actually disappear from the physical plan.

Bucket metadata lives in the session catalog (Spark's in-memory
catalog here; Hive/Iceberg in production — same API).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 8,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sorted) table. Sorting within
    buckets additionally enables shuffle-AND-sort-free sort-merge
    joins."""
    if "." in table:
        # the orphan-location cleanup below string-builds the DEFAULT
        # database's managed path; a qualified db.tbl lives at
        # warehouse/db.db/tbl and an external table lives wherever its
        # LOCATION points — guessing either risks deleting the wrong
        # directory, so refuse rather than clean up blind.
        raise ValueError(
            f"write_bucketed requires an unqualified default-database "
            f"table name, got {table!r}"
        )
    if mode == "overwrite":
        # a fresh session's catalog doesn't know about tables whose
        # warehouse directories survived a previous session (the round
        # driver's exact situation) — saveAsTable then fails with
        # LOCATION_ALREADY_EXISTS instead of overwriting. Drop both
        # the catalog entry and any orphaned location first. When the
        # catalog DOES know the table, resolve its real location
        # (external/custom LOCATION) instead of assuming the default
        # managed path.
        spark = df.sparkSession
        location = None
        if spark.catalog.tableExists(table):
            row = (
                spark.sql(f"DESCRIBE TABLE EXTENDED {table}")
                .filter("col_name = 'Location'")
                .select("data_type")
                .head()
            )
            location = row[0] if row is not None else None
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        from dagster_etl_spark.sources.lake import delete_path

        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        delete_path(spark, location or f"{warehouse}/{table.lower()}")
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str]
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key."""
    return spark.table(left_table).join(spark.table(right_table), on=list(on))


def exchanges_in_plan(df: DataFrame) -> int:
    """Count shuffle Exchange operators in the physical plan (0 for a
    properly co-located bucketed join)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning")
