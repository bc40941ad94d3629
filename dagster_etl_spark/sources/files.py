"""File-format sources beyond Parquet: CSV, JSON-lines, ORC — behind
the same contract as the fixture/lake sources.

The reference ingests only from relational sources (etl/resources/
rdb.py); file drops are the other half of real ingestion. Two rules
make these safe at 100 TB:

* **Explicit schema, always.** Schema inference on CSV/JSON is a full
  extra pass over the data (Spark samples, but a correct inference
  needs everything); worse, inference is data-dependent — a partition
  of all-null columns infers differently tomorrow than today. Callers
  pass the expected StructType (or take it from plans.schema_utils);
  the reader never silently drifts.
* **Corrupt rows are counted, not dropped.** PERMISSIVE mode captures
  unparseable records in ``_corrupt_record``; :func:`read_with_rejects`
  splits them off so the pipeline can land good rows and quarantine
  bad ones with real numbers — silent row loss at scale is
  undebuggable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from dagster_etl_spark.plans.cache import pin

CORRUPT_COL = "_corrupt_record"


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV with a declared schema contract (no inference scan)."""
    return (
        spark.read.format("csv")
        .option("header", str(header).lower())
        .options(**options)
        .schema(schema)
        .load(path)
    )


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType, **options: str
) -> DataFrame:
    """JSON-lines with a declared schema contract."""
    return spark.read.format("json").options(**options).schema(schema).load(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC is self-describing like Parquet — no schema needed."""
    return spark.read.orc(path)


def read_with_rejects(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "json",
    **options: str,
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE read split into (good_rows, rejected_raw_lines).

    The corrupt-capture column rides along the scan (one pass); good
    rows drop it, rejects keep only the raw line — ready for a
    quarantine sink. Both frames are lazy views of the same scan.
    """
    full_schema = StructType(
        [*schema.fields, StructField(CORRUPT_COL, StringType())]
    )
    df = pin(
        spark.read.format(fmt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .options(**options)
        .schema(full_schema)
        .load(path)
        # Spark requires materializing the parsed struct before the
        # corrupt column is referenced standalone; pin() registers the
        # cache so harnesses' release_pinned() can free it
    )
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return good, bad


def write_format(
    df: DataFrame, path: str, fmt: str = "parquet", mode: str = "overwrite", **options: str
) -> None:
    """Format-dispatched write (csv/json/orc/parquet), same path
    contract as the lake writer."""
    w = df.write.mode(mode).options(**options)
    if fmt == "csv":
        w = w.option("header", "true")
    w.format(fmt).save(path)
