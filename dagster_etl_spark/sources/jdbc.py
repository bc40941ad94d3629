"""JDBC source (SURVEY §2 S1-S3) — the production twin of the fixture
source, behind the same interface.

Reference: etl/resources/rdb.py:64-110 (SQLAlchemy + pandas.read_sql,
partition filter string-appended as ``WHERE {col} = :date`` — which
breaks when the base query already has WHERE/ORDER BY). Here:

* arbitrary SELECTs run as a JDBC subquery (``dbtable = (q) t``), so
  the source database executes them natively;
* the partition predicate is composed on the DataFrame — Catalyst
  pushes eligible predicates through the JDBC scan (shows up in
  ``PushedFilters``), composing correctly with any base query;
* parallel reads partition on a numeric column
  (partitionColumn/numPartitions) so a 1000-executor cluster doesn't
  funnel the table through one connection — the knob the single-process
  reference cannot have.

No database ships in the test container, so integration paths are
exercised against the fixture source (same interface); the option
building here is unit-tested.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class JdbcSource:
    """Connection facts for one source database (reference:
    RDBResource, etl/resources/rdb.py:24-47)."""

    url: str  # jdbc:postgresql://host:5432/db
    user: str
    password: str
    driver: str = "org.postgresql.Driver"
    fetchsize: int = 10_000

    def options(self) -> dict[str, str]:
        return {
            "url": self.url,
            "user": self.user,
            "password": self.password,
            "driver": self.driver,
            "fetchsize": str(self.fetchsize),
        }


def read_query(
    spark: SparkSession,
    src: JdbcSource,
    query: str,
    partition_column: str | None = None,
    num_partitions: int | None = None,
    bounds: tuple[int, int] | None = None,
) -> DataFrame:
    """S1: arbitrary SELECT pushed to the source as a subquery scan.
    With (partition_column, num_partitions, bounds) the read fans out
    across executors in ``num_partitions`` range-sliced queries."""
    reader = spark.read.format("jdbc").options(**src.options())
    reader = reader.option("dbtable", f"({query.rstrip(';')}) src_q")
    if partition_column and num_partitions and bounds:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(bounds[0]))
            .option("upperBound", str(bounds[1]))
        )
    return reader.load()


def read_table(spark: SparkSession, src: JdbcSource, table: str, **kw) -> DataFrame:
    return read_query(spark, src, f"SELECT * FROM {table}", **kw)


def with_partition_filter(
    df: DataFrame, date_column: str, partition_date: str
) -> DataFrame:
    """S2 composed form: works on any base query (the reference's
    string-append breaks on existing WHERE clauses, rdb.py:97); Catalyst
    pushes the predicate into the JDBC scan where the column is direct."""
    return df.filter(F.to_date(F.col(date_column)) == F.lit(partition_date))


def table_row_count(spark: SparkSession, src: JdbcSource, table: str) -> int:
    """S3: COUNT(*) pushed down — the subquery form makes the source DB
    do the count; Spark transfers one row."""
    # int(): some sources surface COUNT(*) as DECIMAL (DuckDB HUGEINT)
    return int(read_query(spark, src, f"SELECT COUNT(*) AS n FROM {table}").collect()[0].n)


def find_duckdb_jdbc_jar() -> str | None:
    """Locate a DuckDB JDBC driver jar (public Maven artifact
    ``org.duckdb:duckdb_jdbc``) for live-database integration tests:
    ``SPARK_GRAFT_DUCKDB_JDBC_JAR`` env var first, else the
    conventional local Maven/Coursier/Ivy caches. Returns None when no
    jar is available (tests skip with a note)."""
    import glob
    import os

    env = os.environ.get("SPARK_GRAFT_DUCKDB_JDBC_JAR")
    if env and os.path.exists(env):
        return env
    for pat in (
        "~/.cache/coursier/**/duckdb_jdbc*.jar",
        "~/.m2/repository/**/duckdb_jdbc*.jar",
        "~/.ivy2/**/duckdb_jdbc*.jar",
    ):
        hits = glob.glob(os.path.expanduser(pat), recursive=True)
        if hits:
            return sorted(hits)[-1]
    return None
