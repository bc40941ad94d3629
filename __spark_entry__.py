"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in :mod:`dagster_etl_spark`; this module is a thin
adapter over its query registry.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from dagster_etl_spark import registry  # noqa: E402


def _configure(spark: SparkSession) -> SparkSession:
    """Session settings the engine relies on, applied to a driver-provided
    session (the driver builds its own SparkSession)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        # the driver's plain session defaults to 200 shuffle partitions;
        # at the sf0.001-0.01 gate scale that is task-launch overhead
        # (a 400-task stage for an 858-edge CC iteration). Runtime conf,
        # so it applies to a provided session. AQE coalesce only merges
        # DOWNWARD from the initial partition number, so 32 alone would
        # cap shuffle parallelism for any larger run through this entry
        # point — keep the default 200 as the AQE ceiling and let it
        # coalesce down to the data (initialPartitionNum is what AQE
        # actually starts from when set).
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        spark.conf.set(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum", "200"
        )
    except Exception:
        pass
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # immutable on some sessions; fixtures then rely on the footer sniff
    try:
        # micros fixtures must read as TIMESTAMP (not NTZ) for watermarks
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except Exception:
        pass  # fixtures.load_table casts any ntz column back to timestamp
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: single-pass priority WIP
    (scan -> filter -> join -> grouped aggregate with conditional count)."""
    _configure(spark)
    return registry.queries()["priority_wip"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            # SEQUENCING ASSUMPTION (driver contract): the driver
            # strictly interleaves build -> execute -> build -> ...,
            # so by the time it builds query N+1, query N's terminal
            # action has run and its pinned self-join intermediates are
            # safe to release here. A driver that built several
            # DataFrames before acting on any would still get CORRECT
            # results (pins are a perf cache, plans recompute), but the
            # earlier queries would recompute their pinned stages and
            # the final query's pins would only be freed by session
            # teardown. Same hygiene as bench.py, which releases after
            # each timed action.
            from dagster_etl_spark.plans.cache import release_pinned

            release_pinned()
            return fn(_configure(spark), sf_dir)

        run.__doc__ = fn.__doc__
        return run

    return {name: wrap(fn) for name, fn in registry.queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return registry.oracle_sql()
