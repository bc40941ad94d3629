"""LIVE JDBC round-trip for SURVEY §2 S1-S3 — Spark reading a real
database over JDBC (DuckDB file + the public org.duckdb:duckdb_jdbc
driver jar), closing the only correctness gap the unit tests left.

Runs in a subprocess because ``spark.jars`` must be set at session
creation and the suite's shared session can't be restarted. Skips
cleanly when no driver jar is present on the machine.
"""

from __future__ import annotations

import json
import subprocess
import sys
import textwrap
from pathlib import Path

import duckdb
import pytest

from dagster_etl_spark.sources.jdbc import find_duckdb_jdbc_jar

REPO = Path(__file__).resolve().parents[1]


def test_jdbc_live_roundtrip(tmp_path):
    jar = find_duckdb_jdbc_jar()
    if jar is None:
        pytest.skip("no duckdb_jdbc jar on this machine (see COVERAGE.md S1-S3)")

    db = str(tmp_path / "src.duckdb")
    con = duckdb.connect(db)
    con.execute(
        """
        CREATE TABLE lot_history AS
        SELECT i AS id,
               'lot_' || CAST(i % 7 AS VARCHAR) AS lot_id,
               TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (i % 72) HOUR AS updated_at,
               CAST(i AS DOUBLE) / 4 AS qty
        FROM range(0, 500) t(i)
        """
    )
    con.close()

    script = textwrap.dedent(
        f"""
        import json, sys
        sys.path.insert(0, {str(REPO)!r})
        from pyspark.sql import SparkSession
        from dagster_etl_spark.sources.jdbc import (
            JdbcSource, read_table, table_row_count, with_partition_filter,
        )

        spark = (
            SparkSession.builder.master("local[2]")
            .config("spark.jars", {jar!r})
            .config("spark.ui.enabled", "false")
            .config("spark.sql.shuffle.partitions", "4")
            .getOrCreate()
        )
        src = JdbcSource(
            url="jdbc:duckdb:" + {db!r}, user="", password="",
            driver="org.duckdb.DuckDBDriver",
        )
        # S1 full scan + S2 composed partition filter + S3 count
        full = read_table(spark, src, "lot_history")
        day1 = with_partition_filter(full, "updated_at", "2024-01-02")
        # parallel range-sliced read (the multi-executor fan-out knob)
        sliced = read_table(
            spark, src, "lot_history",
            partition_column="id", num_partitions=4, bounds=(0, 500),
        )
        print("RESULT " + json.dumps({{
            "n_full": full.count(),
            "n_day1": day1.count(),
            "n_sliced": sliced.count(),
            "n_sliced_parts": sliced.rdd.getNumPartitions(),
            "row_count": table_row_count(spark, src, "lot_history"),
            "cols": sorted(full.columns),
        }}))
        spark.stop()
        """
    )
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=300
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT ")][-1]
    got = json.loads(line[len("RESULT "):])
    assert got["n_full"] == 500
    assert got["row_count"] == 500
    # hours 24..47 of the 72-hour cycle fall on 2024-01-02: 6 full
    # cycles (24 matches each) + remainder ids 432..499 covering hours
    # 0..67, of which 24..47 all land (24 more)
    assert got["n_day1"] == 6 * 24 + 24
    assert got["n_sliced"] == 500 and got["n_sliced_parts"] == 4
    assert got["cols"] == ["id", "lot_id", "qty", "updated_at"]
