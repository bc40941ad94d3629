"""Measure the single-process baseline (DuckDB running each bench
query's oracle SQL) at a given scale factor — the reference publishes
no numbers (BASELINE.md), so this measured baseline is the comparison
point for BENCH_r{N}.json.

Usage: python tools/measure_baseline.py [sf_dir]
Prints one JSON line mirroring bench.py's shape.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> None:
    from dagster_etl_spark.registry import all_queries

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    specs = all_queries()
    out, total = {}, 0.0
    for name, spec in specs.items():
        if "bench" not in spec.tags:
            continue
        # *_approx bench queries have no hashable oracle; the single-
        # process comparison point is the EXACT twin's SQL (a user of
        # the single-node engine runs the exact COUNT(DISTINCT))
        sql = spec.oracle or (
            specs[name.removesuffix("_approx")].oracle
            if name.endswith("_approx") and name.removesuffix("_approx") in specs
            else None
        )
        if sql is None:
            continue
        t0 = time.time()
        con.execute(sql).fetchall()
        dt = round(time.time() - t0, 3)
        out[name] = dt
        total += dt
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "baseline_duckdb_total_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": out,
        "sf": float(sf),
    }))


if __name__ == "__main__":
    main()
