"""Measure the single-process baseline (DuckDB running each bench
query's oracle SQL) at a given scale factor — the reference publishes
no numbers (BASELINE.md), so this measured baseline is the comparison
point for BENCH_r{N}.json.

Usage: python tools/measure_baseline.py [sf_dir]
Prints one JSON line mirroring bench.py's shape.
"""

from __future__ import annotations

import json
import re
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

    def timed(sql: str) -> float:
        t0 = time.time()
        con.execute(sql).fetchall()
        return round(time.time() - t0, 3)

    out: dict[str, float] = {}
    extra: dict[str, float] = {}
    total = 0.0
    for name, spec in specs.items():
        if "bench" not in spec.tags:
            continue
        sql = spec.oracle
        if sql is None and name.endswith("_approx"):
            base = name.removesuffix("_approx")
            exact_sql = specs[base].oracle if base in specs else None
            if exact_sql is None:
                continue
            # like-for-like pairing: the Spark bench row runs
            # approx_count_distinct, so the DuckDB row must too
            # (DuckDB has the same HLL aggregate). The exact twin is
            # still timed below under `extra` (same keys bench.py
            # emits), so the exact-vs-exact pairing stays reportable.
            sql, n_subs = re.subn(
                r"COUNT\(\s*DISTINCT\s+([^)]+)\)",
                r"approx_count_distinct(\1)",
                exact_sql,
                flags=re.IGNORECASE,
            )
            # [^)]+ truncates at the first ')' — fine for bare-column
            # oracles, silently corrupting for nested-paren args like
            # COUNT(DISTINCT round(x)). Fail loudly rather than time a
            # mangled query.
            n_distinct = len(re.findall(r"\bDISTINCT\b", exact_sql, re.IGNORECASE))
            if n_subs != n_distinct:
                raise ValueError(
                    f"{base}: rewrote {n_subs} COUNT(DISTINCT ...) but the "
                    f"oracle contains {n_distinct} DISTINCTs — nested parens? "
                    "Extend the rewrite before trusting this pairing."
                )
            if n_subs == 0:  # nothing to approximate -> exact is the pair
                sql = exact_sql
            extra[base + "_exact"] = timed(exact_sql)
        if sql is None:
            continue
        dt = timed(sql)
        out[name] = dt
        total += dt
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "baseline_duckdb_total_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": out,
        "extra": extra,
        "sf": float(sf),
    }))


if __name__ == "__main__":
    main()
