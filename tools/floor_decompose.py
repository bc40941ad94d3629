"""Per-query floor decomposition for the bench queries that sit above
2x the single-process DuckDB baseline (BASELINE.md gate analysis).

For each query this measures, on the same warm session and scale
factor, min-of-N wall clock for:

* ``floor``  — a no-op pass over the SAME input tables shaped like the
  query's skeleton (scan -> cheap filter -> one-shuffle groupBy), i.e.
  the constant scheduling/shuffle-barrier price any Spark plan pays on
  this box regardless of the work inside;
* ``query``  — the registered query itself (noop sink);
* ``compute`` = query - floor — the part that scales with data and is
  the honest comparison against a single-process engine (which pays
  neither task scheduling nor shuffle serialization).

Usage: python tools/floor_decompose.py [sf_dir] [query ...]
Prints one JSON line; paste the table into BASELINE.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
QUERIES = sys.argv[2:]  # default: every bench-tagged query
RUNS = 3


def _scanned_tables(df) -> tuple[str, ...]:
    """Input tables, read off the query's own physical plan (the
    FileScan Location lines name the parquet paths)."""
    import re

    txt = df._jdf.queryExecution().executedPlan().toString()
    names = re.findall(r"/([a-z0-9_]+)\.parquet", txt)
    seen: list[str] = []
    for n in names:
        if n not in seen:
            seen.append(n)
    if not seen:
        print("floor_decompose: no parquet scans found; defaulting to lineitem",
              file=sys.stderr)
        return ("lineitem",)
    return tuple(seen)


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed(build, runs: int = RUNS) -> float:
    _noop(build())  # warm: plan + code-gen + page cache
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        _noop(build())
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    from pyspark.sql import functions as F

    from dagster_etl_spark import registry
    from dagster_etl_spark.session import get_spark
    from dagster_etl_spark.sources.fixtures import load_table

    spark = get_spark()
    qs = registry.queries()
    names = QUERIES or [
        n for n, e in registry.all_queries().items() if "bench" in e.tags
    ]
    out = {}
    for name in names:
        tables = _scanned_tables(qs[name](spark, SF_DIR))

        def floor_skeleton():
            # scan every input the query reads + one shuffle barrier
            dfs = [load_table(spark, SF_DIR, t) for t in tables]
            parts = [
                d.groupBy(d.columns[0]).count().toDF("k", "n").selectExpr(
                    "CAST(k AS STRING) AS k", "n"
                )
                for d in dfs
            ]
            first = parts[0]
            for other in parts[1:]:
                first = first.unionByName(other)
            return first

        floor_s = _timed(floor_skeleton)
        query_s = _timed(lambda: qs[name](spark, SF_DIR))
        out[name] = {
            "floor_sec": floor_s,
            "query_sec": query_s,
            "compute_sec": round(max(0.0, query_s - floor_s), 3),
        }
    print(json.dumps({"sf_dir": SF_DIR, "runs": RUNS, "queries": out}))


if __name__ == "__main__":
    main()
