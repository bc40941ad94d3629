"""Per-query floor decomposition for the bench queries that sit above
2x the single-process DuckDB baseline (BASELINE.md gate analysis).

For each query this measures, on the same warm session and scale
factor:

* ``floor``  — a no-op pass over the SAME input tables shaped like the
  query's skeleton (scan -> cheap filter -> one-shuffle groupBy), i.e.
  the constant scheduling/shuffle-barrier price any Spark plan pays on
  this box regardless of the work inside;
* ``query``  — the registered query itself (noop sink);
* ``compute`` — the part that scales with data and is the honest
  comparison against a single-process engine (which pays neither task
  scheduling nor shuffle serialization).

Methodology (round 6, replacing the separately-measured min-of-3 that
the r5 verdict flagged): floor and query are sampled INTERLEAVED in
the same session — F,Q,F,Q,... for ``RUNS`` pairs after a warm-up of
each — so host drift hits both sides of the subtraction equally.
``compute_sec`` is the MEDIAN of the per-pair differences (drift
cancels within a pair), and every entry carries an uncertainty bound
(``compute_spread_sec`` = max-min of the pair differences). A floor
that exceeds its query beyond that bound is reported as INVALID
(``compute_sec`` still carries the signed value — no clamping to 0)
and the tool exits nonzero listing the affected queries.

Usage: python tools/floor_decompose.py [sf_dir] [query ...]
Prints one JSON line; paste the table into BASELINE.md.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
QUERIES = sys.argv[2:]  # default: every bench-tagged query
RUNS = 5


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


def _paired(build_floor, build_query, runs: int = RUNS):
    """Interleaved paired sampling: one floor run immediately followed
    by one query run, ``runs`` times, after warming both. Returns the
    two sample lists."""
    _noop(build_floor())  # warm: plan + code-gen + page cache
    _noop(build_query())
    floors: list[float] = []
    queries: list[float] = []
    for _ in range(runs):
        t0 = time.perf_counter()
        _noop(build_floor())
        floors.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _noop(build_query())
        queries.append(time.perf_counter() - t0)
    return floors, queries


def main() -> int:
    from dagster_etl_spark import registry
    from dagster_etl_spark.session import get_spark
    from dagster_etl_spark.sources.fixtures import load_table

    spark = get_spark()
    qs = registry.queries()
    names = QUERIES or [
        n for n, e in registry.all_queries().items() if "bench" in e.tags
    ]
    out = {}
    invalid: list[str] = []
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

        floors, queries = _paired(floor_skeleton, lambda: qs[name](spark, SF_DIR))
        diffs = [q - f for f, q in zip(floors, queries)]
        compute = statistics.median(diffs)
        spread = max(diffs) - min(diffs)
        entry = {
            "floor_sec": round(min(floors), 3),
            "query_sec": round(min(queries), 3),
            "compute_sec": round(compute, 3),  # signed — never clamped
            "compute_spread_sec": round(spread, 3),
            "pairs": RUNS,
        }
        if compute < 0 and -compute > spread:
            # the floor consistently exceeds the query beyond measured
            # noise: the skeleton is not a lower bound for this plan —
            # the decomposition is invalid, say so loudly
            entry["invalid"] = True
            invalid.append(name)
            print(
                f"floor_decompose: INVALID decomposition for {name}: "
                f"floor exceeds query by {-compute:.3f}s "
                f"(> spread {spread:.3f}s)",
                file=sys.stderr,
            )
        out[name] = entry
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "runs": RUNS,
                "methodology": "paired-interleaved median-of-diffs",
                "invalid": invalid,
                "queries": out,
            }
        )
    )
    return 1 if invalid else 0


if __name__ == "__main__":
    sys.exit(main())
