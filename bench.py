"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Work is materialized via the `noop` data source (full execution, no
driver collect) so timings measure the distributed plan, not toPandas.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def sf_of(path: str) -> float:
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    from dagster_etl_spark.registry import all_queries
    from dagster_etl_spark.session import get_spark

    # size the shuffle to the data, not the box: sf0.1 is ~600k rows, so
    # 16 post-shuffle partitions keep tasks >= a few MB each (SURVEY §4:
    # partition sizing is a data-volume knob; 32+ partitions at this
    # scale just pays task-scheduling overhead). Executor threads still
    # come from SPARK_GRAFT_CPUS.
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench", shuffle_partitions=min(cpus, 16))
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    specs = all_queries()
    bench_names = [n for n, s in specs.items() if "bench" in s.tags] or list(specs)
    # PINNED timed order (r18 verdict task 2): the registry fronts a
    # rotating 50-query correctness window, so registration order
    # changes every round — in r18 that silently reordered the timed
    # sequence and redistributed the cold-JVM ramp onto different
    # queries, manufacturing per-query "regressions" with zero code
    # change. Sorting pins the sequence forever: rotation can never
    # again move a query's run position.
    bench_names = sorted(bench_names)

    from dagster_etl_spark.plans.cache import release_pinned

    def run_one(name: str) -> None:
        specs[name].fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()

    # warm-up pass: execute every bench query once untimed. DuckDB's
    # baseline numbers in BASELINE.md are warm (best-of runs on a live
    # process); timing Spark cold instead charges ~4s of one-time JVM
    # JIT + codegen compilation to whichever query runs first. Warm
    # numbers measure the plans, which is what the gate compares.
    for name in bench_names:
        try:
            run_one(name)
        except Exception as exc:  # surface, but let the timed pass report it
            print(f"bench warm-up error in {name}: {exc}", file=sys.stderr)
        release_pinned()

    # best-of-3 timed runs (r18 verdict task 2 — was best-of-2 through
    # r18): the DuckDB baseline numbers are warm best-of-runs on a live
    # process (BASELINE.md), and this box's background load can steal a
    # core mid-sample — min over samples measures the plan's steady
    # state the same way, and the third sample plus the recorded
    # per-query spread and 1-min loadavg make a steal window READABLE
    # in the artifact (spread/load high -> drift, not regression)
    # instead of indistinguishable from a plan change.
    timings: dict[str, float] = {}
    spread: dict[str, float] = {}
    load1: dict[str, float] = {}
    for name in bench_names:
        samples: list[float] = []
        load1[name] = round(os.getloadavg()[0], 2)
        try:
            for _ in range(3):
                t0 = time.time()
                run_one(name)
                samples.append(time.time() - t0)
                release_pinned()
            timings[name] = round(min(samples), 3)
            spread[name] = round(max(samples) - min(samples), 3)
        except Exception as exc:  # never break the bench line
            print(f"bench error in {name}: {exc}", file=sys.stderr)
            timings[name] = -1.0
            release_pinned()

    # informational extras — NOT in the headline total (BASELINE.md's
    # DuckDB totals cover exactly the `queries` set). Since round 8 the
    # headline times the approx-distinct WIP queries (the contractual
    # scale path; scale_trend r8 showed exact plateauing ~5x a single
    # process); the exact hash-verified forms stay visible here for
    # round-over-round comparability.
    # extras get the SAME defense as every quoted number (r10 verdict
    # task 6): best-of-2 plus the sample spread, so a future drift
    # spike on this +/-30% host reads as drift, not a regression (the
    # r7 false alarm). audit_spreads.py flags extra_spread > extra.
    extra: dict[str, float] = {}
    extra_spread: dict[str, float] = {}
    for name in ("wip_aggregate", "priority_wip"):
        try:
            run_one(name)  # warm
            release_pinned()
            samples = []
            for _ in range(3):
                t0 = time.time()
                run_one(name)
                samples.append(time.time() - t0)
                release_pinned()
            extra[name + "_exact"] = round(min(samples), 3)
            extra_spread[name + "_exact"] = round(max(samples) - min(samples), 3)
        except Exception as exc:
            print(f"bench extra error in {name}: {exc}", file=sys.stderr)

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "bench_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                # self-defense context (r18 verdict task 2, additions
                # only): per-query best-vs-worst sample spread and the
                # 1-min loadavg read immediately before each query's
                # samples. A "regression" whose spread/load context is
                # elevated is host steal, not a plan change (r18's
                # geomean-0.68 window was exactly this, adjudicated
                # from BENCH_r18_c8 + extra_spread).
                "spread": spread,
                "load1": load1,
                # timed order is sorted(bench_names), pinned since r19
                # so registry rotation can never reorder the sequence
                "order": "sorted",
                "extra": extra,
                "extra_spread": extra_spread,
                "sf": sf_of(SF_DIR),
                # sampling mode, for round-over-round comparability:
                # r1-r3 single warm samples, r4-r18 best-of-2, r19+
                # best-of-3
                "samples": 3,
                # context for scaling comparisons: every fixture table
                # is a single-row-group parquet file, so each scan is
                # ONE task regardless of core count (r18 verdict §3) —
                # sf0.1 numbers measure a fixed driver+scan floor, not
                # parallel execution
                "note": "single-row-group fixture: one task per scan",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
