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

    # best-of-2 timed runs: the DuckDB baseline numbers are warm
    # best-of-runs on a live process (BASELINE.md), and this box's
    # background load can steal a core mid-sample — min over two
    # samples measures the plan's steady state the same way.
    timings: dict[str, float] = {}
    for name in bench_names:
        best = -1.0
        try:
            for _ in range(2):
                t0 = time.time()
                run_one(name)
                sample = time.time() - t0
                best = sample if best < 0 else min(best, sample)
                release_pinned()
            timings[name] = round(best, 3)
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
            for _ in range(2):
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
                "extra": extra,
                "extra_spread": extra_spread,
                "sf": sf_of(SF_DIR),
                # sampling mode, for round-over-round comparability:
                # r1-r3 were single warm samples, r4+ best-of-2
                "samples": 2,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
