"""Decompose each bench query's wall time into (a) DataFrame build time
(Python expression-tree construction + analysis) and (b) noop execution
time, so optimization targets the real component. Guide §1: measure
first; the noop sink isolates computation from the sink.

Usage: python tools/profile_bench.py [sf_dir] [name ...]
Prints one JSON line per query: {"name", "build_sec", "exec_best",
"exec_samples", "n_exchanges"}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ONLY = set(sys.argv[2:])


def main() -> None:
    from dagster_etl_spark.plans.cache import release_pinned
    from dagster_etl_spark.registry import all_queries
    from dagster_etl_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("profile", shuffle_partitions=min(cpus, 16))
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    specs = all_queries()
    names = [n for n, s in specs.items() if "bench" in s.tags]
    if ONLY:
        names = [n for n in names if n in ONLY]

    # fixed job floor: trivial one-row noop write, warm
    for _ in range(2):
        spark.range(1).write.mode("overwrite").format("noop").save()
    t0 = time.time()
    spark.range(1).write.mode("overwrite").format("noop").save()
    floor = time.time() - t0
    print(json.dumps({"name": "__floor__", "exec_best": round(floor, 3)}))

    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        # build (Python + analysis happens lazily; force analysis via schema)
        t0 = time.time()
        df = specs[name].fn(spark, SF_DIR)
        _ = df.schema
        build = time.time() - t0
        plan = df._jdf.queryExecution().executedPlan().toString()
        n_ex = plan.count("Exchange")
        # warm-up + best-of-2, fresh build each run like bench.py
        try:
            df.write.mode("overwrite").format("noop").save()
            release_pinned()
            samples = []
            for _ in range(2):
                t0 = time.time()
                specs[name].fn(spark, SF_DIR).write.mode("overwrite").format(
                    "noop"
                ).save()
                samples.append(round(time.time() - t0, 3))
                release_pinned()
            # rebuild-free execution: reuse the first DataFrame object
            exec_only = []
            for _ in range(2):
                t0 = time.time()
                df.write.mode("overwrite").format("noop").save()
                exec_only.append(round(time.time() - t0, 3))
                release_pinned()
            print(
                json.dumps(
                    {
                        "name": name,
                        "build_sec": round(build, 3),
                        "full_best": min(samples),
                        "full_samples": samples,
                        "reexec_best": min(exec_only),
                        "reexec_samples": exec_only,
                        "n_exchanges": n_ex,
                    }
                )
            )
        except Exception as exc:
            print(json.dumps({"name": name, "err": str(exc)[:200]}))
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
