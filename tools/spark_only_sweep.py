"""Spark-only timing sweep over every registered query (no oracle):
build + noop-execute each query once warm-up-free-of-JVM-cold-start,
then best-of-2 timed (same methodology as bench.py, applied to the
whole registry). Guide §1: measure first, isolate with the noop sink.

Usage: python tools/spark_only_sweep.py [--json OUT] [sf_dir] [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

_argv = sys.argv[1:]
JSON_OUT = None
if _argv and _argv[0] == "--json":
    JSON_OUT = _argv[1]
    _argv = _argv[2:]
SF_DIR = _argv[0] if _argv else "/root/testdata/sf0.1"
ONLY = set(_argv[1:])


def main() -> None:
    from dagster_etl_spark.plans.cache import release_pinned
    from dagster_etl_spark.registry import all_queries
    from dagster_etl_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("sweep", shuffle_partitions=min(cpus, 16))
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    specs = all_queries()
    names = [n for n in specs if not ONLY or n in ONLY]
    out: dict[str, dict] = {}
    with open("/proc/loadavg") as f:
        load0 = float(f.read().split()[0])
    for name in names:
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        rec: dict = {}
        try:
            t0 = time.time()
            specs[name].fn(spark, SF_DIR).write.mode("overwrite").format(
                "noop"
            ).save()
            rec["warm"] = round(time.time() - t0, 3)
            release_pinned()
            samples = []
            for _ in range(2):
                t0 = time.time()
                specs[name].fn(spark, SF_DIR).write.mode("overwrite").format(
                    "noop"
                ).save()
                samples.append(round(time.time() - t0, 3))
                release_pinned()
            rec["best"] = min(samples)
            rec["spread"] = round(max(samples) - min(samples), 3)
        except Exception as exc:
            rec["err"] = str(exc)[:200]
            release_pinned()
        out[name] = rec
        print(name, rec, flush=True)
        spark.sparkContext.setJobDescription(None)
    doc = {"sf_dir": SF_DIR, "loadavg_at_start": load0, "queries": out}
    if JSON_OUT:
        Path(JSON_OUT).write_text(json.dumps(doc, indent=1, sort_keys=True))
    spark.stop()


if __name__ == "__main__":
    main()
