"""Phase/job breakdown of the streaming+incremental ingest queries
(r18 verdict task 4): wraps the slice-store and index entry points with
timers and a Spark job counter, runs one registered query, and prints
where the seconds and the micro-jobs go.

Usage: python tools/probe_ingest_r19.py [query] [sf_dir]
"""

from __future__ import annotations

import sys
import time
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

QUERY = sys.argv[1] if len(sys.argv) > 1 else "streaming_neardup_ingest"
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

PHASES: dict[str, list[float]] = defaultdict(list)


def wrap(obj, name: str, label: str, by_component: bool = False) -> None:
    fn = getattr(obj, name)

    def timed(*a, **kw):
        t0 = time.time()
        try:
            return fn(*a, **kw)
        finally:
            lab = label
            if by_component:
                comp = a[1] if len(a) > 1 else kw.get("component", "?")
                lab = f"{label}[{comp}]"
            PHASES[lab].append(time.time() - t0)

    setattr(obj, name, timed)


def main() -> None:
    from dagster_etl_spark.registry import all_queries
    from dagster_etl_spark.session import get_spark
    from dagster_etl_spark.streaming import slicestore
    import dagster_etl_spark.operators.dedup as dedup
    import dagster_etl_spark.streaming.bm25_ingest  # noqa: F401

    spark = get_spark("probe-ingest", shuffle_partitions=16)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    wrap(slicestore.SliceStore, "write", "slice.write", by_component=True)
    wrap(slicestore.SliceStore, "commit", "slice.commit")
    wrap(slicestore.SliceStore, "read", "slice.read")
    wrap(slicestore.SliceStore, "read_slice", "slice.read_slice")
    wrap(dedup.IncrementalNearDupIndex, "_encode", "nd.encode(build)")
    wrap(dedup.IncrementalNearDupIndex, "ingest_slice", "nd.ingest_slice")
    wrap(dedup.IncrementalNearDupIndex, "ingest", "nd.ingest")
    wrap(dedup.IncrementalNearDupIndex, "compact_slices", "nd.compact_slices")
    wrap(dedup.IncrementalNearDupIndex, "_probe_pairs", "nd.probe(build)")

    sc = spark.sparkContext

    def n_jobs() -> int:
        t = sc.statusTracker()
        ids = t.getJobIdsForGroup(None) or []
        # statusTracker only exposes per-group ids; fall back to the
        # max job id via the app status store
        return len(ids)

    jvm_store = spark._jsc.sc().statusStore()
    j0 = jvm_store.jobsList(None).size()
    t0 = time.time()
    specs = all_queries()
    df = specs[QUERY].fn(spark, SF_DIR)
    t_build = time.time() - t0
    t1 = time.time()
    df.write.mode("overwrite").format("noop").save()
    t_exec = time.time() - t1
    j1 = jvm_store.jobsList(None).size()

    print(f"\n== {QUERY} @ {SF_DIR}")
    print(f"build (runs the stream/ingest): {t_build:.2f}s  exec(noop): {t_exec:.2f}s")
    print(f"spark jobs during query: {j1 - j0}")
    for label, ts in sorted(PHASES.items(), key=lambda kv: -sum(kv[1])):
        print(
            f"  {label:22s} n={len(ts):3d} total={sum(ts):6.2f}s "
            f"mean={sum(ts)/len(ts):.3f}s"
        )
    spark.stop()


if __name__ == "__main__":
    main()
