"""Streaming throughput evidence (r9): the one axis with correctness
coverage but no perf data. Times the two stateful-path streaming
operators end-to-end (availableNow file stream -> memory sink) at 1x
and Kx inflated events and reports events/sec plus the scaling factor.

Queries:
  windowed  — tumbling-window per-type stats with a watermark
              (built-in streaming aggregation; state bounded by the
              watermark, shuffle = sketch-sized partials).
  stateful  — per-user sessionization via applyInPandasWithState
              (Arrow-batched custom state; the template for operators
              Spark's built-ins can't express).

Method: events inflated with shifted user/event ids (more users, same
per-user density — the realistic growth axis), written once per scale
as 16 parquet files; each stream runs with maxFilesPerTrigger=4 so the
run exercises real micro-batch state handoff (4 batches), not one
degenerate batch. Wall time is availableNow start->awaitTermination,
best of RUNS.

r10 adds the RECOVERY axis — the operational number a 100 TB pipeline
plans around: the stateful sessionizer processes the first (by ts)
half of the corpus to a checkpoint and stops; the second half lands
while the query is "down"; the restarted query's wall time =
checkpoint/state restore + backlog drain. Reported as recovery_sec
plus catch-up rate, next to the steady-state rate of the SAME first
run for comparison (same session, same files, interleaving not needed
because both numbers come from one sequence).

r11 runs the recovery protocol at EVERY multiplier (not just the
largest): restore cost is state-size-dependent — per-user session
state grows with users on the inflate axis — so the planning number
needs a trend, not a point ("recovery" in the output is keyed by
scale).

Usage: python tools/stream_throughput.py [sf_dir] [mult ...]
Defaults: /root/testdata/sf0.1, mults 10 50. Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
MULTS = [int(a) for a in sys.argv[2:]] or [10, 50]
RUNS = 3
FILES = 16
FILES_PER_TRIGGER = 4


def main() -> None:
    from dagster_etl_spark.session import get_spark
    from dagster_etl_spark.scratch import scratch_dir
    from dagster_etl_spark.sources.fixtures import load_table
    from dagster_etl_spark.streaming.stateful import sessionize_stateful
    from dagster_etl_spark.streaming.windowed import windowed_event_stats
    from tools.scale_smoke import inflate_events

    spark = get_spark("stream-throughput")

    def materialize(k: int) -> tuple[str, int]:
        ev = load_table(spark, SF_DIR, "events").select(
            "event_id", "user_id", "ts", "event_type", "value"
        )
        if k > 1:
            ev = inflate_events(ev, k)
        out = scratch_dir(f"stream_tp_x{k}")
        ev.repartition(FILES).write.mode("overwrite").parquet(f"{out}/events")
        n = spark.read.parquet(f"{out}/events").count()
        return f"{out}/events", n

    def stream_of(path: str):
        schema = spark.read.parquet(path).schema
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", FILES_PER_TRIGGER)
            .parquet(path)
        )

    def run_to_completion(result, mode: str) -> float:
        name = f"tp_{int(time.monotonic() * 1e6)}"
        t0 = time.perf_counter()
        q = (
            result.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        dt = time.perf_counter() - t0
        spark.catalog.dropTempView(name)
        return dt

    queries = {
        "windowed": lambda path: (
            windowed_event_stats(stream_of(path)),
            "complete",
        ),
        "stateful": lambda path: (sessionize_stateful(stream_of(path)), "update"),
    }

    out: dict[str, dict] = {}
    paths: dict[int, str] = {}
    for k in sorted({1, *MULTS}):
        path, n_rows = materialize(k)
        paths[k] = path
        scale: dict[str, dict] = {"events": n_rows}
        for qname, build in queries.items():
            df, mode = build(path)
            run_to_completion(df, mode)  # warm: codegen + state store init
            best = min(
                run_to_completion(build(path)[0], mode) for _ in range(RUNS)
            )
            scale[qname] = {
                "sec": round(best, 3),
                "events_per_sec": round(n_rows / best),
                "micro_batches": -(-FILES // FILES_PER_TRIGGER),
            }
        out[f"x{k}"] = scale

    # ---- recovery axis: stop -> backlog -> restart, per multiplier ----
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    def measure_recovery(k: int) -> dict:
        work = tempfile.mkdtemp(prefix="stream_recovery_")
        in_dir = f"{work}/events"
        ckpt = f"{work}/ckpt"
        # reuse the already-materialized k-scale events (scratch_dir
        # EMPTIES on re-call — never re-derive the path through it)
        ev = spark.read.parquet(paths[k])
        cutoff = ev.selectExpr("percentile_approx(ts, 0.5) AS c").first().c
        first = ev.filter(F.col("ts") <= cutoff)
        second = ev.filter(F.col("ts") > cutoff)
        n1, n2 = first.count(), second.count()
        first.repartition(FILES).write.mode("overwrite").parquet(in_dir)

        def run_ckpt(location: str) -> float:
            stream = (
                spark.readStream.schema(ev.schema)
                .option("maxFilesPerTrigger", FILES_PER_TRIGGER)
                .parquet(in_dir)
            )
            t0 = time.perf_counter()
            q = (
                sessionize_stateful(stream)
                .writeStream.format("noop")
                .outputMode("update")
                .option("checkpointLocation", location)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            return time.perf_counter() - t0

        # warm pass on a throwaway checkpoint: the steady baseline must
        # not carry one-time JIT/state-store-init cost the recovery run
        # won't pay, or restore_overhead reads negative (r11: the first
        # protocol version did exactly that, -3.4s at x10)
        run_ckpt(f"{work}/ckpt_warm")
        shutil.rmtree(f"{work}/ckpt_warm", ignore_errors=True)
        steady_sec = run_ckpt(ckpt)  # first half -> checkpoint, then STOP
        # the backlog lands while the query is down
        second.repartition(FILES).write.mode("append").parquet(in_dir)
        recovery_sec = run_ckpt(ckpt)  # restore state + drain the backlog
        shutil.rmtree(work, ignore_errors=True)
        return {
            "query": "stateful",
            "first_half_events": n1,
            "backlog_events": n2,
            "steady_sec": round(steady_sec, 3),
            "steady_events_per_sec": round(n1 / steady_sec),
            "recovery_sec": round(recovery_sec, 3),
            "catchup_events_per_sec": round(n2 / recovery_sec),
            "restore_overhead_sec": round(
                recovery_sec - n2 * steady_sec / max(n1, 1), 3
            ),
        }

    recovery = {f"x{k}": measure_recovery(k) for k in MULTS}

    summary = {}
    for k in MULTS:
        if k <= 1:
            continue
        for qname in queries:
            t1, tk = out["x1"][qname]["sec"], out[f"x{k}"][qname]["sec"]
            summary.setdefault(qname, {})[f"x{k}"] = {
                "time_ratio": round(tk / t1, 2),
                "data_ratio": k,
                "sublinear": tk / t1 < k,
            }
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "multipliers": MULTS,
                "runs": RUNS,
                "files": FILES,
                "files_per_trigger": FILES_PER_TRIGGER,
                "scales": out,
                "scaling": summary,
                "recovery": recovery,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
