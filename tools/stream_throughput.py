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

r12 adds the STATE-SIZE axis (r11 verdict task 5): the stateful path's
state is per-user and grows with users, so each stateful run now
records the state operator's numRowsTotal / memoryUsedBytes from the
query's final progress. The ceiling demonstration is the new
"eviction" section: the TIMEOUT sessionizer (event-time watermark,
state.remove() on expiry) over a long time-ordered horizon — events
split into 8 ts-ordered files, one micro-batch each, so the watermark
advances monotonically and expired sessions actually LEAVE state.
Reported per batch: numRowsTotal / numRowsRemoved / memoryUsedBytes;
asserted: rows are actually removed and the final state is a fraction
of total users (bounded by OPEN sessions, not by history). The
NoTimeout sessionizer's state == distinct users is the unbounded
contrast, visible in the same artifact.

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

    def _state_metrics(q) -> dict | None:
        """(rows, bytes) of the state operator at the final progress,
        None for stateless plans."""
        prog = q.lastProgress
        ops = (prog or {}).get("stateOperators") or []
        if not ops:
            return None
        return {
            "rows_total": ops[0].get("numRowsTotal"),
            "memory_bytes": ops[0].get("memoryUsedBytes"),
        }

    def run_to_completion(result, mode: str) -> tuple[float, dict | None]:
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
        state = _state_metrics(q)
        spark.catalog.dropTempView(name)
        return dt, state

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
            runs = [run_to_completion(build(path)[0], mode) for _ in range(RUNS)]
            best = min(dt for dt, _ in runs)
            state = next((s for _, s in runs if s), None)
            scale[qname] = {
                "sec": round(best, 3),
                "events_per_sec": round(n_rows / best),
                "micro_batches": -(-FILES // FILES_PER_TRIGGER),
                "state": state,
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

    # ---- eviction axis: watermark-driven state ceiling (r12) ----
    from dagster_etl_spark.streaming.stateful import sessionize_with_timeout

    N_HORIZON_FILES = 8

    def measure_eviction(k: int) -> dict:
        """Long time-ordered horizon through the TIMEOUT sessionizer:
        8 ts-ordered files, one micro-batch each, watermark advancing
        monotonically — expired sessions must actually LEAVE state
        (state.remove() on event-time timeout), so state tracks OPEN
        sessions, not users-ever-seen.

        The fixture's users are active across the WHOLE horizon (no
        churn), which can't distinguish eviction from one-session-per-
        user steady state; real crawls churn. Churn is synthesized
        deterministically: user u's lifetime is octiles [u%8, u%8+2]
        of the ts range — each batch retires one cohort (times out,
        leaves state) and admits another, so peak state is ~3 cohorts
        and final state is the still-alive tail, both FRACTIONS of
        users-ever-seen."""
        work = tempfile.mkdtemp(prefix="stream_eviction_")
        in_dir = f"{work}/events"
        ev = spark.read.parquet(paths[k]).filter("ts IS NOT NULL")
        n_users = ev.select("user_id").distinct().count()
        fracs = [i / N_HORIZON_FILES for i in range(1, N_HORIZON_FILES)]
        bounds = ev.selectExpr(
            f"percentile_approx(ts, array({', '.join(map(str, fracs))})) AS b"
        ).first().b
        lo = None
        for i in range(N_HORIZON_FILES):
            hi = bounds[i] if i < len(bounds) else None
            cohort = F.pmod(F.col("user_id"), F.lit(N_HORIZON_FILES))
            sl = ev.filter((cohort <= i) & (cohort >= i - 2))
            if lo is not None:
                sl = sl.filter(F.col("ts") > lo)
            if hi is not None:
                sl = sl.filter(F.col("ts") <= hi)
            sl.coalesce(1).write.mode("append").parquet(in_dir)
            time.sleep(1.05)  # distinct mtimes: file source processes in time order
            lo = hi
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = (
            sessionize_with_timeout(stream, watermark="30 minutes")
            .writeStream.format("noop")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        series = []
        for p in q.recentProgress:
            ops = p.get("stateOperators") or []
            if ops:
                series.append(
                    {
                        "rows_total": ops[0].get("numRowsTotal"),
                        "rows_removed": ops[0].get("numRowsRemoved"),
                        "memory_bytes": ops[0].get("memoryUsedBytes"),
                    }
                )
        shutil.rmtree(work, ignore_errors=True)
        removed = sum(s["rows_removed"] or 0 for s in series)
        peak = max(s["rows_total"] for s in series)
        final = series[-1]["rows_total"]
        # the ceiling claims, asserted: (a) eviction actually happens;
        # (b) standing state never approaches users-ever-seen — with
        # 3-octile lifetimes, at most ~4 cohorts can be in state at
        # once (3 alive + 1 awaiting its timeout batch); (c) the final
        # state is the still-alive tail, not accumulated history.
        assert removed > 0, "watermark never evicted any session state"
        ceiling = n_users * 5 / N_HORIZON_FILES
        assert peak <= ceiling, (
            f"peak state {peak} above the churn ceiling {ceiling:.0f} "
            f"({n_users} users ever seen): eviction is not keeping up"
        )
        assert final <= ceiling, f"final state {final} above {ceiling:.0f}"
        return {
            "distinct_users": n_users,
            "horizon_files": N_HORIZON_FILES,
            "per_batch_state": series,
            "peak_state_rows": peak,
            "final_state_rows": final,
            "rows_removed_total": removed,
            "unbounded_counterfactual_rows": removed + final,
        }

    eviction = {f"x{k}": measure_eviction(k) for k in MULTS}

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
                "eviction": eviction,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
