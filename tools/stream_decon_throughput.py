"""Throughput rows for streaming_decontaminate (r12 verdict task 4).

STREAMTP_r12 covered the windowed and stateful paths; the stream-static
broadcast 13-gram probe (streaming/decontaminate.py) had correctness
but no rate. Same protocol as stream_throughput.py — availableNow file
stream over 16 parquet files with maxFilesPerTrigger=4 (4 real
micro-batches), memory sink, best of RUNS — on the DOCUMENTS axis
(cipher inflation, the decontaminate workload's growth axis; the
benchmark slice grows with the corpus exactly like the batch query).

The probe is stateless except the contaminated-id dedup, so the
expected profile is the windowed path's: scan-bound, state a function
of output cardinality. The stream-static join re-plans the STATIC side
per micro-batch — that rebuild cost is the per-batch overhead this
records: per_batch rows carry each micro-batch's addBatch/trigger
duration and input rows, so the fixed per-batch floor (broadcast
rebuild + planning) is visible next to the marginal row cost.

Usage: python tools/stream_decon_throughput.py [sf_dir] [mult ...]
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
    from dagster_etl_spark.scratch import scratch_dir
    from dagster_etl_spark.session import get_spark
    from dagster_etl_spark.sources.fixtures import load_table
    from dagster_etl_spark.streaming.decontaminate import contaminated_stream
    from tools.scale_trend_llm import _cipher_docs

    spark = get_spark("stream-decon-throughput")

    def materialize(k: int) -> tuple[str, int]:
        docs = load_table(spark, SF_DIR, "documents")
        n = docs.count()
        if k > 1:
            docs = _cipher_docs(docs, k, n)
        out = scratch_dir(f"stream_decon_x{k}")
        docs.repartition(FILES).write.mode("overwrite").parquet(f"{out}/documents")
        n_rows = spark.read.parquet(f"{out}/documents").count()
        return f"{out}/documents", n_rows

    def run_once(path: str, bench) -> tuple[float, list[dict], int]:
        schema = spark.read.parquet(path).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", FILES_PER_TRIGGER)
            .parquet(path)
        )
        name = f"tp_{int(time.monotonic() * 1e6)}"
        t0 = time.perf_counter()
        q = (
            contaminated_stream(stream, bench)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        dt = time.perf_counter() - t0
        per_batch = [
            {
                "input_rows": p.get("numInputRows"),
                "add_batch_ms": (p.get("durationMs") or {}).get("addBatch"),
                "trigger_ms": (p.get("durationMs") or {}).get(
                    "triggerExecution"
                ),
            }
            for p in q.recentProgress
            if p.get("numInputRows")
        ]
        n_out = spark.table(name).count()
        spark.catalog.dropTempView(name)
        return dt, per_batch, n_out

    out: dict[str, dict] = {}
    for k in sorted({1, *MULTS}):
        path, n_rows = materialize(k)
        bench = spark.read.parquet(path).filter("doc_id % 17 = 0")
        run_once(path, bench)  # warm: codegen + static-side plan
        runs = [run_once(path, bench) for _ in range(RUNS)]
        best, per_batch, n_out = min(runs, key=lambda r: r[0])
        out[f"x{k}"] = {
            "documents": n_rows,
            "sec": round(best, 3),
            "docs_per_sec": round(n_rows / best),
            "contaminated_ids": n_out,
            "micro_batches": -(-FILES // FILES_PER_TRIGGER),
            "per_batch": per_batch,
        }
        print(f"# x{k}: {out[f'x{k}']}", file=sys.stderr)

    summary = {}
    for k in MULTS:
        if k <= 1:
            continue
        t1, tk = out["x1"]["sec"], out[f"x{k}"]["sec"]
        summary[f"x{k}"] = {
            "time_ratio": round(tk / t1, 2),
            "data_ratio": k,
            "sublinear": tk / t1 < k,
        }
    print(
        json.dumps(
            {
                "query": "streaming_decontaminate",
                "sf_dir": SF_DIR,
                "multipliers": MULTS,
                "runs": RUNS,
                "files": FILES,
                "files_per_trigger": FILES_PER_TRIGGER,
                "scales": out,
                "scaling": summary,
                "note": "stateless stream-static broadcast probe + id "
                "dedup; per_batch durations expose the static-side "
                "(benchmark grams) re-plan/broadcast cost each "
                "micro-batch pays on top of marginal row cost.",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
