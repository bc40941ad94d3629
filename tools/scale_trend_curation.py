"""Cross-engine scale trend for the COMPOSED curation pipeline (r10).

curation_pipeline_v2 had 1x/10x/50x Spark-only smokes (scale_smoke.py)
but no DuckDB pairing at scale, although its oracle is ALLCHECK-green
at sf0.01 — the r9 verdict asked for the pairing so the composed-plan
claim is measured, not inferred from single-stage trends.

Materialization: K shifted copies of sf0.1 documents (5 000 docs,
1-in-7 copies get an appended token so the inflated corpus has genuine
near-dups), with the SAME salted-source scheme scale_smoke uses so URL
dedup keeps the corpus K-sized instead of collapsing copies — but here
the source column is WRITTEN INTO the parquet so both engines read
identical bytes.

Same protocol as the other trend tools: interleaved D,S pairs, median
per engine, spreads reported. The DuckDB side runs the registered
oracle (shingle/signature CTEs + WITH RECURSIVE component closure);
the Spark side runs the registered query via the noop sink.

Usage: python tools/scale_trend_curation.py [--spark-only] [sf_dir] [mult ...]
Defaults: /root/testdata/sf0.1 and multipliers 10 50.

``--spark-only`` skips the DuckDB legs: beyond x50 the recursive
component closure in the oracle thrashes (290 s spread at x50 —
SCALETREND_CUR_r10.json), so the useful question past that point is
whether SPARK stays sublinear, measured on the same materialization
and median-of-RUNS protocol with the paired x10/x50 points as anchor.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

_argv = sys.argv[1:]
SPARK_ONLY = "--spark-only" in _argv
_argv = [a for a in _argv if a != "--spark-only"]
SF_DIR = _argv[0] if _argv else "/root/testdata/sf0.1"
MULTS = [int(a) for a in _argv[1:]] or [10, 50]
RUNS = 3
QUERY = "curation_pipeline_v2"


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _materialize(spark, k: int) -> str:
    from pyspark.sql import functions as F

    from dagster_etl_spark.scratch import scratch_dir
    from dagster_etl_spark.sources.fixtures import load_table
    from tools.scale_smoke import inflate

    out = scratch_dir(f"scale_trend_cur_x{k}")
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    docsk = inflate(docs, k) if k > 1 else docs
    # per-copy salted source (scale_smoke.curation_v2_salted) so URL
    # dedup keeps the corpus K-sized; written to parquet so the DuckDB
    # oracle sees the identical column
    docsk = docsk.withColumn(
        "source",
        F.concat(
            F.lit("https://h"), (F.col("doc_id") % 1000).cast("string"),
            F.lit("/p"), F.col("doc_id").cast("string"),
        ),
    )
    docsk.repartition(32).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )
    return out


def main() -> None:
    import duckdb

    from dagster_etl_spark import registry
    from dagster_etl_spark.plans.cache import release_pinned
    from dagster_etl_spark.session import get_spark

    spark = get_spark("scale-trend-cur")
    q = registry.queries()[QUERY]
    oracle = registry.all_queries()[QUERY].oracle

    result: dict[str, dict] = {}
    rows = {}
    for k in MULTS:
        data_dir = _materialize(spark, k)
        con = duckdb.connect()
        con.execute(
            "CREATE OR REPLACE VIEW documents AS SELECT * FROM "
            f"read_parquet('{data_dir}/documents.parquet/*.parquet')"
        )
        rows[f"x{k}"] = con.execute(
            "SELECT COUNT(*) FROM documents"
        ).fetchone()[0]

        def build():
            release_pinned()
            return q(spark, data_dir)

        def note(msg: str) -> None:
            print(f"# x{k}: {msg}", file=sys.stderr, flush=True)

        if not SPARK_ONLY:
            t0 = time.perf_counter()
            con.execute(oracle).arrow()  # warm
            note(f"duck warm {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        _noop(build())
        note(f"spark warm {time.perf_counter() - t0:.1f}s")
        ducks: list[float] = []
        sparks: list[float] = []
        for i in range(RUNS):
            if not SPARK_ONLY:
                t0 = time.perf_counter()
                con.execute(oracle).arrow()
                ducks.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            _noop(build())
            sparks.append(time.perf_counter() - t0)
            duck_note = f"duck {ducks[-1]:.1f}s " if ducks else ""
            note(f"pair {i + 1}/{RUNS} {duck_note}spark {sparks[-1]:.1f}s")
        release_pinned()
        s = statistics.median(sparks)
        result[f"x{k}"] = {
            "spark_sec": round(s, 3),
            "spark_spread_sec": round(max(sparks) - min(sparks), 3),
        }
        if ducks:
            d = statistics.median(ducks)
            result[f"x{k}"].update(
                {
                    "duckdb_sec": round(d, 3),
                    "ratio": round(s / d, 2),
                    "duck_spread_sec": round(max(ducks) - min(ducks), 3),
                }
            )
        con.close()
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "multipliers": MULTS,
                "runs": RUNS,
                "spark_only": SPARK_ONLY,
                "documents_rows": rows,
                "methodology": "same parquet both engines (salted "
                "source written to disk); interleaved D,S pairs; "
                "median per engine; oracle via .arrow() vs noop-sink "
                "registered query with release_pinned between builds",
                "queries": {QUERY: result},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
