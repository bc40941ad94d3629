"""Bloom decontamination PRODUCTION-path pairing (r12 verdict task 3).

The registered ``decontaminate_bloom_gate`` runs the bloom AND exact
paths in one plan — the right correctness gate, but its trend row
measures the double computation, so the bloom-only production path
(the actual 100 TB claim) had no number. This pairs, at x10/x50/x100
on the cipher axis (same materialization as scale_trend_llm):

* ``spark_bloom``  — bloom_contaminated_ids (probe + doc-id distinct,
  NO exact twin in the plan): the production path;
* ``spark_exact``  — contaminated_ids (broadcast gram semi-join): the
  exact batch rule the bloom replaces at scale;
* ``duck_exact``   — the decontaminate_vs_benchmark oracle on the same
  parquet: the single-process comparator.

It also RECORDS the broadcast-relation sizes the gate's docstring
claims are an order of magnitude apart: the bloom word table
(word_idx,bits BIGINT pairs = 16 B/row, <= num_bits/64 rows) vs the
distinct benchmark-gram relation the exact semi-join broadcasts
(8 B/row) — measured row counts, not assertions.

Usage: python tools/bloom_path_pairing.py [sf_dir] [mult ...]
Defaults: /root/testdata/sf0.1 and multipliers 10 50 100.
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
MULTS = [int(a) for a in sys.argv[2:]] or [10, 50, 100]
RUNS = 3
NUM_BITS = 4_000_000
BENCH_WHERE = "doc_id % 17 = 0"


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    import duckdb

    from dagster_etl_spark import registry
    from dagster_etl_spark.operators.scrub import (
        _grams,
        _bloom_words,
        bloom_contaminated_ids,
        contaminated_ids,
    )
    from dagster_etl_spark.plans.cache import release_pinned
    from dagster_etl_spark.session import get_spark
    from dagster_etl_spark.sources.fixtures import load_table
    from tools.scale_trend_llm import _materialize

    spark = get_spark("bloom-path-pairing")
    oracle = registry.all_queries()["decontaminate_vs_benchmark"].oracle

    out: dict[str, dict] = {}
    for k in MULTS:
        d = _materialize(spark, k)["cipher"]
        con = duckdb.connect()
        con.execute(
            "CREATE OR REPLACE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet/*.parquet')"
        )
        n_docs = con.execute("SELECT COUNT(*) FROM documents").fetchone()[0]

        docs = load_table(spark, d, "documents")
        bench = docs.filter(BENCH_WHERE)

        # broadcast-relation sizes (the docstring's memory claim)
        bench_grams = _grams(bench, "text", None, 13)
        n_grams = bench_grams.count()
        n_words = _bloom_words(bench_grams, NUM_BITS).count()
        sizes = {
            "bench_distinct_grams": n_grams,
            "exact_broadcast_bytes": n_grams * 8,
            "bloom_word_rows": n_words,
            "bloom_broadcast_bytes": n_words * 16,
            "bytes_ratio_exact_over_bloom": round(
                (n_grams * 8) / max(1, n_words * 16), 2
            ),
        }

        def bloom_build():
            release_pinned()
            return bloom_contaminated_ids(docs, bench, num_bits=NUM_BITS)

        def exact_build():
            release_pinned()
            return contaminated_ids(docs, bench)

        # warm all three paths
        con.execute(oracle).arrow()
        _noop(bloom_build())
        _noop(exact_build())
        ducks, blooms, exacts = [], [], []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            con.execute(oracle).arrow()
            ducks.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            _noop(bloom_build())
            blooms.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            _noop(exact_build())
            exacts.append(time.perf_counter() - t0)
        release_pinned()
        dm, bm, em = (statistics.median(v) for v in (ducks, blooms, exacts))
        out[f"x{k}"] = {
            "documents": n_docs,
            "duck_exact_sec": round(dm, 3),
            "spark_bloom_sec": round(bm, 3),
            "spark_exact_sec": round(em, 3),
            "bloom_ratio_vs_duck": round(bm / dm, 2),
            "exact_ratio_vs_duck": round(em / dm, 2),
            "bloom_over_exact": round(bm / em, 2),
            "duck_spread_sec": round(max(ducks) - min(ducks), 3),
            "bloom_spread_sec": round(max(blooms) - min(blooms), 3),
            "exact_spread_sec": round(max(exacts) - min(exacts), 3),
            "broadcast_sizes": sizes,
        }
        print(
            f"# x{k}: duck {dm:.3f}s bloom {bm:.3f}s exact {em:.3f}s "
            f"bloom/duck {bm / dm:.2f} sizes {sizes}",
            file=sys.stderr,
        )
        con.close()
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "multipliers": MULTS,
                "runs": RUNS,
                "num_bits": NUM_BITS,
                "methodology": "cipher axis (scale_trend_llm._materialize); "
                "interleaved D,bloom,exact triples; median per path; "
                "spark paths via noop sink with release_pinned between "
                "builds; duck runs the registered decontaminate_vs_"
                "benchmark oracle on the same parquet. spark_bloom is "
                "bloom_contaminated_ids ONLY (no exact twin in-plan); "
                "broadcast_sizes are measured row counts of the two "
                "relations each strategy ships to executors.",
                "points": out,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
