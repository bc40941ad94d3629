"""probe_external growth curve: the eval-sweep cost as the standing
index grows (the feature's 100 TB claim — a benchmark sweep should be
O(eval x density), not O(corpus)).

Protocol: 10 daily ingests of 5k cipher-translated docs each (the
scale_trend_llm axis — per-copy translations are textually disjoint,
so the corpus genuinely grows), compact every 3rd day (the cadence
soak's maintenance rhythm). The probe set is FIXED: 100 docs from
each of the 10 copies' translations (ids shifted out of the corpus id
space), so every indexed slice contributes exact dups for the probe to
find — expected hits grow linearly with days ingested while the probe
side stays 1,000 docs. After each ingest, run probe_external twice
(warm pair, keep the better) and record wall time + pairs found.

PASS shape: probe time flat-ish (slow growth from the co-located index
scan) while corpus grows 10x and hits grow ~linearly.

Usage: python tools/probe_growth.py [sf_dir] [days]
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DAYS = int(sys.argv[2]) if len(sys.argv) > 2 else 10
PROBE_PER_DAY = 100
THRESH = 0.2


def main() -> None:
    from pyspark.sql import functions as F

    from dagster_etl_spark.operators.dedup import IncrementalNearDupIndex
    from dagster_etl_spark.session import get_spark
    from dagster_etl_spark.sources.fixtures import load_table
    from tools.scale_trend_llm import _cipher_docs

    spark = get_spark("probe-growth")
    docs = load_table(spark, SF_DIR, "documents")
    n = docs.count()
    all_copies = _cipher_docs(docs, DAYS, n)

    # fixed external probe set: PROBE_PER_DAY docs per copy, ids
    # shifted far above the corpus id space so no accidental id
    # collisions muddy the pair sets
    probe_set = (
        all_copies.filter(F.col("doc_id") % (n // PROBE_PER_DAY) == 0)
        .select((F.col("doc_id") + DAYS * n * 10).alias("doc_id"), "text")
    )
    probe_set = probe_set.localCheckpoint()  # freeze: same bytes every day
    n_probe = probe_set.count()

    idx = IncrementalNearDupIndex(spark, "probe_growth_idx")
    idx.drop()
    days = []
    for d in range(DAYS):
        day_slice = all_copies.filter(
            (F.col("doc_id") >= d * n) & (F.col("doc_id") < (d + 1) * n)
        )
        t0 = time.perf_counter()
        idx.ingest(day_slice, threshold=THRESH)
        ingest_s = time.perf_counter() - t0
        compacted = None
        if (d + 1) % 3 == 0:
            compacted = idx.compact()
        idx.probe_external(probe_set, threshold=THRESH).count()  # warm
        t0 = time.perf_counter()
        hits = idx.probe_external(probe_set, threshold=THRESH).count()
        probe_s = time.perf_counter() - t0
        days.append(
            {
                "day": d + 1,
                "corpus_docs": (d + 1) * n,
                "ingest_sec": round(ingest_s, 3),
                "probe_sec": round(probe_s, 3),
                "probe_hits": hits,
                "compacted": {k: list(v) for k, v in compacted.items()}
                if compacted
                else None,
            }
        )
        print(f"# {days[-1]}", file=sys.stderr)
    idx.drop()
    first, last = days[0], days[-1]
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "days": DAYS,
                "probe_docs": n_probe,
                "series": days,
                "summary": {
                    "corpus_growth": round(
                        last["corpus_docs"] / first["corpus_docs"], 1
                    ),
                    "probe_time_growth": round(
                        last["probe_sec"] / first["probe_sec"], 2
                    ),
                    "hits_first_day": first["probe_hits"],
                    "hits_last_day": last["probe_hits"],
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
