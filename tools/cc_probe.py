"""Connected-components probe: label propagation + pointer jumping vs
alternating large-star/small-star on the scaled near-dup pair graph
(r16 verdict task 6).

The x100 staged curation run (SCALETREND_CURATION_X100_r16) put the
dedup stage at 18.5 s of the 35.9 s wall with 30 exchanges, most of
them the CC fixpoint rounds — so CC is the named next lever. This tool
isolates the CC step: materialize the MinHash+LSH pairs ONCE for the
cipher-translated corpus at each multiplier (localCheckpointed — pair
generation is identical for both algorithms and is NOT what's being
probed), assert both algorithms return the identical clustering, then
time RUNS interleaved (propagation, star) pairs.

The cipher corpus's components are realistic for near-dup graphs (many
small clusters, short diameters); the tool also runs a CHAIN graph
(one long path, the diameter worst case where pointer jumping's
O(log d) convergence and the stars' contraction behave most
differently).

Usage: python tools/cc_probe.py [sf_dir] [mult ...]
Defaults: /root/testdata/sf0.1 and multipliers 100.
Prints one JSON line (redirect to CCPROBE_r{N}.json).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
MULTS = [int(a) for a in sys.argv[2:]] or [100]
RUNS = 3
THRESH = 0.5


def _pair_time(spark, pairs_fn, label: str) -> tuple[float, list[float]]:
    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    noop(pairs_fn())  # warm
    secs = []
    for _ in range(RUNS):
        t0 = time.perf_counter()
        noop(pairs_fn())
        secs.append(time.perf_counter() - t0)
    return statistics.median(secs), secs


def main() -> None:
    from dagster_etl_spark.operators.dedup import (
        connected_components,
        connected_components_star,
        minhash_neardup_pairs,
    )
    from dagster_etl_spark.session import get_spark
    from dagster_etl_spark.sources.fixtures import load_table
    from tools.scale_trend_llm import _cipher_docs

    spark = get_spark("cc-probe")
    docs0 = load_table(spark, SF_DIR, "documents")
    n = docs0.count()

    out: dict = {"sf_dir": SF_DIR, "runs": RUNS, "mults": {}}
    for k in MULTS:
        docs = _cipher_docs(docs0, k, n) if k > 1 else docs0
        pairs = minhash_neardup_pairs(docs, threshold=THRESH).localCheckpoint(
            eager=True
        )
        n_pairs = pairs.count()

        got_prop = {
            (r.doc_id, r.cluster_id)
            for r in connected_components(pairs).collect()
        }
        got_star = {
            (r.doc_id, r.cluster_id)
            for r in connected_components_star(pairs).collect()
        }
        identical = got_prop == got_star

        load1 = round(os.getloadavg()[0], 2)
        prop_med, prop_secs = _pair_time(
            spark, lambda: connected_components(pairs), "prop"
        )
        star_med, star_secs = _pair_time(
            spark, lambda: connected_components_star(pairs), "star"
        )
        out["mults"][f"x{k}"] = {
            "n_pairs": n_pairs,
            "n_nodes": len(got_prop),
            "identical_clustering": identical,
            "propagation_sec": round(prop_med, 3),
            "star_sec": round(star_med, 3),
            "star_over_prop": round(star_med / prop_med, 2),
            "prop_spread_sec": round(max(prop_secs) - min(prop_secs), 3),
            "star_spread_sec": round(max(star_secs) - min(star_secs), 3),
            "loadavg_at_start": load1,
        }
        print(f"# x{k} {out['mults'][f'x{k}']}", file=sys.stderr)

    # diameter worst case: one 2000-node chain
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(2000)], "id_a long, id_b long"
    ).localCheckpoint(eager=True)
    cp = {
        (r.doc_id, r.cluster_id)
        for r in connected_components(chain, max_iter=40).collect()
    }
    cs = {
        (r.doc_id, r.cluster_id)
        for r in connected_components_star(chain, max_iter=40).collect()
    }
    prop_med, prop_secs = _pair_time(
        spark, lambda: connected_components(chain, max_iter=40), "prop"
    )
    star_med, star_secs = _pair_time(
        spark, lambda: connected_components_star(chain, max_iter=40), "star"
    )
    out["chain_2000"] = {
        "identical_clustering": cp == cs,
        "propagation_sec": round(prop_med, 3),
        "star_sec": round(star_med, 3),
        "star_over_prop": round(star_med / prop_med, 2),
    }
    print(f"# chain {out['chain_2000']}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
