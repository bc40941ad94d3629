"""Scale smoke: run the heavy text/dedup operators on a synthetically
inflated corpus (documents unioned K times with shifted ids and salted
near-dup mutations) to observe scaling behavior beyond the fixtures.

Usage: python tools/scale_smoke.py [multiplier] [sf_dir]
Prints one JSON line with per-operator seconds at 1x and Kx.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

# argv parsed under the __main__ guard so scale_trend.py can import
# the inflate helpers without tripping over its own arguments
MULT = 10
SF_DIR = "/root/testdata/sf0.1"


def inflate(docs, k: int):
    """K shifted copies; 1-in-7 copies get a token appended so the
    inflated corpus has genuine near-dups, not only exact ones."""
    from pyspark.sql import functions as F

    n = docs.count()
    parts = []
    for i in range(k):
        p = docs.select(
            (F.col("doc_id") + i * n).alias("doc_id"),
            F.when(
                (F.col("doc_id") + i) % 7 == 0,
                F.concat(F.col("text"), F.lit(f" variant{i}")),
            ).otherwise(F.col("text")).alias("text"),
        )
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def inflate_events(ev, k: int):
    """K copies with shifted user_id/event_id: more users, same
    per-user density — the realistic growth axis for per-key temporal
    operators (a 50× corpus is 50× more users, not 50× deeper ones)."""
    from pyspark.sql import functions as F

    bounds = ev.selectExpr(
        "max(user_id) + 1 AS nu", "max(event_id) + 1 AS ne"
    ).first()
    parts = [
        ev.select(
            (F.col("event_id") + i * bounds.ne).alias("event_id"),
            (F.col("user_id") + i * bounds.nu).alias("user_id"),
            "ts",
            "event_type",
            "value",
        )
        for i in range(k)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def inflate_lineitem(li, orders, k: int):
    """K copies with shifted order/supplier keys: more suppliers and
    more orders at the same density — the growth axis of the WIP
    aggregate's group-key space (its single-shuffle plan repartitions
    by (linestatus, suppkey), so group cardinality must grow with the
    data for the claim to hold)."""
    from pyspark.sql import functions as F

    no = li.selectExpr("max(l_orderkey) + 1 AS n").first().n
    ns = li.selectExpr("max(l_suppkey) + 1 AS n").first().n
    li_parts = [
        li.select(
            (F.col("l_orderkey") + i * no).alias("l_orderkey"),
            (F.col("l_suppkey") + i * ns).alias("l_suppkey"),
            "l_linestatus",
            "l_returnflag",
            "l_quantity",
        )
        for i in range(k)
    ]
    ord_parts = [
        orders.select(
            (F.col("o_orderkey") + i * no).alias("o_orderkey"),
            "o_orderpriority",
        )
        for i in range(k)
    ]
    li_out, ord_out = li_parts[0], ord_parts[0]
    for p in li_parts[1:]:
        li_out = li_out.unionByName(p)
    for p in ord_parts[1:]:
        ord_out = ord_out.unionByName(p)
    return li_out, ord_out


def main() -> None:
    from dagster_etl_spark.operators.dedup import (
        dedup_clusters,
        exact_dedup_stats,
        minhash_neardup_pairs,
    )
    from dagster_etl_spark.operators.history import scd2_intervals
    from dagster_etl_spark.operators.temporal import fill_time_gaps
    from dagster_etl_spark.operators.text import chunk_docs, doc_stats, fingerprints, pack_chunks
    from dagster_etl_spark.session import get_spark
    from dagster_etl_spark.sources.fixtures import load_table

    spark = get_spark("scale-smoke")
    docs1 = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    docs1.cache().count()
    docsk = inflate(docs1, MULT)
    docsk.cache().count()
    ev1 = load_table(spark, SF_DIR, "events").filter("user_id IS NOT NULL")
    ev1 = ev1.select("event_id", "user_id", "ts", "event_type", "value")
    ev1.cache().count()
    evk = inflate_events(ev1, MULT)
    evk.cache().count()

    from pyspark.sql import functions as F

    from dagster_etl_spark.functions import xdialect as xd
    from dagster_etl_spark.operators.text import winnow_fingerprints
    from dagster_etl_spark.plans.layout import spread

    def bigram_novelty(d):
        sh = xd.let(
            xd.tokens("text", xd.SPARK), "_t", xd.shingles("_t", 2, xd.SPARK), xd.SPARK
        )
        e = spread(d).selectExpr("doc_id", f"explode({sh}) AS bigram")
        c = e.groupBy("bigram").agg(F.count(F.lit(1)).alias("df"))
        return (
            e.join(c, "bigram")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_bigrams"),
                F.sum(F.when(F.col("df") <= 2, 1).otherwise(0)).alias("n_rare"),
            )
        )

    from dagster_etl_spark.operators.dedup import dedup_lines
    from dagster_etl_spark.queries_text import curation_v2, reline_10_tokens

    def relined_dedup_lines(d):
        # same reshape as the registered query: deterministic 10-token
        # lines, then C4-style cross-doc boilerplate removal
        return dedup_lines(reline_10_tokens(d), min_docs=2)

    def curation_v2_salted(d):
        # the registered composed plan needs a source column; salt it
        # per inflated copy so URL dedup keeps the corpus K-sized
        # instead of collapsing every copy back to 1x
        return curation_v2(
            d.withColumn(
                "source",
                F.concat(F.lit("https://h"), (F.col("doc_id") % 1000).cast("string"),
                         F.lit("/p"), F.col("doc_id").cast("string")),
            )
        )

    doc_ops = {
        "doc_stats": doc_stats,
        "fingerprints": fingerprints,
        "exact_dedup": exact_dedup_stats,
        "dedup_lines": relined_dedup_lines,
        "minhash_neardup": lambda d: minhash_neardup_pairs(d, threshold=0.5),
        "dedup_clusters": lambda d: dedup_clusters(d, threshold=0.5),
        "packed_sequences": lambda d: pack_chunks(chunk_docs(d)),
        "winnow_fingerprints": winnow_fingerprints,
        "bigram_novelty": bigram_novelty,
        "curation_pipeline_v2": curation_v2_salted,
    }
    ev_ops = {
        "gap_fill_timeline": lambda e: fill_time_gaps(
            e, keys=["user_id"], ts_col="ts", value_col="value",
            tiebreak_col="event_id", grain_sec=900,
        ),
        "scd2_intervals": lambda e: scd2_intervals(
            e, keys=["user_id"], ts_col="ts", attr_cols=["event_type"],
            tiebreak=["event_id"],
        ),
    }

    from dagster_etl_spark.operators.wip import priority_wip_aggregate, wip_aggregate

    li1 = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_linestatus", "l_returnflag", "l_quantity"
    )
    ord1 = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderpriority")
    li1.cache().count()
    ord1.cache().count()
    lik, ordk = inflate_lineitem(li1, ord1, MULT)
    lik.cache().count()
    ordk.cache().count()
    _wip_kw = dict(
        group_cols=("l_linestatus", "l_suppkey"), qty_col="l_quantity",
        lot_col="l_orderkey", status_col="l_returnflag",
        active_statuses=("N", "A"),
    )
    wip_ops = {
        "wip_aggregate": lambda t: wip_aggregate(t[0], **_wip_kw),
        "priority_wip": lambda t: priority_wip_aggregate(
            t[0].join(t[1], t[0].l_orderkey == t[1].o_orderkey),
            priority_col="o_orderpriority", high_value="1-URGENT", **_wip_kw,
        ),
    }
    from dagster_etl_spark.plans.cache import release_pinned

    out = {}
    for name, fn, d1, dk in [
        *[(n, f, docs1, docsk) for n, f in doc_ops.items()],
        *[(n, f, ev1, evk) for n, f in ev_ops.items()],
        *[(n, f, (li1, ord1), (lik, ordk)) for n, f in wip_ops.items()],
    ]:
        t0 = time.time()
        fn(d1).write.mode("overwrite").format("noop").save()
        t1 = round(time.time() - t0, 2)
        release_pinned()  # same hygiene as bench.py: operators pin
        t0 = time.time()  # self-join intermediates; don't let them
        fn(dk).write.mode("overwrite").format("noop").save()  # accrete
        tk = round(time.time() - t0, 2)
        release_pinned()
        out[name] = {
            "x1_sec": t1,
            f"x{MULT}_sec": tk,
            "scale_factor": round(tk / max(t1, 1e-9), 1),
        }
    print(json.dumps({"multiplier": MULT, "ops": out}))
    spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1:
        MULT = int(sys.argv[1])
    if len(sys.argv) > 2:
        SF_DIR = sys.argv[2]
    main()
