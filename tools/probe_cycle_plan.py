"""Plan probe for cycle_time_stats (r9): the parity trend showed 11x
single-process at x50 — the same join-before-aggregate shape the
priority graft had. Unlike the priority flag, the dim contributes BOTH
the group key (priority) and a value inside the date arithmetic
(o_orderdate), so a full split is impossible; the candidate is
aggregate-before-join with the cycle arithmetic DECOMPOSED:

  sum(ship - orderdate)  = sum(sum_ship_per_order) - sum(n * orderdate)
  min(ship - orderdate)  = min(min_ship_per_order - orderdate)

so the fact pre-aggregates to orderkey grain (exact integer partials)
and the join probes order-grain rows instead of raw lineitems.

Variants:
  cur      — the r9-registered shape: scan-grain join, group by
             priority. (Since r10 the registered query builds the
             narrowdim shape below — `cycle_time_join_stats`; "cur"
             is kept under its original name so rows compare across
             rounds.)
  preagg   — fact pre-aggregated per orderkey, then join + tiny agg.
  narrowdim— cur with the dim projected to (key, epoch int, priority):
             the broadcast build carries ints, not a timestamp object.
  shj      — narrowdim with a SHUFFLE_HASH hint on the dim side: the
             single-process engine this is paired against does a hash
             join; Spark's default SMJ sorts BOTH fact and dim — at
             60 M + 15 M rows the two sorts are pure overhead the
             hash build avoids (r10).
  bucketed — lineitem/orders pre-bucketed+sorted by orderkey via
             sources/bucketed.py: the recurring-pipeline layout where
             the join plans with ZERO exchanges; the one-time bucket
             write cost is reported separately (r10).

Usage: python tools/probe_cycle_plan.py [sf_dir] [mult ...]
Defaults: /root/testdata/sf0.1, mults 10 50. Prints one JSON line.
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
MULTS = [int(a) for a in sys.argv[2:]] or [10, 50]
RUNS = 3


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    import duckdb

    from pyspark.sql import functions as F

    from dagster_etl_spark.operators.cycle_time import cycle_time_stats
    from dagster_etl_spark.registry import all_queries
    from dagster_etl_spark.session import get_spark
    from tools.scale_trend_parity import _materialize

    spark = get_spark("probe-cycle")
    oracle = all_queries()["cycle_time_stats"].oracle

    def load(d, name):
        return spark.read.parquet(f"{d}/{name}.parquet")

    def cur(d):
        li, o = load(d, "lineitem"), load(d, "orders")
        return cycle_time_stats(
            li.join(o, li.l_orderkey == o.o_orderkey),
            group_cols=("o_orderpriority",),
            start_col="o_orderdate",
            end_col="l_shipdate",
            status_col="l_linestatus",
            completed_value="F",
        )

    def preagg(d):
        li, o = load(d, "lineitem"), load(d, "orders")
        per_order = (
            li.filter("l_linestatus = 'F' AND l_shipdate IS NOT NULL")
            .select(
                "l_orderkey",
                F.unix_timestamp("l_shipdate").alias("__ship"),
            )
            .groupBy("l_orderkey")
            .agg(
                F.sum("__ship").alias("__sum_ship"),
                F.min("__ship").alias("__min_ship"),
                F.max("__ship").alias("__max_ship"),
                F.count(F.lit(1)).alias("__n"),
            )
        )
        dim = o.filter("o_orderdate IS NOT NULL").select(
            "o_orderkey",
            F.unix_timestamp("o_orderdate").alias("__od"),
            "o_orderpriority",
        )
        j = per_order.join(dim, per_order.l_orderkey == dim.o_orderkey)
        total = (F.sum("__sum_ship") - F.sum(F.col("__n") * F.col("__od"))).cast(
            "double"
        )
        return j.groupBy("o_orderpriority").agg(
            (total / F.sum("__n") / F.lit(60.0)).alias("avg_cycle_time"),
            (F.min(F.col("__min_ship") - F.col("__od")) / F.lit(60.0)).alias(
                "min_cycle_time"
            ),
            (F.max(F.col("__max_ship") - F.col("__od")) / F.lit(60.0)).alias(
                "max_cycle_time"
            ),
            F.sum("__n").alias("lot_count"),
        )

    def narrowdim(d):
        li, o = load(d, "lineitem"), load(d, "orders")
        li = li.filter("l_linestatus = 'F' AND l_shipdate IS NOT NULL").select(
            "l_orderkey", F.unix_timestamp("l_shipdate").alias("__ship")
        )
        dim = o.filter("o_orderdate IS NOT NULL").select(
            "o_orderkey",
            F.unix_timestamp("o_orderdate").alias("__od"),
            "o_orderpriority",
        )
        j = li.join(dim, li.l_orderkey == dim.o_orderkey)
        cyc = F.col("__ship") - F.col("__od")
        return j.groupBy("o_orderpriority").agg(
            (F.sum(cyc).cast("double") / F.count(F.lit(1)) / F.lit(60.0)).alias(
                "avg_cycle_time"
            ),
            (F.min(cyc) / F.lit(60.0)).alias("min_cycle_time"),
            (F.max(cyc) / F.lit(60.0)).alias("max_cycle_time"),
            F.count(F.lit(1)).alias("lot_count"),
        )

    def _narrow_frames(d):
        li = load(d, "lineitem").filter(
            "l_linestatus = 'F' AND l_shipdate IS NOT NULL"
        ).select("l_orderkey", F.unix_timestamp("l_shipdate").alias("__ship"))
        dim = load(d, "orders").filter("o_orderdate IS NOT NULL").select(
            "o_orderkey",
            F.unix_timestamp("o_orderdate").alias("__od"),
            "o_orderpriority",
        )
        return li, dim

    def _tiny_agg(j):
        cyc = F.col("__ship") - F.col("__od")
        return j.groupBy("o_orderpriority").agg(
            (F.sum(cyc).cast("double") / F.count(F.lit(1)) / F.lit(60.0)).alias(
                "avg_cycle_time"
            ),
            (F.min(cyc) / F.lit(60.0)).alias("min_cycle_time"),
            (F.max(cyc) / F.lit(60.0)).alias("max_cycle_time"),
            F.count(F.lit(1)).alias("lot_count"),
        )

    def shj(d):
        li, dim = _narrow_frames(d)
        j = li.join(dim.hint("SHUFFLE_HASH"), li.l_orderkey == dim.o_orderkey)
        return _tiny_agg(j)

    bucket_write_sec: dict[str, float] = {}

    def prep_bucketed(d, k):
        from dagster_etl_spark.sources.bucketed import write_bucketed

        li, dim = _narrow_frames(d)
        t0 = time.perf_counter()
        write_bucketed(li, f"probe_li_x{k}", ["l_orderkey"], 32, ["l_orderkey"])
        write_bucketed(dim, f"probe_o_x{k}", ["o_orderkey"], 32, ["o_orderkey"])
        bucket_write_sec[f"x{k}"] = round(time.perf_counter() - t0, 3)

    def bucketed_factory(k):
        def bucketed(d):
            li = spark.table(f"probe_li_x{k}")
            dim = spark.table(f"probe_o_x{k}")
            j = li.join(dim, li.l_orderkey == dim.o_orderkey)
            return _tiny_agg(j)

        return bucketed

    out: dict[str, dict] = {}
    for k in MULTS:
        d = _materialize(spark, k)
        prep_bucketed(d, k)
        variants = {
            "cur": cur,
            "preagg": preagg,
            "narrowdim": narrowdim,
            "shj": shj,
            "bucketed": bucketed_factory(k),
        }
        con = duckdb.connect()
        for t in ("lineitem", "orders"):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{d}/{t}.parquet/*.parquet')"
            )
        res: dict[str, dict] = {}
        con.execute(oracle).fetchall()
        ts = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            con.execute(oracle).fetchall()
            ts.append(time.perf_counter() - t0)
        res["duck"] = {"sec": round(statistics.median(ts), 3)}
        for vn, fn in variants.items():
            df = fn(d)
            _noop(df)
            ts = []
            for _ in range(RUNS):
                con.execute(oracle).fetchall()  # interleave
                t0 = time.perf_counter()
                _noop(fn(d))
                ts.append(time.perf_counter() - t0)
            res[vn] = {
                "sec": round(statistics.median(ts), 3),
                "spread": round(max(ts) - min(ts), 3),
                "rows": df.count(),
            }
        con.close()
        res["bucketed"]["write_sec"] = bucket_write_sec[f"x{k}"]
        from dagster_etl_spark.sources.bucketed import exchanges_in_plan

        # the final 5-group agg contributes one tiny exchange; the JOIN
        # itself must contribute zero (both sides bucket-pruned)
        res["bucketed"]["exchanges"] = exchanges_in_plan(variants["bucketed"](d))
        out[f"x{k}"] = res
    print(json.dumps({"sf_dir": SF_DIR, "runs": RUNS, "scales": out}))
    spark.stop()


if __name__ == "__main__":
    main()
