"""Plan probe for priority_wip (r9): which join shape closes the gap?

SCALETREND_r8 isolated priority_wip_approx's residual vs DuckDB to the
fact-x-dim join (the join-free wip_aggregate_approx reaches 1.09x at
x50 while the priority form sits at 3.64x). This tool times candidate
plan shapes on the SAME inflated parquet, interleaved with the DuckDB
pair, and prints each variant's executed join strategy so the pick is
evidence, not taste.

Variants (all produce the registered result schema):
  cur_approx   — registered shape: scan-grain join (priority string
                 crosses the join), one planned agg w/ approx distinct.
  flag_approx  — r9 verdict probe: dim reduced to a 0/1 tinyint BEFORE
                 the join; otherwise identical.
  split_approx — no fact-wide join: join-free wip_aggregate_approx +
                 a narrow (group, lot) x urgent-keys count, grafted on
                 group keys. Equal to inner-join semantics only under
                 lot->dim referential integrity (holds in the fixtures
                 and the reference's domain: priority is an attribute
                 of an existing lot).
  cur_exact    — registered exact shape: (group, lot) pre-agg, then
                 join the reduced dim.
  flag_exact   — verdict probe on the exact form: join flagged dim at
                 scan grain FIRST, then the single-shuffle pre-agg.

Usage: python tools/probe_priority_plan.py [sf_dir] [mult ...]
Defaults: /root/testdata/sf0.1, mults 10 50. Prints one JSON line.
"""

from __future__ import annotations

import json
import re
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
MULTS = [int(a) for a in sys.argv[2:]] or [10, 50]
RUNS = 3

GROUP = ("l_linestatus", "l_suppkey")


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _join_nodes(df) -> list[str]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sorted(set(re.findall(r"(\w*(?:HashJoin|MergeJoin)\w*)", plan)))


def main() -> None:
    import duckdb

    from pyspark.sql import functions as F

    from dagster_etl_spark.operators.wip import (
        priority_wip_aggregate,
        wip_aggregate,
    )
    from dagster_etl_spark.session import get_spark
    from tools.scale_trend import _materialize

    spark = get_spark("probe-priority")

    def load(d, name):
        return spark.read.parquet(f"{d}/{name}.parquet")

    KW = dict(
        group_cols=GROUP,
        qty_col="l_quantity",
        lot_col="l_orderkey",
        status_col="l_returnflag",
        active_statuses=("N", "A"),
    )

    def cur_approx(d):
        li, o = load(d, "lineitem"), load(d, "orders")
        return priority_wip_aggregate(
            li.join(o, li.l_orderkey == o.o_orderkey),
            priority_col="o_orderpriority",
            high_value="1-URGENT",
            approx_distinct=True,
            **KW,
        )

    def flag_approx(d):
        li, o = load(d, "lineitem"), load(d, "orders")
        dim = o.select(
            "o_orderkey",
            (F.col("o_orderpriority") == "1-URGENT").cast("tinyint").alias("__u"),
        )
        return wip_aggregate(
            li.join(dim, li.l_orderkey == dim.o_orderkey),
            approx_distinct=True,
            extra_aggs=(F.sum("__u").cast("long").alias("high_priority_count"),),
            **KW,
        )

    def split_approx(d):
        li, o = load(d, "lineitem"), load(d, "orders")
        base = wip_aggregate(li, approx_distinct=True, **KW)
        urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
        li_act = li.filter(F.col("l_returnflag").isin(["N", "A"]))
        for k in GROUP:
            li_act = li_act.filter(F.col(k).isNotNull())
        cnt = (
            li_act.select(*GROUP, "l_orderkey")
            .join(urgent, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy(*GROUP)
            .agg(F.count(F.lit(1)).alias("high_priority_count"))
        )
        return base.join(cnt, on=list(GROUP), how="left").withColumn(
            "high_priority_count",
            F.coalesce("high_priority_count", F.lit(0)).cast("long"),
        )

    def cur_exact(d):
        from dagster_etl_spark.operators.wip import priority_wip_preagg

        return priority_wip_preagg(
            load(d, "lineitem"),
            load(d, "orders"),
            dim_key="o_orderkey",
            priority_col="o_orderpriority",
            high_value="1-URGENT",
            **KW,
        )

    def flag_exact(d):
        li, o = load(d, "lineitem"), load(d, "orders")
        dim = o.select(
            "o_orderkey",
            (F.col("o_orderpriority") == "1-URGENT").cast("tinyint").alias("__u"),
        )
        return wip_aggregate(
            li.join(dim, li.l_orderkey == dim.o_orderkey),
            single_shuffle=True,
            extra_sums=((F.col("__u"), "high_priority_count"),),
            **KW,
        )

    def split_exact(d):
        li, o = load(d, "lineitem"), load(d, "orders")
        base = wip_aggregate(li, single_shuffle=True, **KW)
        urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
        li_act = li.filter(F.col("l_returnflag").isin(["N", "A"]))
        for k in GROUP:
            li_act = li_act.filter(F.col(k).isNotNull())
        cnt = (
            li_act.select(*GROUP, "l_orderkey")
            .join(urgent, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy(*GROUP)
            .agg(F.count(F.lit(1)).alias("high_priority_count"))
        )
        return base.join(cnt, on=list(GROUP), how="left").withColumn(
            "high_priority_count",
            F.coalesce("high_priority_count", F.lit(0)).cast("long"),
        )

    variants = {
        "cur_approx": cur_approx,
        "flag_approx": flag_approx,
        "split_approx": split_approx,
        "cur_exact": cur_exact,
        "flag_exact": flag_exact,
        "split_exact": split_exact,
    }

    DUCK_EXACT = """
        SELECT l.l_linestatus, l.l_suppkey,
               SUM(l.l_quantity) AS wip_qty,
               COUNT(DISTINCT l.l_orderkey) AS lot_count,
               SUM(CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
                 AS high_priority_count
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_returnflag IN ('N', 'A')
        GROUP BY l.l_linestatus, l.l_suppkey
    """
    DUCK_APPROX = DUCK_EXACT.replace(
        "COUNT(DISTINCT l.l_orderkey)", "approx_count_distinct(l.l_orderkey)"
    )

    out: dict[str, dict] = {}
    for k in MULTS:
        d = _materialize(spark, k)
        con = duckdb.connect()
        for t in ("lineitem", "orders"):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{d}/{t}.parquet/*.parquet')"
            )
        res: dict[str, dict] = {}
        for dn, dsql in (("duck_exact", DUCK_EXACT), ("duck_approx", DUCK_APPROX)):
            con.execute(dsql).fetchall()  # warm
            ts = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                con.execute(dsql).fetchall()
                ts.append(time.perf_counter() - t0)
            res[dn] = {"sec": round(statistics.median(ts), 3)}
        for vn, fn in variants.items():
            df = fn(d)
            _noop(df)  # warm: plan + codegen + page cache
            joins = _join_nodes(df)
            ts = []
            for _ in range(RUNS):
                # interleave a duck run so drift hits both engines
                con.execute(DUCK_APPROX).fetchall()
                t0 = time.perf_counter()
                _noop(fn(d))
                ts.append(time.perf_counter() - t0)
            res[vn] = {
                "sec": round(statistics.median(ts), 3),
                "spread": round(max(ts) - min(ts), 3),
                "joins": joins,
                "rows": df.count(),
            }
        con.close()
        out[f"x{k}"] = res
    print(json.dumps({"sf_dir": SF_DIR, "runs": RUNS, "scales": out}))
    spark.stop()


if __name__ == "__main__":
    main()
