"""Cross-engine scale trend for the remaining reference-parity
transforms (r9): cycle_time_stats (join + date-diff aggregate),
equipment_pivot (CASE'd pivot aggregate), item_master_enrich
(pure projection / enrichment).

With SCALETREND_r9 (WIP/priority) and SCALETREND_WIN_r9 (windows) this
completes DuckDB-paired scale evidence across every reference-parity
operator family. Same contract: identical parquet, interleaved D,S
pairs, median per engine; DuckDB materializes via .arrow() (the
projection query returns row-per-input).

Usage: python tools/scale_trend_parity.py [sf_dir] [mult ...]
Defaults: /root/testdata/sf0.1 and multipliers 10 50.
SCALE_PAR_QUERIES=a,b,c overrides the query list (r10: used to pair
event_rollup_multigrain, which the r9 run argued flat-floor from
absolute times without a paired row).
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
MULTS = [int(a) for a in sys.argv[2:]] or [10, 50]
RUNS = 5

QUERY_NAMES = tuple(
    q for q in os.environ.get(
        "SCALE_PAR_QUERIES",
        "cycle_time_stats,equipment_pivot,item_master_enrich",
    ).split(",") if q
)


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _materialize(spark, k: int) -> str:
    """Inflate with shifted keys (more orders/parts/users at the same
    density); lineitem keeps the date columns cycle_time needs."""
    from pyspark.sql import functions as F

    from dagster_etl_spark.scratch import scratch_dir
    from dagster_etl_spark.sources.fixtures import load_table
    from tools.scale_smoke import inflate_events

    out = scratch_dir(f"scale_trend_par_x{k}")
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_shipdate"
    )
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    part = load_table(spark, SF_DIR, "part").select(
        "p_partkey", "p_name", "p_type", "p_size", "p_brand", "p_retailprice"
    )
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    no = li.selectExpr("max(l_orderkey) + 1 AS n").first().n
    npart = part.selectExpr("max(p_partkey) + 1 AS n").first().n

    def union_k(frames):
        out_df = frames[0]
        for p in frames[1:]:
            out_df = out_df.unionByName(p)
        return out_df

    if k > 1:
        li = union_k([
            li.select(
                (F.col("l_orderkey") + i * no).alias("l_orderkey"),
                "l_linestatus",
                "l_shipdate",
            )
            for i in range(k)
        ])
        orders = union_k([
            orders.select(
                (F.col("o_orderkey") + i * no).alias("o_orderkey"),
                "o_orderdate",
                "o_orderpriority",
            )
            for i in range(k)
        ])
        part = union_k([
            part.select(
                (F.col("p_partkey") + i * npart).alias("p_partkey"),
                "p_name", "p_type", "p_size", "p_brand", "p_retailprice",
            )
            for i in range(k)
        ])
        ev = inflate_events(ev, k)
    for name, df in (
        ("lineitem", li), ("orders", orders), ("part", part), ("events", ev)
    ):
        df.repartition(32).write.mode("overwrite").parquet(
            f"{out}/{name}.parquet"
        )
    return out


def main() -> None:
    import duckdb

    from dagster_etl_spark import registry
    from dagster_etl_spark.session import get_spark

    spark = get_spark("scale-trend-par")
    qs = registry.queries()
    oracles = {n: registry.all_queries()[n].oracle for n in QUERY_NAMES}

    result: dict[str, dict] = {n: {} for n in QUERY_NAMES}
    rows = {}
    for k in MULTS:
        data_dir = _materialize(spark, k)
        con = duckdb.connect()
        for t in ("lineitem", "orders", "part", "events"):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{data_dir}/{t}.parquet/*.parquet')"
            )
        rows[f"x{k}"] = con.execute("SELECT COUNT(*) FROM lineitem").fetchone()[0]
        for name in QUERY_NAMES:
            sql = oracles[name]
            build = lambda: qs[name](spark, data_dir)  # noqa: E731
            con.execute(sql).arrow()
            _noop(build())
            ducks: list[float] = []
            sparks: list[float] = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                con.execute(sql).arrow()
                ducks.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                _noop(build())
                sparks.append(time.perf_counter() - t0)
            d = statistics.median(ducks)
            s = statistics.median(sparks)
            result[name][f"x{k}"] = {
                "duckdb_sec": round(d, 3),
                "spark_sec": round(s, 3),
                "ratio": round(s / d, 2),
                "duck_spread_sec": round(max(ducks) - min(ducks), 3),
                "spark_spread_sec": round(max(sparks) - min(sparks), 3),
            }
        con.close()
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "multipliers": MULTS,
                "runs": RUNS,
                "lineitem_rows": rows,
                "methodology": "same parquet both engines; interleaved "
                "D,S pairs; median per engine; oracle SQL via .arrow() "
                "vs noop-sink registered query",
                "queries": result,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
