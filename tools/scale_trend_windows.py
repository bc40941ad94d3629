"""Cross-engine scale trend for the window-function family (r9).

SCALETREND_r8/r9 settled the aggregate/join queries; the window
operators (LAG chains, session assignment, frame aggregation, per-group
top-k, multi-grain rollup) had per-engine smokes but no DuckDB pairing
at scale. Same fairness contract as tools/scale_trend.py: identical
parquet, interleaved D,S pairs, median per engine.

One methodological difference: these queries RETURN data-sized results
(events_lag is row-per-input), so the DuckDB side materializes via
``.arrow()`` (columnar, no per-row Python objects) to mirror Spark's
noop sink (full execution, no driver collect); fetchall() would charge
DuckDB for Python tuple construction the Spark side never pays.

Usage: python tools/scale_trend_windows.py [sf_dir] [mult ...]
Defaults: /root/testdata/sf0.1 and multipliers 10 50.
Prints one JSON line; table goes to BASELINE.md.
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
RUNS = 5

QUERY_NAMES = (
    "events_lag",
    "sessionize",
    "event_rollup_multigrain",
    "order_rank_window",
    "rolling_customer_spend",
)


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _inflate_orders(orders, k: int):
    """K copies with shifted order AND customer keys: more customers at
    the same orders-per-customer density — the growth axis for
    per-customer window partitions (mirrors inflate_events)."""
    from pyspark.sql import functions as F

    b = orders.selectExpr(
        "max(o_orderkey) + 1 AS no", "max(o_custkey) + 1 AS nc"
    ).first()
    parts = [
        orders.select(
            (F.col("o_orderkey") + i * b.no).alias("o_orderkey"),
            (F.col("o_custkey") + i * b.nc).alias("o_custkey"),
            "o_totalprice",
            "o_orderdate",
        )
        for i in range(k)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _materialize(spark, k: int) -> str:
    from dagster_etl_spark.scratch import scratch_dir
    from dagster_etl_spark.sources.fixtures import load_table
    from tools.scale_smoke import inflate_events

    out = scratch_dir(f"scale_trend_win_x{k}")
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    orders = load_table(spark, SF_DIR, "orders")
    if k > 1:
        ev = inflate_events(ev, k)
        orders = _inflate_orders(orders, k)
    else:
        orders = orders.select(
            "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
        )
    ev.repartition(32).write.mode("overwrite").parquet(f"{out}/events.parquet")
    orders.repartition(32).write.mode("overwrite").parquet(f"{out}/orders.parquet")
    return out


def main() -> None:
    import duckdb

    from dagster_etl_spark import registry
    from dagster_etl_spark.session import get_spark

    spark = get_spark("scale-trend-win")
    qs = registry.queries()
    oracles = {n: registry.all_queries()[n].oracle for n in QUERY_NAMES}

    result: dict[str, dict] = {n: {} for n in QUERY_NAMES}
    rows = {}
    for k in MULTS:
        data_dir = _materialize(spark, k)
        con = duckdb.connect()
        for t in ("events", "orders"):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{data_dir}/{t}.parquet/*.parquet')"
            )
        rows[f"x{k}"] = {
            "events": con.execute("SELECT COUNT(*) FROM events").fetchone()[0],
            "orders": con.execute("SELECT COUNT(*) FROM orders").fetchone()[0],
        }
        for name in QUERY_NAMES:
            sql = oracles[name]
            build = lambda: qs[name](spark, data_dir)  # noqa: E731
            con.execute(sql).arrow()  # warm duck
            _noop(build())  # warm spark
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
                "rows": rows,
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
