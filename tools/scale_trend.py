"""Cross-engine scale trend for the two floor-dominated queries.

BASELINE.md's defense of wip_aggregate / priority_wip is that their
raw sf0.1 ratios vs DuckDB (8x / 5x) are dominated by Spark's constant
per-job floor (task scheduling + shuffle barrier), which amortizes as
data grows. The per-engine scale smokes show Spark-side sublinearity,
but never showed the RATIO closing. This tool produces that one
measurement: DuckDB and Spark timed on the SAME inflated parquet at
1x / 10x / 50x sf0.1, paired same-session, interleaved D,S,D,S so host
drift hits both engines equally.

Fairness contract:
* both engines read identical parquet files (written once per scale,
  32 files each, to a process-scoped scratch dir);
* the DuckDB side runs each query's REGISTERED ORACLE SQL (the same
  SQL the correctness gate hash-verifies against) with default thread
  count (all cores — matching local[32]);
* the Spark side runs the registered query itself into a noop sink,
  the bench.py methodology;
* per scale: warm-up of each engine, then ``RUNS`` interleaved pairs,
  median per engine, ratio = spark_median / duck_median.

Usage: python tools/scale_trend.py [sf_dir] [multiplier ...]
Defaults: /root/testdata/sf0.1 and multipliers 1 10 50.
Prints one JSON line; paste the table into BASELINE.md.
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
MULTS = [int(a) for a in sys.argv[2:]] or [1, 10, 50]
RUNS = 5
# exact forms AND their approx twins: the trend table must show both
# the exact-distinct plateau and the scale path's ratio on the same
# inflated data. Approx twins have no registered oracle (HLL values
# can't hash-match); DuckDB runs the exact twin's SQL — what a single-
# process user actually computes.
QUERY_NAMES = (
    "wip_aggregate",
    "wip_aggregate_approx",
    "priority_wip",
    "priority_wip_approx",
)


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _materialize(spark, k: int) -> str:
    """Write the k-inflated lineitem/orders pair as parquet both
    engines will read. Same column subset and file count at every
    scale so only data volume varies."""
    from dagster_etl_spark.scratch import scratch_dir
    from dagster_etl_spark.sources.fixtures import load_table
    from tools.scale_smoke import inflate_lineitem

    out = scratch_dir(f"scale_trend_x{k}")
    li1 = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_linestatus", "l_returnflag", "l_quantity"
    )
    ord1 = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    lik, ordk = inflate_lineitem(li1, ord1, k)
    lik.repartition(32).write.parquet(f"{out}/lineitem.parquet")
    ordk.repartition(32).write.parquet(f"{out}/orders.parquet")
    return out


def main() -> None:
    import duckdb

    from dagster_etl_spark import registry
    from dagster_etl_spark.session import get_spark

    spark = get_spark("scale-trend")
    qs = registry.queries()
    specs = registry.all_queries()
    oracles = {
        n: specs[n].oracle or specs[n.removesuffix("_approx")].oracle
        for n in QUERY_NAMES
    }

    result: dict[str, dict] = {n: {} for n in QUERY_NAMES}
    rows = {}
    for k in MULTS:
        data_dir = _materialize(spark, k)
        con = duckdb.connect()
        for t in ("lineitem", "orders"):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{data_dir}/{t}.parquet/*.parquet')"
            )
        rows[f"x{k}"] = con.execute("SELECT COUNT(*) FROM lineitem").fetchone()[0]
        for name in QUERY_NAMES:
            sql = oracles[name]
            build = lambda: qs[name](spark, data_dir)  # noqa: E731
            con.execute(sql).fetchall()  # warm duck (catalog + page cache)
            _noop(build())  # warm spark (plan + codegen + page cache)
            ducks: list[float] = []
            sparks: list[float] = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
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
                "D,S pairs; median per engine; oracle SQL vs noop-sink "
                "registered query",
                "queries": result,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
