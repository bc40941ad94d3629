"""Dump `.explain("formatted")` per query to plans/r19/<query>_<tag>.txt.

Usage: python tools/dump_plans_r19.py <before|after> [sf_dir] [name ...]

Captures the AQE-initial formatted plan (the shape the optimizer chose:
exchanges, join strategies, pushed filters, codegen spans) for the
bench-tagged queries by default, or the named queries.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

TAG = sys.argv[1]
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
ONLY = sys.argv[3:]

OUT = REPO / "plans" / "r19"
OUT.mkdir(parents=True, exist_ok=True)


def main() -> None:
    from dagster_etl_spark.registry import all_queries
    from dagster_etl_spark.session import get_spark

    spark = get_spark("plans-r19", shuffle_partitions=16)
    # AQE off so the full pre-adaptive plan (codegen spans, exchange
    # placement) is visible, same convention as tools/dump_plans.py.
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    specs = all_queries()
    names = ONLY or [n for n, s in specs.items() if "bench" in s.tags]
    for name in names:
        df = specs[name].fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        (OUT / f"{name}_{TAG}.txt").write_text(plan)
        print(f"{name}: {plan.count('Exchange')} Exchange, "
              f"{plan.count('BatchEvalPython')} BatchEvalPython")
    spark.stop()


if __name__ == "__main__":
    main()
