"""Tests for the partition calendar / backfill reconciliation and the
skew helpers (salted join/groupby equivalence, approx distinct)."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def test_daily_partition_keys_and_formats():
    from dagster_etl_spark.orchestration.partitions import DailyPartitions

    p = DailyPartitions(start_date="2024-01-01", end_offset=1)
    keys = p.keys(until="2024-01-05")
    assert keys[0] == "2024-01-01" and keys[-1] == "2024-01-05"
    assert len(keys) == 5
    assert DailyPartitions.compact("2024-01-05") == "20240105"
    assert DailyPartitions.expand("20240105") == "2024-01-05"
    # end_offset=1 includes "today" relative to the until date
    assert p.keys(until="2024-01-01") == ["2024-01-01"]


def test_missing_partitions_reconciliation(spark, tmp_path):
    from dagster_etl_spark.orchestration.partitions import (
        DailyPartitions,
        missing_partitions,
    )
    from dagster_etl_spark.sources import lake
    from dagster_etl_spark.sources.fixtures import load_table

    base = str(tmp_path / "lake")
    ev = load_table(spark, SF_SMALL, "events").limit(10)
    for d in ("2024-01-01", "2024-01-03"):
        lake.write_partition(ev, base, "t1", "extract", "events", d)

    p = DailyPartitions(start_date="2024-01-01")
    missing = missing_partitions(
        spark, p, base, "t1", "extract", "events", until="2024-01-04"
    )
    assert missing == ["2024-01-02", "2024-01-04"]


def test_salted_join_equals_plain_join(spark):
    from pyspark.sql import functions as F

    from dagster_etl_spark.operators.skew import salted_join
    from dagster_etl_spark.sources.fixtures import load_table

    li = load_table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, SF_SMALL, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plain = li.join(orders, on="l_orderkey").groupBy("o_orderpriority").count()
    salted = salted_join(li, orders, on=["l_orderkey"], salt=4).groupBy(
        "o_orderpriority"
    ).count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # left join with unmatched rows also preserved
    lonely = spark.createDataFrame([(99999999, 1.0)], ["l_orderkey", "l_quantity"])
    left = salted_join(li.union(lonely), orders, on=["l_orderkey"], how="left")
    assert left.filter("l_orderkey = 99999999").count() == 1


def test_salted_groupby_equals_plain(spark):
    from pyspark.sql import functions as F

    from dagster_etl_spark.operators.skew import salted_groupby
    from dagster_etl_spark.sources.fixtures import load_table

    li = load_table(spark, SF_SMALL, "lineitem")
    plain = {
        r.l_linestatus: round(r.s, 6)
        for r in li.groupBy("l_linestatus").agg(F.sum("l_quantity").alias("s")).collect()
    }
    salted = {
        r.l_linestatus: round(r.sum_l_quantity, 6)
        for r in salted_groupby(li, ["l_linestatus"], "l_quantity", salt=8).collect()
    }
    assert plain == salted


def test_skewed_keys_and_approx_distinct(spark):
    from pyspark.sql import functions as F

    from dagster_etl_spark.operators.skew import skewed_keys
    from dagster_etl_spark.operators.wip import wip_aggregate
    from dagster_etl_spark.sources.fixtures import load_table

    li = load_table(spark, SF_SMALL, "lineitem")
    # default path samples (no unconditional full scan); the planted-hot
    # key must still surface, and a generous sample must agree
    hot = skewed_keys(li, ["l_returnflag"], min_share=0.2, sample_fraction=0.5)
    assert "N" in {r.l_returnflag for r in hot.collect()}  # ~half the rows
    exact_hot = skewed_keys(li, ["l_returnflag"], min_share=0.2, sample_fraction=None)
    assert "N" in {r.l_returnflag for r in exact_hot.collect()}

    exact = wip_aggregate(li, group_cols=("l_linestatus",), qty_col="l_quantity",
                          lot_col="l_orderkey", status_col=None)
    approx = wip_aggregate(li, group_cols=("l_linestatus",), qty_col="l_quantity",
                           lot_col="l_orderkey", status_col=None, approx_distinct=True)
    e = {r.l_linestatus: r.lot_count for r in exact.collect()}
    a = {r.l_linestatus: r.lot_count for r in approx.collect()}
    for k in e:
        assert abs(a[k] - e[k]) / e[k] < 0.05  # HLL default rsd
