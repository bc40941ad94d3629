"""Bucketed co-located join test: the join of two tables bucketed on
the join key must plan with ZERO shuffle exchanges, and produce the
same result as the plain join."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture()
def bucket_env(spark, tmp_path):
    # broadcast off so the bucketed join is what gets planned; restore
    # the SESSION's value, not a hardcoded one (the engine threshold is
    # a measured decision pinned by test_session_conf_contract)
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    for t in ("li_b", "ord_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_exchange(bucket_env):
    from pyspark.sql import functions as F

    from dagster_etl_spark.sources.bucketed import (
        bucketed_join,
        exchanges_in_plan,
        write_bucketed,
    )
    from dagster_etl_spark.sources.fixtures import load_table

    spark = bucket_env
    li = load_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, SF_SMALL, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )

    plain = li.join(orders, on="l_orderkey")
    assert exchanges_in_plan(plain) >= 2  # both sides shuffle on the key

    write_bucketed(li, "li_b", ["l_orderkey"], num_buckets=4, sort_cols=["l_orderkey"])
    write_bucketed(orders, "ord_b", ["l_orderkey"], num_buckets=4, sort_cols=["l_orderkey"])
    co = bucketed_join(spark, "li_b", "ord_b", on=["l_orderkey"])
    assert exchanges_in_plan(co) == 0  # co-located: no shuffle either side

    # same result as the plain join
    a = plain.groupBy("o_orderpriority").count().collect()
    b = co.groupBy("o_orderpriority").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
