"""Unit tests for cycle-time (A3), equipment pivot (A4-A6) and item
master (P4/P6-P9) operators."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from dagster_etl_spark.operators.cycle_time import cycle_time_stats
from dagster_etl_spark.operators.equipment import equipment_utilization
from dagster_etl_spark.operators.item_master import enrich_item_master, stage_item_master

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def test_cycle_time_stats(spark):
    df = spark.createDataFrame(
        [
            Row(lot_id="L1", process_step="S1", product_code="P1",
                start_time=T0, end_time=T0 + dt.timedelta(minutes=30), status="COMPLETED"),
            Row(lot_id="L2", process_step="S1", product_code="P1",
                start_time=T0, end_time=T0 + dt.timedelta(minutes=90), status="COMPLETED"),
            Row(lot_id="L3", process_step="S1", product_code="P1",
                start_time=T0, end_time=None, status="COMPLETED"),  # null end dropped
            Row(lot_id="L4", process_step="S1", product_code="P1",
                start_time=T0, end_time=T0 + dt.timedelta(minutes=5), status="IN_PROGRESS"),
        ]
    )
    r = cycle_time_stats(df).collect()[0]
    assert r.avg_cycle_time == 60.0
    assert r.min_cycle_time == 30.0
    assert r.max_cycle_time == 90.0
    assert r.lot_count == 2


def test_equipment_pivot_missing_type_and_rate(spark):
    df = spark.createDataFrame(
        [
            Row(equipment_id="EQ-1", event_type="RUN", duration_minutes=720.0),
            Row(equipment_id="EQ-1", event_type="IDLE", duration_minutes=100.0),
            Row(equipment_id="EQ-2", event_type="IDLE", duration_minutes=50.0),  # no RUN
        ]
    )
    out = equipment_utilization(df)
    rows = {r.equipment_id: r for r in out.collect()}
    assert rows["EQ-1"].RUN == 720.0 and rows["EQ-1"].IDLE == 100.0 and rows["EQ-1"].DOWN == 0.0
    assert rows["EQ-1"].utilization_rate == 50.0
    assert rows["EQ-2"].RUN == 0.0 and rows["EQ-2"].utilization_rate == 0.0


def test_equipment_pivot_rate_without_run_column(spark):
    df = spark.createDataFrame(
        [Row(equipment_id="EQ-1", event_type="IDLE", duration_minutes=10.0)]
    )
    out = equipment_utilization(df, event_types=("IDLE",), rate_numerator="RUN")
    assert out.collect()[0].utilization_rate == 0.0


def test_item_master_stage_and_enrich(spark):
    df = spark.createDataFrame(
        [
            Row(item_id="A", item_type=None, item_name=None, item_priority=None,
                prod_type="MAKE"),
            Row(item_id="B", item_type="RAW", item_name="bolt", item_priority=3,
                prod_type=""),
            Row(item_id="C", item_type="FG", item_name="kit", item_priority=4,
                prod_type=None),
            Row(item_id="D", item_type="FG", item_name="kit", item_priority=8,
                prod_type="BUY"),
        ]
    )
    out = enrich_item_master(stage_item_master(df))
    rows = {r.item_id: r for r in out.collect()}
    assert rows["A"].item_type == "UNKNOWN" and rows["A"].item_name == ""
    assert rows["A"].item_priority == 0 and rows["A"].priority_category == "LOW"
    assert rows["B"].priority_category == "LOW"
    assert rows["C"].priority_category == "MEDIUM"
    assert rows["D"].priority_category == "HIGH"
    assert rows["A"].is_manufactured is True
    assert rows["B"].is_manufactured is False  # empty string
    assert rows["C"].is_manufactured is False  # null


def test_cycle_time_join_stats_matches_same_table_form(spark):
    """The r10 fact⋈dim split shape must equal cycle_time_stats on the
    pre-joined frame (same groups, same minutes), and drop fact rows
    whose key misses the dim exactly like the inner join it replaces."""
    from dagster_etl_spark.operators.cycle_time import cycle_time_join_stats

    fact = spark.createDataFrame(
        [
            Row(k=1, end_time=T0 + dt.timedelta(minutes=30), st="F"),
            Row(k=1, end_time=T0 + dt.timedelta(minutes=90), st="F"),
            Row(k=2, end_time=T0 + dt.timedelta(minutes=10), st="F"),
            Row(k=2, end_time=T0 + dt.timedelta(minutes=10), st="O"),  # filtered
            Row(k=3, end_time=T0 + dt.timedelta(minutes=5), st="F"),  # no dim row
            Row(k=1, end_time=None, st="F"),  # null end dropped
        ]
    )
    dim = spark.createDataFrame(
        [
            Row(dk=1, start_time=T0, grp="A"),
            Row(dk=2, start_time=T0 + dt.timedelta(minutes=4), grp="B"),
        ]
    )
    got = {
        r.grp: (r.avg_cycle_time, r.min_cycle_time, r.max_cycle_time, r.lot_count)
        for r in cycle_time_join_stats(
            fact=fact, dim=dim, fact_key="k", dim_key="dk",
            end_col="end_time", start_col="start_time",
            group_cols=("grp",), fact_filter="st = 'F'",
        ).collect()
    }
    assert got == {
        "A": (60.0, 30.0, 90.0, 2),
        "B": (6.0, 6.0, 6.0, 1),
    }
