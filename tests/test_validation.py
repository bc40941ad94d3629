"""Validator suite tests mirroring reference rule semantics
(reference: etl/utils/validation.py:54-240)."""

from __future__ import annotations

from pyspark.sql import Row

from dagster_etl_spark.validation import DataValidator


def frame(spark):
    return spark.createDataFrame(
        [
            Row(lot_id="L1", qty=10.0, status="IN_PROGRESS", code="AB12"),
            Row(lot_id="L2", qty=-5.0, status="COMPLETED", code="XY34"),
            Row(lot_id="L2", qty=200.0, status="SCRAP", code="bad!"),
            Row(lot_id=None, qty=None, status="COMPLETED", code=None),
            Row(lot_id=None, qty=50.0, status="HOLD", code="CD56"),
        ]
    )


def test_single_pass_rules(spark):
    report = (
        DataValidator(frame(spark))
        .check_not_null("lot_id")
        .check_unique("lot_id")
        .check_range("qty", 0, 100)
        .check_values_in("status", ["IN_PROGRESS", "COMPLETED", "HOLD"])
        .check_regex("code", "[A-Z]{2}[0-9]{2}")
        .check_row_count(1, 10)
        .check_type("qty", "double")
        .validate()
    )
    by_rule = {(r.rule, r.column): r for r in report.results}
    assert by_rule[("not_null", "lot_id")].failed_count == 2
    # L2 twice -> 1 dup; None twice -> 1 dup (pandas counts null dups)
    assert by_rule[("unique", "lot_id")].failed_count == 2
    r = by_rule[("range", "qty")]
    assert r.failed_count == 2 and sorted(r.samples) == [-5.0, 200.0]
    assert by_rule[("values_in", "status")].failed_count == 1  # SCRAP
    assert by_rule[("regex", "code")].failed_count == 1  # 'bad!'; null skipped
    assert by_rule[("row_count", None)].passed
    assert by_rule[("type", "qty")].passed
    assert not report.passed


def test_custom_rule_and_report_df(spark):
    df = frame(spark)
    v = (
        DataValidator(df)
        .check_row_count(min_rows=100)  # fails: only 5 rows
        .check_custom("has_lots", lambda d: (d.count() > 0, "nonempty"))
    )
    report = v.validate()
    assert [r.passed for r in report.results] == [False, True]
    rdf = DataValidator(df).check_not_null("lot_id").report_df(spark)
    row = rdf.collect()[0]
    assert row.rule == "not_null" and row.failed_count == 2 and row.passed is False


def test_all_rules_one_scan(spark):
    """All counting rules must compile into a single agg (one collect)."""
    v = (
        DataValidator(frame(spark))
        .check_not_null("lot_id")
        .check_range("qty", 0, 100)
        .check_values_in("status", ["HOLD"])
    )
    agg_slots = [slot for r in v._rules for slot in r.aggs]
    assert len(agg_slots) == 3  # one counter each, single agg pass
    report = v.validate(with_samples=False)
    assert len(report.results) == 3
