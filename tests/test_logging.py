"""Structured-logging analog of the reference's ETL logging utility
(etl/utils/logging.py:1-176): JSON-line events, bound run/partition
context, stage vocabulary, and the RunContext bridge that the
observability rollups consume unchanged."""

from __future__ import annotations

import io
import json
import logging

import pytest

from dagster_etl_spark.orchestration.logging import configure, get_logger
from dagster_etl_spark.orchestration.pipeline import RunContext


@pytest.fixture()
def capture():
    buf = io.StringIO()
    configure(stream=buf, level=logging.DEBUG)
    yield buf
    configure()  # restore stderr handler


def events(buf):
    return [json.loads(line) for line in buf.getvalue().splitlines()]


def test_json_lines_with_bound_context(capture):
    log = get_logger("extract").bind(
        tenant="t1", pipeline="orders", partition_date="2026-08-13"
    )
    log.info("Extract started", source_table="orders")
    log.warning("slow scan", elapsed_sec=12.5)
    ev = events(capture)
    assert [e["level"] for e in ev] == ["info", "warning"]
    assert ev[0]["component"] == "extract"
    assert ev[0]["message"] == "Extract started"
    # bound context lands on every event, call fields merge over it
    for e in ev:
        assert (e["tenant"], e["pipeline"], e["partition_date"]) == (
            "t1", "orders", "2026-08-13"
        )
    assert ev[0]["source_table"] == "orders"
    assert ev[1]["elapsed_sec"] == 12.5


def test_stage_events_feed_run_context_rollups(spark, capture):
    """Stage events logged through the bridge must produce records the
    observability rollups aggregate without adaptation."""
    from dagster_etl_spark.orchestration.observability import (
        failure_rollup,
        run_events_df,
        step_duration_rollup,
    )

    ctx = RunContext()
    log = get_logger("pipeline").bind(run_ctx=ctx, tenant="t1", pipeline="orders")
    log.stage_start("extract")
    log.stage_complete("extract", rows=100, elapsed_sec=1.5)
    log.stage_complete("transform", rows=90, elapsed_sec=2.5)
    log.stage_error("load", RuntimeError("boom"))

    ev = run_events_df(spark, ctx)
    dur = {
        (r.pipeline, r.stage): (r.n_runs, r.total_rows)
        for r in step_duration_rollup(ev).collect()
    }
    assert dur[("orders", "extract")] == (1, 100)
    assert dur[("orders", "transform")] == (1, 90)
    fails = failure_rollup(ev).collect()
    assert len(fails) == 1 and fails[0].stage == "load"
    # and the same events went to the JSON stream
    statuses = [(e.get("stage"), e.get("status")) for e in events(capture)]
    assert ("load", "failure") in statuses


def test_timed_stage_and_error_fields(capture):
    log = get_logger("pipeline").bind(tenant="t1")
    with pytest.raises(ValueError):
        with log.timed_stage("transform"):
            raise ValueError("bad expr")
    with log.timed_stage("load") as t:
        t.rows = 42
    ev = events(capture)
    err = [e for e in ev if e.get("status") == "failure"][0]
    assert (err["error_type"], err["error"]) == ("ValueError", "bad expr")
    done = [e for e in ev if e.get("status") == "success"][0]
    assert done["rows"] == 42 and done["elapsed_sec"] >= 0


def test_validation_result_levels(capture):
    log = get_logger("validate")
    log.validation_result(True, checks=9, violations=0)
    log.validation_result(False, checks=9, violations=2)
    ev = events(capture)
    assert [e["level"] for e in ev] == ["info", "warning"]
    assert ev[1]["violations"] == 2


def test_configure_idempotent(capture):
    """Reconfiguring must not stack handlers (no duplicate lines)."""
    configure(stream=capture)
    configure(stream=capture)
    get_logger("x").info("once")
    assert len(events(capture)) == 1


def test_log_records_hook_bridges_runner_records(capture):
    """An existing RunContext gains JSON logging with zero runner
    changes: records fan out through the hook as structured events."""
    from dagster_etl_spark.orchestration.logging import log_records_hook

    ctx = RunContext(hooks=[log_records_hook()])
    ctx.record(tenant="t1", pipeline="orders", stage="extract",
               status="success", rows=120, elapsed_sec=0.8)
    ctx.record(tenant="t1", pipeline="orders", stage="run",
               status="failure", error="boom")
    ev = events(capture)
    assert ev[0]["message"] == "extract success"
    assert (ev[0]["rows"], ev[0]["tenant"]) == (120, "t1")
    assert ev[1]["level"] == "error" and ev[1]["error"] == "boom"
