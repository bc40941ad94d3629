"""Structured logging for the engine — the analog of the reference's
ETL logging utility (reference: etl/utils/logging.py:1-176: a
component logger with a plain-formatter fallback, key=value context
appended to every message, and stage convenience methods
log_extract_start/complete, log_transform_*, log_load_*,
log_validation_result, log_error).

Engine-side design:

* **JSON lines, not "k=v | k=v" strings** — each event is one JSON
  object (ts, level, component, message, + structured fields), so the
  run-log export and any log shipper parse it without regexes;
* **bound context** — ``bind()`` returns a child logger carrying
  run/tenant/partition fields on every subsequent event, the
  per-component pattern the reference approximates by passing
  job_name/partition_date into every call;
* **RunContext bridge** — a logger bound to a
  :class:`~dagster_etl_spark.orchestration.pipeline.RunContext` feeds
  each stage event into ``ctx.record(...)`` with the exact
  RUN_EVENT_SCHEMA field names, so the observability rollups
  (run_events_df / step_duration_rollup / failure_rollup) consume
  logged runs unchanged.

Driver-side only: executors never log through this (logging from a UDF
would serialize the logger); the pipeline runner logs around Spark
actions, which is where stage boundaries live anyway.
"""

from __future__ import annotations

import json
import logging
import sys
import time
from typing import Any

from dagster_etl_spark.orchestration.pipeline import RunContext

_ROOT_NAME = "dagster_etl_spark"


class JsonLineFormatter(logging.Formatter):
    """One JSON object per record: stable keys first (ts, level,
    component, message), then any structured fields attached via the
    ``fields`` extra. Non-serializable values degrade to ``repr``."""

    def format(self, record: logging.LogRecord) -> str:
        out: dict[str, Any] = {
            "ts": round(record.created, 6),
            "level": record.levelname.lower(),
            "component": record.name.removeprefix(_ROOT_NAME + "."),
            "message": record.getMessage(),
        }
        out.update(getattr(record, "fields", {}))
        if record.exc_info and record.exc_info[1] is not None:
            out.setdefault("error_type", type(record.exc_info[1]).__name__)
            out.setdefault("error", str(record.exc_info[1]))
        return json.dumps(out, default=repr)


def configure(stream=None, level: int = logging.INFO) -> logging.Logger:
    """Install the JSON handler on the engine's root logger (idempotent
    — reconfiguring replaces the previous engine handler, never stacks
    a second one; other libraries' logging is untouched)."""
    root = logging.getLogger(_ROOT_NAME)
    for h in list(root.handlers):
        root.removeHandler(h)
    handler = logging.StreamHandler(stream or sys.stderr)
    handler.setFormatter(JsonLineFormatter())
    root.addHandler(handler)
    root.setLevel(level)
    root.propagate = False
    return root


class EtlLogger:
    """Component logger with bound context fields and the reference's
    stage-event vocabulary. ``bind(run_ctx=...)`` additionally mirrors
    stage events into a RunContext for the observability rollups."""

    def __init__(
        self,
        component: str,
        fields: dict[str, Any] | None = None,
        run_ctx: RunContext | None = None,
    ):
        self._component = component
        self._fields = dict(fields or {})
        self._run_ctx = run_ctx
        self._logger = logging.getLogger(f"{_ROOT_NAME}.{component}")

    def bind(self, run_ctx: RunContext | None = None, **fields: Any) -> "EtlLogger":
        """Child logger carrying additional permanent fields (tenant,
        pipeline, partition_date, run_id, ...)."""
        merged = {**self._fields, **fields}
        return EtlLogger(self._component, merged, run_ctx or self._run_ctx)

    # -- levels ---------------------------------------------------------------

    def _log(self, level: int, message: str, **fields: Any) -> None:
        merged = {**self._fields, **fields}
        self._logger.log(level, message, extra={"fields": merged})

    def debug(self, message: str, **fields: Any) -> None:
        self._log(logging.DEBUG, message, **fields)

    def info(self, message: str, **fields: Any) -> None:
        self._log(logging.INFO, message, **fields)

    def warning(self, message: str, **fields: Any) -> None:
        self._log(logging.WARNING, message, **fields)

    def error(self, message: str, **fields: Any) -> None:
        self._log(logging.ERROR, message, **fields)

    # -- stage events (reference: etl/utils/logging.py:70-176) ----------------

    def _stage(
        self,
        stage: str,
        status: str,
        message: str,
        level: int = logging.INFO,
        **fields: Any,
    ) -> None:
        self._log(level, message, stage=stage, status=status, **fields)
        if self._run_ctx is not None:
            ctx_fields = {**self._fields, **fields}
            self._run_ctx.record(
                stage=stage,
                status=status,
                **{
                    k: v
                    for k, v in ctx_fields.items()
                    if k in ("tenant", "pipeline", "rows", "elapsed_sec", "error")
                },
            )

    def stage_start(self, stage: str, **fields: Any) -> None:
        self._stage(stage, "start", f"{stage} started", **fields)

    def stage_complete(
        self, stage: str, rows: int | None = None, elapsed_sec: float | None = None,
        **fields: Any,
    ) -> None:
        if rows is not None:
            fields["rows"] = rows
        if elapsed_sec is not None:
            fields["elapsed_sec"] = round(elapsed_sec, 6)
        self._stage(stage, "success", f"{stage} completed", **fields)

    def stage_error(self, stage: str, error: BaseException, **fields: Any) -> None:
        self._stage(
            stage,
            "failure",
            f"{stage} failed",
            level=logging.ERROR,
            error=str(error),
            error_type=type(error).__name__,
            **fields,
        )

    def validation_result(self, passed: bool, **summary: Any) -> None:
        self._stage(
            "validate",
            "success" if passed else "failure",
            "validation completed",
            level=logging.INFO if passed else logging.WARNING,
            passed=passed,
            **summary,
        )

    def timed_stage(self, stage: str, **fields: Any) -> "_TimedStage":
        """``with log.timed_stage("transform", rows_of=df): ...`` —
        start/complete/error events with wall-clock duration."""
        return _TimedStage(self, stage, fields)


class _TimedStage:
    def __init__(self, log: EtlLogger, stage: str, fields: dict[str, Any]):
        self._log, self._stage, self._fields = log, stage, fields
        self.rows: int | None = None  # caller may set before exit

    def __enter__(self) -> "_TimedStage":
        self._t0 = time.time()
        self._log.stage_start(self._stage, **self._fields)
        return self

    def __exit__(self, exc_type, exc, tb) -> bool:
        elapsed = time.time() - self._t0
        if exc is None:
            self._log.stage_complete(
                self._stage, rows=self.rows, elapsed_sec=elapsed, **self._fields
            )
        else:
            self._log.stage_error(self._stage, exc, **self._fields)
        return False


def get_logger(component: str, **fields: Any) -> EtlLogger:
    """Per-component entry point, mirroring the reference's module-level
    ``etl_logger`` but namespaced (extract/transform/load/validate each
    get their own logger name under the engine root)."""
    return EtlLogger(component, fields)


def log_records_hook(log: EtlLogger | None = None):
    """The reverse bridge: a ``RunContext`` step hook that emits every
    ``ctx.record(...)`` as a JSON log event, so an existing
    PipelineRunner gains structured logging with zero changes —
    ``RunContext(hooks=[log_records_hook()])``. Failure records log at
    ERROR, everything else at INFO."""
    log = log or get_logger("pipeline")

    def hook(rec: dict[str, Any]) -> None:
        fields = {k: v for k, v in rec.items() if k != "ts"}
        stage = rec.get("stage", "step")
        if rec.get("status") == "failure":
            log.error(f"{stage} failed", **fields)
        else:
            log.info(f"{stage} {rec.get('status', 'event')}", **fields)

    return hook
