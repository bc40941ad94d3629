"""Fluent data-quality validator — SURVEY.md §2.9.

Mirrors the reference's chainable ``DataValidator`` (reference:
etl/utils/validation.py:12-240): rules accumulate, ``validate()``
produces a report with per-rule failed counts and up to 5 failure
samples; failures are non-fatal (caller decides).

Spark-first design: the reference scans the pandas frame once per rule;
here every counting rule compiles to an aggregate expression and ALL of
them run in a **single pass** over the data (one job, one scan — at
100 TB this is N× fewer scans for N rules). Failure samples are fetched
lazily, only for rules that failed, with a bounded ``limit``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class RuleResult:
    rule: str
    column: str | None
    passed: bool
    failed_count: int
    message: str = ""
    samples: list = field(default_factory=list)


@dataclass
class ValidationReport:
    results: list[RuleResult] = field(default_factory=list)

    @property
    def passed(self) -> bool:
        return all(r.passed for r in self.results)

    @property
    def failed_rules(self) -> list[RuleResult]:
        return [r for r in self.results if not r.passed]

    def to_rows(self) -> list[tuple]:
        return [
            (r.rule, r.column or "", bool(r.passed), int(r.failed_count), r.message)
            for r in self.results
        ]


@dataclass
class _Rule:
    name: str
    column: str | None
    # aggregate expressions feeding this rule, keyed by slot name
    aggs: dict[str, Column]
    # slots -> failed_count
    failed_of: Callable[[dict[str, int]], int]
    # row-level failure predicate for sampling (None -> no samples)
    fail_cond: Column | None = None
    # post-hoc pass check overriding failed_count == 0 (row_count bounds)
    passed_of: Callable[[dict[str, int]], bool] | None = None
    message: str = ""


class DataValidator:
    """Chainable rule builder over a Spark DataFrame."""

    def __init__(self, df: DataFrame, sample_limit: int = 5):
        self.df = df
        self.sample_limit = sample_limit
        self._rules: list[_Rule] = []
        self._custom: list[tuple[str, Callable[[DataFrame], tuple[bool, str]]]] = []
        self._n = 0

    def _slot(self) -> str:
        self._n += 1
        return f"v{self._n}"

    # -- rules ------------------------------------------------------------
    def check_not_null(self, column: str) -> "DataValidator":
        s = self._slot()
        cond = F.col(column).isNull()
        self._rules.append(
            _Rule(
                "not_null",
                column,
                {s: F.sum(cond.cast("long"))},
                lambda v, s=s: v[s],
                fail_cond=cond,
            )
        )
        return self

    def check_unique(self, column: str) -> "DataValidator":
        """Count of rows duplicated beyond the first occurrence; like
        pandas ``duplicated().sum()`` nulls count as a value."""
        total, dist, hasnull = self._slot(), self._slot(), self._slot()
        self._rules.append(
            _Rule(
                "unique",
                column,
                {
                    total: F.count(F.lit(1)),
                    dist: F.count_distinct(F.col(column)),
                    hasnull: F.max(F.col(column).isNull().cast("long")),
                },
                lambda v, t=total, d=dist, h=hasnull: v[t] - (v[d] + v[h]),
            )
        )
        return self

    def check_range(self, column: str, min_value=None, max_value=None) -> "DataValidator":
        cond = F.lit(False)
        if min_value is not None:
            cond = cond | (F.col(column) < min_value)
        if max_value is not None:
            cond = cond | (F.col(column) > max_value)
        cond = cond & F.col(column).isNotNull()  # reference checks non-null only
        s = self._slot()
        self._rules.append(
            _Rule(
                "range", column, {s: F.sum(cond.cast("long"))}, lambda v, s=s: v[s],
                fail_cond=cond,
                message=f"[{min_value}, {max_value}]",
            )
        )
        return self

    def check_type(self, column: str, type_name: str) -> "DataValidator":
        """Schema-level check (no scan): Spark simpleString type match."""
        actual = dict(self.df.dtypes).get(column)
        ok = actual == type_name
        self._rules.append(
            _Rule(
                "type", column, {}, lambda v, ok=ok: 0 if ok else 1,
                passed_of=lambda v, ok=ok: ok,
                message=f"expected {type_name}, got {actual}",
            )
        )
        return self

    def check_values_in(self, column: str, allowed: list) -> "DataValidator":
        cond = (~F.col(column).isin(allowed)) & F.col(column).isNotNull()
        s = self._slot()
        self._rules.append(
            _Rule(
                "values_in", column, {s: F.sum(cond.cast("long"))},
                lambda v, s=s: v[s], fail_cond=cond,
            )
        )
        return self

    def check_regex(self, column: str, pattern: str) -> "DataValidator":
        # pandas str.match anchors at start (SURVEY F10)
        anchored = pattern if pattern.startswith("^") else "^" + pattern
        cond = (~F.col(column).rlike(anchored)) & F.col(column).isNotNull()
        s = self._slot()
        self._rules.append(
            _Rule(
                "regex", column, {s: F.sum(cond.cast("long"))},
                lambda v, s=s: v[s], fail_cond=cond, message=anchored,
            )
        )
        return self

    def check_row_count(self, min_rows: int | None = None, max_rows: int | None = None) -> "DataValidator":
        s = self._slot()

        def failed(v, s=s, lo=min_rows, hi=max_rows):
            n = v[s]
            bad = (lo is not None and n < lo) or (hi is not None and n > hi)
            return 1 if bad else 0

        self._rules.append(
            _Rule(
                "row_count", None, {s: F.count(F.lit(1))}, failed,
                message=f"[{min_rows}, {max_rows}]",
            )
        )
        return self

    def check_custom(
        self, rule_name: str, fn: Callable[[DataFrame], tuple[bool, str]]
    ) -> "DataValidator":
        """U4 extension point: arbitrary DataFrame predicate."""
        self._custom.append((rule_name, fn))
        return self

    # -- execution ---------------------------------------------------------
    def validate(self, fail_fast: bool = False, with_samples: bool = True) -> ValidationReport:
        """Run all rules. ``fail_fast`` is accepted for reference-signature
        parity but, exactly like the reference (validation.py:224-240),
        all rules are evaluated."""
        agg_exprs = [
            expr.alias(slot) for r in self._rules for slot, expr in r.aggs.items()
        ]
        values: dict[str, int] = {}
        if agg_exprs:
            row = self.df.agg(*agg_exprs).collect()[0]  # ONE scan for all rules
            values = {k: (row[k] if row[k] is not None else 0) for k in row.asDict()}

        report = ValidationReport()
        for r in self._rules:
            failed = int(r.failed_of(values))
            passed = r.passed_of(values) if r.passed_of else failed == 0
            samples: list = []
            if with_samples and not passed and r.fail_cond is not None and r.column:
                samples = [
                    row[0]
                    for row in self.df.filter(r.fail_cond)
                    .select(r.column)
                    .limit(self.sample_limit)
                    .collect()
                ]
            report.results.append(
                RuleResult(r.name, r.column, bool(passed), failed, r.message, samples)
            )
        for name, fn in self._custom:
            ok, msg = fn(self.df)
            report.results.append(RuleResult(f"custom:{name}", None, bool(ok), 0 if ok else 1, msg))
        return report

    def report_df(self, spark, **kwargs) -> DataFrame:
        """Report as a DataFrame (rule, column, passed, failed_count, message)."""
        from pyspark.sql.types import (
            BooleanType,
            LongType,
            StringType,
            StructField,
            StructType,
        )

        schema = StructType(
            [
                StructField("rule", StringType()),
                StructField("column", StringType()),
                StructField("passed", BooleanType()),
                StructField("failed_count", LongType()),
                StructField("message", StringType()),
            ]
        )
        return spark.createDataFrame(self.validate(**kwargs).to_rows(), schema)
