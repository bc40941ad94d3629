"""Scalar/aggregate helper expressions (SURVEY.md §2.5).

All helpers return Catalyst Column expressions — JVM-side, codegen'd,
no Python UDFs — so they stay on the whole-stage-codegen fast path at
any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money_sum(col: Column | str, alias: str | None = None) -> Column:
    """Order-insensitive exact sum for 2-decimal monetary doubles.

    Summing doubles is non-associative: Spark's partial aggregation
    order differs run-to-run (and from any single-process oracle), so
    raw ``SUM(double)`` is not reproducible at scale. Casting to
    DECIMAL(18,2) first makes the sum exact and order-independent;
    the final cast back to double keeps the public schema simple.
    Mirrors the reference's money columns which are DECIMAL(10,4) at the
    source and float64 in-flight (reference: docker/init-scripts/
    01_create_tables.sql:33-35, etl/utils/parquet.py:15-26).
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast("decimal(18,2)")).cast("double")
    return out.alias(alias) if alias else out


def exact_avg(col: Column | str, alias: str | None = None) -> Column:
    """Reproducible mean: exact decimal sum / count, divided in double."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast("decimal(18,2)")).cast("double") / F.count(c)
    return out.alias(alias) if alias else out


def minutes_between(end: Column | str, start: Column | str) -> Column:
    """Timestamp difference in fractional minutes.

    Reference computes ``(end - start).dt.total_seconds() / 60``
    (reference: etl/common/assets/transfer.py:92-94).
    """
    e = F.col(end) if isinstance(end, str) else end
    s = F.col(start) if isinstance(start, str) else start
    return (F.unix_timestamp(e) - F.unix_timestamp(s)) / F.lit(60.0)


def flag(cond: Column, alias: str | None = None) -> Column:
    """Boolean condition -> 1/0 int (reference: project_01/assets/
    transfer.py:41-42 ``(priority=='HIGH').astype(int)``)."""
    out = F.when(cond, F.lit(1)).otherwise(F.lit(0))
    return out.alias(alias) if alias else out


def count_if(cond: Column, alias: str | None = None) -> Column:
    """Conditional count aggregate (SURVEY A7)."""
    out = F.sum(flag(cond))
    return out.alias(alias) if alias else out


def null_count(col: Column | str, alias: str | None = None) -> Column:
    """Aggregate: number of NULLs in ``col`` (SURVEY P12/A8)."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.isNull().cast("long"))
    return out.alias(alias) if alias else out
