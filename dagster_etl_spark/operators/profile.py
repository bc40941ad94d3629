"""Profiling operators — SURVEY §2 P11 (preview) and P12 (null
profiling), plus a long-form null profile that is oracle-checkable.

Reference: etl/factories/asset_factory.py:182-192 — ``df.head(20)``
markdown preview and ``df.isnull().sum()`` per-column null counts
emitted as asset metadata."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def preview(df: DataFrame, n: int = 20) -> list[dict]:
    """P11: bounded head sample for UI metadata — the only collect the
    engine performs outside final results, and it is LIMIT-pushed."""
    return [r.asDict() for r in df.limit(n).collect()]


def null_counts(df: DataFrame) -> dict[str, int]:
    """P12: one pass, all columns — a single agg of conditional counts
    (the reference's isnull().sum() is also one pass; at 100 TB ours is
    a map-side-combined scan with no shuffle of data rows)."""
    if not df.columns:
        return {}
    row = df.agg(
        *[
            F.sum(F.col(c).isNull().cast("long")).alias(c)
            for c in df.columns
        ]
    ).collect()[0]
    return {c: int(row[c] or 0) for c in df.columns}


def null_profile(df: DataFrame) -> DataFrame:
    """Long-form (column, n_nulls, n_rows) profile as a DataFrame —
    same single-pass agg, unpivoted via stack() so it is SQL-oracle
    comparable and composable downstream."""
    cols = df.columns
    agg = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in cols],
    )
    pairs = ", ".join(f"'{c}', coalesce(`{c}`, 0)" for c in cols)
    return agg.selectExpr(
        f"stack({len(cols)}, {pairs}) AS (column_name, n_nulls)", "__n AS n_rows"
    )
