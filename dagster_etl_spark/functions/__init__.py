"""Scalar/aggregate helper expressions (SURVEY.md §2.5).

All helpers return Catalyst Column expressions — JVM-side, codegen'd,
no Python UDFs — so they stay on the whole-stage-codegen fast path at
any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def scaled_long(col: Column | str, scale: int = 2) -> Column:
    """``round(col * 10^scale)`` as BIGINT — the fixed-point form of a
    money/measure double (exact for values with <= ``scale`` decimal
    places; values with more are rounded half-away-from-zero to
    ``scale`` places).

    Implemented as a sign-adjusted ``CAST(x + ±0.5 AS BIGINT)``
    (truncation toward zero) rather than ``F.round``: Spark's double
    ``round`` allocates a BigDecimal per row, which measured 3× slower
    across a 4-sum aggregate at sf0.1. The cast form is branch-only
    codegen and produces the identical integer — equal to DuckDB's
    ``round()`` (half-away-from-zero) for every double, and verified
    row-for-row against ``F.round`` on the fixture data at scales 2
    and 6. Valid while ``|col| * 10^scale < 2^52`` (beyond that the
    +0.5 add can tie-round; such values are already whole doubles) —
    far looser than the int64 SUM bound documented in money_sum.
    """
    c = F.col(col) if isinstance(col, str) else col
    scaled = c * float(10 ** scale)
    return (
        F.when(scaled >= 0, scaled + F.lit(0.5))
        .otherwise(scaled - F.lit(0.5))
        .cast("bigint")
    )


def money_sum(col: Column | str, alias: str | None = None, scale: int = 2) -> Column:
    """Order-insensitive exact sum for fixed-point monetary doubles.

    Summing doubles is non-associative: Spark's partial aggregation
    order differs run-to-run (and from any single-process oracle), so
    raw ``SUM(double)`` is not reproducible at scale. Fixed-point
    BIGINT sums are exact AND stay on the long-backed codegen fast
    path — Spark's SUM over DECIMAL(18,s) accumulates in
    DECIMAL(28,s), which falls back to BigDecimal per row (measured
    4-5x slower at sf0.1). The final ``CAST(sum AS DOUBLE) / 10^s``
    happens in the identical IEEE sequence in the DuckDB oracles
    (:func:`scaled_sum_sql`), so results match bit-for-bit.

    Overflow bound: the per-GROUP scaled sum must fit int64 —
    9.2e18 / 10^scale units (at scale=2, ~9e11 rows per group of
    ~$100k values). Wide-enough groups hold at 100 TB for keyed
    aggregations; for whole-table rollups with a handful of groups,
    pre-aggregate per (group, spark_partition_id()) in BIGINT and
    merge the few partials in DECIMAL(38,0) — exact integer addition
    is associative, so the result is identical.

    Mirrors the reference's money columns which are DECIMAL(10,4) at
    the source and float64 in-flight (reference: docker/init-scripts/
    01_create_tables.sql:33-35, etl/utils/parquet.py:15-26).
    """
    out = F.sum(scaled_long(col, scale)).cast("double") / float(10 ** scale)
    return out.alias(alias) if alias else out


def scaled_sum_sql(expr_sql: str, scale: int = 2) -> str:
    """The SQL twin of :func:`money_sum` — same text parses in Spark
    SQL and DuckDB, and both engines execute the identical op
    sequence: round-to-fixed-point, exact integer sum, one cast to
    double, one divide. (DuckDB sums BIGINT into HUGEINT; same exact
    integer, same nearest-double.)"""
    s = 10 ** scale
    return (
        f"CAST(SUM(CAST(round(({expr_sql}) * {s}) AS BIGINT)) AS DOUBLE) / {s}.0"
    )


def twostage_money_sums(
    df,
    keys: list[str],
    money: dict[str, tuple[Column | str, int]],
    count_alias: str = "n_rows",
):
    """Overflow-safe exact fixed-point sums for FEW-GROUP rollups
    (whole-table TPC-H-Q1-style aggregations, where a single group can
    accumulate beyond int64 at extreme scale).

    Stage 1 sums the scaled BIGINTs per (keys, input partition) —
    long-backed codegen over all the data, and a per-partition partial
    can't overflow (int64 holds ~9e9 rows of $100k values per
    partition). Stage 2 merges the few (groups × partitions) partials
    in DECIMAL(38,0) — exact integer addition is associative, so the
    result is IDENTICAL to the single-stage sum (equivalence-tested),
    and the slow decimal path touches only a handful of rows.

    Returns the aggregated DataFrame with one double column per
    ``money`` alias plus ``count_alias``.
    """
    partials = [
        F.sum(scaled_long(c, s)).alias(f"_p_{a}") for a, (c, s) in money.items()
    ]
    stage1 = df.groupBy(*keys, F.spark_partition_id().alias("_pid")).agg(
        *partials, F.count(F.lit(1)).alias("_p_n")
    )
    finals = [
        (
            F.sum(F.col(f"_p_{a}").cast("decimal(38,0)")).cast("double")
            / float(10 ** s)
        ).alias(a)
        for a, (_, s) in money.items()
    ]
    return stage1.groupBy(*keys).agg(*finals, F.sum("_p_n").alias(count_alias))


def exact_avg(col: Column | str, alias: str | None = None, scale: int = 2) -> Column:
    """Reproducible mean: exact fixed-point sum / count, divided in
    double (oracle twin: ``scaled_sum_sql(c) / COUNT(c)``)."""
    c = F.col(col) if isinstance(col, str) else col
    out = (F.sum(scaled_long(c, scale)).cast("double") / float(10 ** scale)) / F.count(c)
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
