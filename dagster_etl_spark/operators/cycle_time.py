"""Cycle-time statistics — SURVEY.md §2 A3 + F1/F2.

Reference (reference: etl/common/assets/transfer.py:68-126): parse
start/end timestamps of COMPLETED lots, derive cycle minutes, then
groupwise avg/min/max/count.

Determinism note: the reference averages float minutes; float sums are
order-dependent, which breaks reproducibility under distributed partial
aggregation. We aggregate *integer seconds* (exact, associative) and
convert to minutes after the aggregate — same values, any cluster size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_cycle_seconds(
    df: DataFrame,
    start_col: str,
    end_col: str,
    out_col: str = "cycle_seconds",
) -> DataFrame:
    """F1/F2: timestamp difference as exact integer seconds."""
    return df.withColumn(
        out_col, F.unix_timestamp(F.col(end_col)) - F.unix_timestamp(F.col(start_col))
    )


def cycle_time_join_stats(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    end_col: str,
    start_col: str,
    group_cols: Sequence[str],
    fact_filter: str | None = None,
) -> DataFrame:
    """A3 across a fact⋈dim split: cycle end on the fact, cycle start
    and the group key on the dimension (the registered TPC-H-ish
    mapping: l_shipdate vs o_orderdate grouped by o_orderpriority).

    The SCALE shape (r10 probe, probe_cycle_plan_r10.json): both sides
    are filtered and projected to ``(key, epoch-seconds int)`` BEFORE
    the join, so the exchange moves two ints + the group key instead of
    date objects and unpruned rows, and the min/max/sum decompose over
    ``end - start`` directly — no order-grain pre-aggregate (that shape
    lost: the orderkey-grain partial is nearly row-per-group here, all
    shuffle, no reduction).

    Measured x100 (60 M fact rows, interleaved DuckDB pairs):

    * default scan-grain join (previous registered shape): 7.6 s with a
      6.7 s spread — the SMJ sorts both sides;
    * this shape: 2.98 s; with ``dim.hint("SHUFFLE_HASH")``: 2.74 s at
      ±0.09 s — the single-process engine's own strategy (hash build on
      the dim), which Spark's planner only picks over SMJ when nudged;
    * the same shape over tables pre-bucketed+sorted by the join key
      (sources/bucketed.py — bucketing is a property of the INPUT
      layout, not this builder; pass ``spark.table(...)`` frames):
      1.49 s = 1.38x the single process, join planned with ZERO
      exchanges (the one Exchange left is the final 5-group
      aggregate) — the recurring-pipeline layout where the shuffle is
      paid once at write time. One-time bucket write at x100: 25.7 s,
      amortized across every downstream join on the key
      (tests/test_bucketed.py asserts the exchange-free plan and value
      equality for this exact shape).

    The default keeps the planner's choice (broadcast at small dim
    sizes — hinting SHUFFLE_HASH unconditionally would forgo the
    broadcast that wins at bench scale); callers with a dim past the
    broadcast threshold should pass ``dim.hint("SHUFFLE_HASH")``.
    """
    if fact_filter is not None:
        fact = fact.filter(fact_filter)
    # single-string filters/projections: one JVM parse per block instead
    # of one py4j round trip per Column op (identical analyzed trees —
    # see functions module note, r18)
    f = fact.filter(f"`{end_col}` IS NOT NULL").selectExpr(
        f"`{fact_key}` AS __fk",
        f"unix_timestamp(`{end_col}`) AS __end",
    )
    # same NULL-group-key semantics as cycle_time_stats: a NULL key is
    # an unattributable lot, not a group (no-op for the registered
    # mapping — o_orderpriority is never NULL — but generic callers
    # get the sibling's behavior, not a surprise NULL group)
    d = dim.filter(
        " AND ".join(
            f"`{c}` IS NOT NULL" for c in (start_col, *group_cols)
        )
    ).selectExpr(
        f"`{dim_key}` AS __dk",
        f"unix_timestamp(`{start_col}`) AS __start",
        *[f"`{k}`" for k in group_cols],
    )
    j = f.join(d, F.expr("__fk = __dk"))
    cyc = "(`__end` - `__start`)"
    return j.groupBy(*group_cols).agg(
        F.expr(f"CAST(SUM({cyc}) AS DOUBLE) / COUNT(1) / 60.0D").alias(
            "avg_cycle_time"
        ),
        F.expr(f"MIN({cyc}) / 60.0D").alias("min_cycle_time"),
        F.expr(f"MAX({cyc}) / 60.0D").alias("max_cycle_time"),
        F.expr("COUNT(1)").alias("lot_count"),
    )


def cycle_time_stats(
    df: DataFrame,
    group_cols: Sequence[str] = ("process_step", "product_code"),
    start_col: str = "start_time",
    end_col: str = "end_time",
    lot_col: str = "lot_id",
    status_col: str | None = "status",
    completed_value: str = "COMPLETED",
    snapshot_date: str | None = None,
) -> DataFrame:
    """A3: per-group avg/min/max cycle time (minutes) + lot count."""
    if status_col is not None:
        df = df.filter(F.col(status_col) == completed_value)
    df = df.filter(F.col(start_col).isNotNull() & F.col(end_col).isNotNull())
    for k in group_cols:
        df = df.filter(F.col(k).isNotNull())
    df = with_cycle_seconds(df, start_col, end_col)

    out = df.groupBy(*group_cols).agg(
        (F.sum("cycle_seconds").cast("double") / F.count("cycle_seconds") / F.lit(60.0)).alias(
            "avg_cycle_time"
        ),
        (F.min("cycle_seconds") / F.lit(60.0)).alias("min_cycle_time"),
        (F.max("cycle_seconds") / F.lit(60.0)).alias("max_cycle_time"),
        F.count(F.lit(1)).alias("lot_count"),
    )
    if snapshot_date is not None:
        out = out.withColumn("snapshot_date", F.lit(snapshot_date))
    return out
