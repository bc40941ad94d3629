"""Temporal operators the DataFrame API lacks as primitives — as-of
join, bucketed range join, multi-grain rollup — each expressed as a
composition of built-in ops chosen for its shuffle profile at scale
(task brief: prefer compositions over Pandas UDFs where semantics
allow; none of these need Python).

The reference has no temporal joins (SURVEY §2.3 "not present"); these
are engine extensions in the shape its analytics would need next
(latest-config-as-of-lot-start, measurement-in-spec-band, multi-grain
equipment rollups).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from dagster_etl_spark.functions import scaled_long


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_vals: Sequence[str] = (),
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: for every left row, the latest right row of the
    same key with ``right.ts <= left.ts`` (ties match). Unmatched left
    rows keep NULLs — DuckDB ``ASOF LEFT JOIN`` semantics.

    Implementation is the union + ordered-window carry-forward: ONE
    shuffle on (keys), no range explosion, no per-key driver loops —
    the scalable form (a sort-merge interval join would shuffle both
    sides the same way but Spark lacks the operator; the naive
    theta-join alternative is O(L×R) per key).
    """
    keys = list(keys)
    right_vals = list(right_vals) or [
        c for c in right.columns if c not in keys and c != right_ts
    ]
    # carry ONE struct of all right columns, not each column separately:
    # per-column last(ignorenulls) would fill a NULL field of the matched
    # row from an OLDER right row, mixing columns across rows. The struct
    # is non-null iff a right row exists, so NULL fields travel with
    # their row (DuckDB ASOF LEFT JOIN semantics: all columns from the
    # single matched row).
    # (projections are single parsed strings — identical trees to the
    # previous Column-composed form, one py4j round trip per hop; the
    # CASTs use the engine's own type DDL from df.dtypes. r18)
    l_types = dict(left.dtypes)
    r_types = dict(right.dtypes)
    carry_fields = [*right_vals, right_ts]
    # field names backtick-quoted in the DDL (r18 ADVICE: unquoted
    # names with spaces/colons/commas fail the struct-DDL parse that
    # the StructType construction this replaced handled fine)
    r_struct_ddl = (
        "struct<" + ",".join(f"`{c}`:{r_types[c]}" for c in carry_fields) + ">"
    )
    l_rest = [c for c in left.columns if c not in keys and c != left_ts]
    l_tag = left.selectExpr(
        *[f"`{k}`" for k in keys],
        f"`{left_ts}` AS _ts",
        "1 AS _is_left",
        f"CAST(NULL AS {r_struct_ddl}) AS _r",
        *[f"`{c}`" for c in l_rest],
        f"`{left_ts}`",
    )
    r_tag = right.selectExpr(
        *[f"`{k}`" for k in keys],
        f"`{right_ts}` AS _ts",
        "0 AS _is_left",
        "struct(" + ", ".join(f"`{c}`" for c in carry_fields) + ") AS _r",
        *[f"CAST(NULL AS {l_types[c]}) AS `{c}`" for c in l_rest],
        f"CAST(NULL AS {l_types[left_ts]}) AS `{left_ts}`",
    )
    unioned = l_tag.unionByName(r_tag)
    # right rows sort before left rows at equal _ts -> `<=` tie semantics
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_ts"), F.col("_is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_cr")
    )
    out_cols = (
        [f"`{k}`" for k in keys]
        + [f"`{c}`" for c in l_rest]
        + [f"`{left_ts}`"]
        + [f"_cr.`{c}` AS `{c}{suffix}`" for c in carry_fields]
    )
    return carried.filter("_is_left = 1").selectExpr(*out_cols)


def range_join_bands(
    facts: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float | None = None,
) -> DataFrame:
    """Interval join: fact rows matched to bands with
    ``lo <= value < hi``.

    Small band tables broadcast (Catalyst turns the theta join into a
    broadcast nested loop over B rows — fine for B in the hundreds).
    With ``bucket_width`` set (uniform band grid), the join becomes an
    equi-join on the bucket id + residual predicate: shuffle-free on
    the fact side beyond the hash exchange, the 100 TB path.
    """
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    if bucket_width is None:
        return facts.join(F.broadcast(bands), on=cond, how="inner")
    fb = facts.withColumn("_bucket", F.floor(F.col(value_col) / bucket_width))
    # a band spanning multiple buckets registers under each of them
    bb = bands.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width),
                F.floor((F.col(hi_col) - 1e-9) / bucket_width),
            )
        ),
    )
    return fb.join(F.broadcast(bb), on="_bucket").filter(cond).drop("_bucket")


def multigrain_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    grains: Sequence[tuple[str, int]] = (("1h", 3600), ("1d", 86400)),
    group_cols: Sequence[str] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Continuous-aggregate-style rollup at several time grains in ONE
    pass via union of grain-bucketed frames fed to a single aggregate —
    one shuffle total, partial aggregation per grain upstream.

    (GROUPING SETS would express this too; explicit bucketing keeps the
    grain label a plain column and the bucket arithmetic identical in
    the DuckDB oracle.)"""
    parts = []
    for label, secs in grains:
        parts.append(
            events.select(
                F.lit(label).alias("grain"),
                (F.floor(F.unix_timestamp(F.col(ts_col)) / secs) * secs)
                .cast("long")
                .alias("bucket_start"),
                *group_cols,
                F.col(value_col),
            )
        )
    unioned = parts[0]
    for p in parts[1:]:
        unioned = unioned.unionByName(p)
    return unioned.groupBy("grain", "bucket_start", *group_cols).agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(scaled_long(value_col, 6)).cast("double") / 1e6).alias("sum_value"),
    )


def fill_time_gaps(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    grain_sec: int = 900,
) -> DataFrame:
    """Time-series gap filling: bucket observations to a fixed grain,
    generate the DENSE bucket grid per key (min..max), and forward-fill
    missing buckets with the last observed value (gauge semantics).
    Returns (keys..., bucket_start, value_filled, is_gap).

    Determinism: the per-bucket representative is the lexicographic max
    of (ts, tiebreak, value) — a total order, so duplicate timestamps
    can't flip the carried value.

    Scale shape: everything expensive happens at OBSERVATION
    cardinality, behind ONE keys-partitioned exchange and ONE sort
    (r19; guide §2.4 "two operations keyed the same way share one
    exchange"). The per-bucket representative — the lexicographic max
    of (ts, tiebreak, value) — is picked by a window ordered on
    exactly that total order within (keys): the LAST row of each
    bucket run is the max, so a ``lead(bucket)`` boundary test
    replaces the ``max(struct(...))`` aggregate the r18 form used.
    That aggregate planned as a SortAggregate (struct agg buffers are
    not hash-aggregatable), costing two extra observation-cardinality
    sorts plus its own (keys, bucket) exchange before the window's
    (keys) exchange. The fill window then runs over the filtered
    representatives in the SAME partitioning and a compatible sort
    prefix — no second exchange, no re-sort. The dense grid is
    exploded from each observation's run AFTER the windows, streaming
    straight to the consumer (grid rows never hit an exchange — the
    r17 lesson; the grid-join formulation before it shuffled the
    exploded grid twice and went superlinear).
    """
    keys = list(keys)
    bucket = (F.floor(F.unix_timestamp(F.col(ts_col)) / grain_sec) * grain_sec).cast("long")
    # total order within (keys): bucket, then the representative order
    # (ts, tiebreak, value) — identical to the struct max the oracle's
    # MAX({'ts':…}) computes, including NULLS FIRST (both treat a null
    # field as smallest)
    w_all = Window.partitionBy(*keys).orderBy(
        "_bucket", F.col(ts_col).asc(), F.col(tiebreak_col).asc(), F.col(value_col).asc()
    )
    per_bucket = (
        df.withColumn("_bucket", bucket)
        .withColumn("_nxt", F.lead("_bucket").over(w_all))
        # last row of a bucket run == lexicographic (ts, tb, v) max
        .filter(F.col("_nxt").isNull() | (F.col("_nxt") != F.col("_bucket")))
        .select(*keys, "_bucket", F.col(value_col).alias("_v"))
    )
    w = Window.partitionBy(*keys).orderBy("_bucket")
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    runs = per_bucket.select(
        *keys,
        F.col("_bucket").alias("_obs"),
        # carry value at this observation (null value_col observations
        # inherit the previous non-null, exactly like the grid+window
        # formulation and the IGNORE NULLS oracle)
        F.last("_v", ignorenulls=True).over(w_cum).alias("_fill"),
        F.coalesce(
            F.lead("_bucket").over(w) - grain_sec, F.col("_bucket")
        ).alias("_run_end"),
    )
    return runs.select(
        *keys,
        "_fill",
        "_obs",
        F.explode(
            F.sequence(F.col("_obs"), F.col("_run_end"), F.lit(grain_sec))
        ).alias("_bucket"),
    ).select(
        *keys,
        F.col("_bucket").alias("bucket_start"),
        F.col("_fill").alias("value_filled"),
        (F.col("_bucket") != F.col("_obs")).alias("is_gap"),
    )
