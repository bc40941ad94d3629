"""Change-history operators: latest-record-per-key compaction and
SCD2 (slowly-changing-dimension type 2) interval construction.

The reference's upsert keeps only the latest state (delete-then-insert
by key, etl/resources/trino.py:165-225); these operators cover the two
adjacent shapes every warehouse needs next: compacting a CDC/snapshot
feed to its latest rows, and preserving full change history as
validity intervals.

Shuffle profile: both are single-shuffle window plans — partition by
the business key, sort by (ts, tiebreak). SCD2's two window passes
share the same partitioning/ordering, so Catalyst reuses one exchange
and one sort. At 100 TB the key-partitioned shuffle is the unavoidable
minimum for either semantics; no joins, no skew beyond key skew (AQE
handles).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    desc: bool = True,
) -> DataFrame:
    """One row per key: the greatest (ts, tiebreak...) row — CDC
    snapshot compaction / QUALIFY ROW_NUMBER() = 1. ``order_by`` must
    end with a unique tiebreak column for deterministic output."""
    cols = [F.col(c).desc() if desc else F.col(c).asc() for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def scd2_intervals(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Collapse a change feed into SCD2 validity intervals: one row per
    run of identical ``attr_cols`` values per key, with
    ``valid_from`` = first ts of the run and ``valid_to`` = start of
    the next run (NULL = current). Null-safe attribute comparison, so
    NULL attribute values form their own runs.
    """
    keys, tiebreak = list(keys), list(tiebreak)
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak]]
    w = Window.partitionBy(*keys).orderBy(*order)
    lagged = df.select(
        *keys,
        ts_col,
        *tiebreak,
        *attr_cols,
        F.lag(F.col(ts_col)).over(w).alias("_prev_ts"),
        *[F.lag(F.col(c)).over(w).alias(f"_prev_{c}") for c in attr_cols],
    )
    changed = reduce(
        lambda a, b: a | b,
        [~F.col(c).eqNullSafe(F.col(f"_prev_{c}")) for c in attr_cols],
    )
    kept = lagged.filter(F.col("_prev_ts").isNull() | changed)
    # second window over the kept rows: same partitioning + ordering as
    # the first, so the plan reuses the exchange/sort
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return kept.select(
        *keys,
        *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lead(F.col(ts_col)).over(w2).alias("valid_to"),
    )
