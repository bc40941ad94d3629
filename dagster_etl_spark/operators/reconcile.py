"""Table reconciliation — key-level diff of two relations by row
content hash (the migration/backfill verification primitive: "did the
rewrite/copy produce the same table?").

Complements the partition-level backfill reconciliation
(orchestration/partitions.py:64): that finds MISSING partitions cheaply
from listings; this finds row-level drift inside partitions the
listings can't see (reference analog: the manual COUNT/spot-check
queries around etl loads — here it's one distributed full-outer join).

Scale shape: each side reduces to (key, hash) before the join — the
shuffle carries two BIGINT-ish columns per row regardless of table
width, and the join is hash-partitioned on the key. Run per partition
(compose with lake.read_partition) to bound any one reconciliation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def row_digest(df: DataFrame, keys: Sequence[str], alias: str = "row_hash"):
    """md5 over the canonical rendering of all non-key columns (sorted
    by name, null-tagged so NULL != 'null' != empty string)."""
    value_cols = sorted(c for c in df.columns if c not in set(keys))
    parts = [
        F.coalesce(F.concat(F.lit("v:"), F.col(c).cast("string")), F.lit("null"))
        for c in value_cols
    ]
    return F.md5(F.concat_ws("\x1f", *parts)).alias(alias)


def table_diff(left: DataFrame, right: DataFrame, keys: Sequence[str]) -> DataFrame:
    """(keys..., status) for every key where the sides disagree:
    ``missing_right`` (only in left), ``missing_left`` (only in right),
    ``different`` (present in both, value hash differs). Matching rows
    produce no output — the result size is the drift, not the data.
    Assumes keys are unique per side (pre-aggregate or dedupe first if
    not)."""
    keys = list(keys)
    lh = left.select(*keys, row_digest(left, keys, "_lh"))
    rh = right.select(*keys, row_digest(right, keys, "_rh"))
    joined = lh.join(rh, on=keys, how="full_outer")
    status = (
        F.when(F.col("_rh").isNull(), F.lit("missing_right"))
        .when(F.col("_lh").isNull(), F.lit("missing_left"))
        .when(F.col("_lh") != F.col("_rh"), F.lit("different"))
    )
    return (
        joined.select(*keys, status.alias("status"))
        .filter(F.col("status").isNotNull())
    )
