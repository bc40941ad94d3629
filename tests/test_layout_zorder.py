"""Z-order clustered writes (plans/layout.py): Morton interleave
correctness and the actual pruning payoff, verified from the written
parquet files' own statistics — per-file min/max spans must be narrow
in BOTH z-columns, where a linear sort bounds only its own column."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest

from dagster_etl_spark.plans.layout import zorder_write, zvalue_expr
from tests.conftest import SF_SMALL


def test_zvalue_interleave_known_bits(spark):
    # a=5 (101), b=3 (011), 3 bits: a's bits land at even positions
    # (1 + 16), b's at odd (2 + 8) -> z = 27
    row = (
        spark.createDataFrame([(5, 3)], "a long, b long")
        .select(zvalue_expr(["a", "b"], bits=3).alias("z"))
        .collect()[0]
    )
    assert row.z == 27
    with pytest.raises(ValueError):
        zvalue_expr(["a"] * 5)


def _file_spans(path: str, cols: list[str]) -> dict[str, list[tuple]]:
    """Per written file: (min, max) of each column from parquet
    metadata only — exactly the stats a scan prunes on."""
    spans: dict[str, list[tuple]] = {c: [] for c in cols}
    for f in sorted(glob.glob(path + "/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        mins = {c: None for c in cols}
        maxs = {c: None for c in cols}
        for rg in range(md.num_row_groups):
            for c in cols:
                st = md.row_group(rg).column(names[c]).statistics
                mins[c] = st.min if mins[c] is None else min(mins[c], st.min)
                maxs[c] = st.max if maxs[c] is None else max(maxs[c], st.max)
        for c in cols:
            spans[c].append((mins[c], maxs[c]))
    return spans


def _avg_span_frac(spans: list[tuple], lo, hi) -> float:
    width = hi - lo
    return sum((b - a) / width for a, b in spans) / len(spans)


def test_zorder_write_bounds_both_columns(spark, tmp_path):
    """lineitem z-ordered by (l_orderkey, l_suppkey) into 16 range
    files: the average per-file min/max span must be well under half
    the domain in BOTH columns. The linear-sort control bounds only its
    sort column — its secondary column stays at ~full domain per file."""
    from dagster_etl_spark.sources.fixtures import load_table

    li = load_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    lo_o, hi_o, lo_s, hi_s = li.selectExpr(
        "min(l_orderkey)", "max(l_orderkey)", "min(l_suppkey)", "max(l_suppkey)"
    ).first()

    zpath = str(tmp_path / "z")
    zorder_write(li, zpath, zorder_by=["l_orderkey", "l_suppkey"], files=16)
    zspans = _file_spans(zpath, ["l_orderkey", "l_suppkey"])
    z_o = _avg_span_frac(zspans["l_orderkey"], lo_o, hi_o)
    z_s = _avg_span_frac(zspans["l_suppkey"], lo_s, hi_s)

    lpath = str(tmp_path / "linear")
    (
        li.repartitionByRange(16, "l_orderkey")
        .sortWithinPartitions("l_orderkey")
        .write.mode("overwrite")
        .parquet(lpath)
    )
    lspans = _file_spans(lpath, ["l_orderkey", "l_suppkey"])
    l_o = _avg_span_frac(lspans["l_orderkey"], lo_o, hi_o)
    l_s = _avg_span_frac(lspans["l_suppkey"], lo_s, hi_s)

    # z-order: both dimensions bounded
    assert z_o <= 0.5, (z_o, z_s)
    assert z_s <= 0.5, (z_o, z_s)
    # linear sort: its own column razor-thin, the other unbounded
    assert l_o <= 0.15
    assert l_s >= 0.9
    # and z-order's secondary-column spans beat linear's by a wide margin
    assert z_s < l_s / 2

    # row count and values survive the rewrite
    assert spark.read.parquet(zpath).count() == li.count()


def test_zorder_write_single_column_degenerates_to_range_sort(spark, tmp_path):
    from dagster_etl_spark.sources.fixtures import load_table

    li = load_table(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_quantity")
    path = str(tmp_path / "z1")
    zorder_write(li, path, zorder_by=["l_orderkey"], files=8)
    spans = _file_spans(path, ["l_orderkey"])["l_orderkey"]
    lo, hi = min(a for a, _ in spans), max(b for _, b in spans)
    assert _avg_span_frac(spans, lo, hi) <= 0.2


def test_zvalue_bits_overflow_guard():
    """bits * len(cols) > 63 would shift bucket bits into the long sign
    bit (negative z-values sort away from their neighbors) — rejected."""
    import pytest

    from dagster_etl_spark.plans.layout import zvalue_expr

    with pytest.raises(ValueError, match="63"):
        zvalue_expr(["a", "b", "c", "d"], bits=16)
    zvalue_expr(["a", "b", "c"], bits=21)  # 63 exactly: allowed


def test_compact_parquet_preserves_content_and_reduces_files(spark, tmp_path):
    """64 tiny files -> compaction merges them to the byte-target count,
    content row-identical, and an immediate re-run no-ops."""
    from dagster_etl_spark.plans.layout import compact_parquet, compaction_plan

    path = str(tmp_path / "t")
    df = spark.range(10_000).selectExpr("id", "id % 97 AS k", "md5(string(id)) AS v")
    df.repartition(64).write.parquet(path)
    before = sorted((r.id, r.k, r.v) for r in spark.read.parquet(path).collect())
    assert compaction_plan(spark, path)["files"] == 64

    stats = compact_parquet(spark, path, target_file_mb=128)
    assert stats["rewritten"] and stats["target_files"] == 1
    after_plan = compaction_plan(spark, path)
    assert after_plan["files"] == 1
    after = sorted((r.id, r.k, r.v) for r in spark.read.parquet(path).collect())
    assert after == before

    again = compact_parquet(spark, path, target_file_mb=128)
    assert not again["rewritten"]  # idempotent no-op


def test_compact_parquet_respects_target_size(spark, tmp_path):
    """A directory larger than one target file compacts to multiple
    files sized by the byte budget, not to a single giant file."""
    from dagster_etl_spark.plans.layout import compact_parquet, compaction_plan

    path = str(tmp_path / "big")
    spark.range(200_000).selectExpr(
        "id", "md5(string(id)) AS a", "md5(string(id + 1)) AS b"
    ).repartition(40).write.parquet(path)
    total_mb = compaction_plan(spark, path)["bytes"] / 1024 / 1024
    target_mb = max(1, int(total_mb / 3) + 1)
    stats = compact_parquet(spark, path, target_file_mb=target_mb)
    assert stats["rewritten"]
    got = compaction_plan(spark, path)["files"]
    assert 2 <= got <= 4


def test_compact_with_zorder_reclusters(spark, tmp_path):
    """compact_parquet(zorder_by=...) = OPTIMIZE ZORDER analog: one
    rewrite repairs file count AND clusters; content row-identical."""
    from dagster_etl_spark.plans.layout import compact_parquet, compaction_plan

    path = str(tmp_path / "t")
    df = spark.range(20_000).selectExpr(
        "id", "(id * 7919) % 997 AS a", "(id * 104729) % 997 AS b"
    )
    df.repartition(32).write.parquet(path)
    before = sorted((r.id, r.a, r.b) for r in spark.read.parquet(path).collect())

    stats = compact_parquet(spark, path, target_file_mb=128, zorder_by=["a", "b"])
    assert stats["rewritten"]
    assert compaction_plan(spark, path)["files"] < 32
    after = sorted((r.id, r.a, r.b) for r in spark.read.parquet(path).collect())
    assert after == before
