"""Multimodal operator tests: schema contracts, decode-stub
determinism, resize output shape, and frame-sample multiplicity."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def media(spark):
    from dagster_etl_spark.operators.multimodal import synth_media_table
    from dagster_etl_spark.sources.fixtures import load_table

    return synth_media_table(load_table(spark, SF_SMALL, "documents")).cache()


def test_media_schema_and_metadata(media):
    from dagster_etl_spark.operators.multimodal import media_metadata

    assert dict(media.dtypes)["media"] == "binary"
    assert dict(media.dtypes)["meta"].startswith("struct<media_type:string")
    meta = media_metadata(media)
    rows = meta.collect()
    assert len(rows) == media.count() > 0
    r = next(x for x in rows if x.asset_id == 0)
    assert r.media_type == "image" and r.codec == "png"
    assert r.n_bytes > 0 and len(r.payload_md5) == 32


def test_metadata_prunes_payload(media, tmp_path):
    """Reading only the meta struct must not read payload bytes from
    parquet (ReadSchema excludes the media column)."""
    path = str(tmp_path / "media_parquet")
    media.write.parquet(path)
    spark = media.sparkSession
    plan = (
        spark.read.parquet(path)
        .select("asset_id", "meta.media_type")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    read_schema = plan.split("ReadSchema")[1][:200]
    assert "media:binary" not in read_schema  # payload column not read
    assert "media_type" in read_schema  # nested struct field IS pruned-in


def test_feature_extraction_deterministic(media):
    from dagster_etl_spark.operators.multimodal import extract_features

    f1 = {r.asset_id: r.features for r in extract_features(media, dim=16).collect()}
    f2 = {r.asset_id: r.features for r in extract_features(media, dim=16).collect()}
    assert f1 == f2
    assert all(len(v) == 16 for v in f1.values())
    assert len({tuple(v) for v in f1.values()}) > 1  # not a constant stub


def test_resize_shapes(media):
    from dagster_etl_spark.operators.multimodal import resize_media

    out = resize_media(media.limit(20), out_w=16, out_h=8).collect()
    assert len(out) == 20
    for r in out:
        assert len(r.media) == 16 * 8
        assert (r.width, r.height) == (16, 8)


def test_frame_sample_multiplicity(media):
    from pyspark.sql import functions as F

    from dagster_etl_spark.operators.multimodal import sample_frames

    frames = sample_frames(media, every_ms=5000)
    per_asset = frames.groupBy("asset_id").count()
    joined = per_asset.join(
        media.selectExpr("asset_id", "meta.duration_ms AS d", "meta.media_type AS t"),
        on="asset_id",
    ).collect()
    assert len(joined) > 0
    for r in joined:
        assert r.t == "video"
        assert r["count"] == -(-r.d // 5000)
    # frame payloads are real bytes with the stub slice contract
    f0 = frames.filter("frame_idx = 0").limit(1).collect()[0]
    assert isinstance(f0.frame, (bytes, bytearray)) and len(f0.frame) > 0


def test_decode_real_is_documented_stub():
    from dagster_etl_spark.operators.multimodal import decode_real

    with pytest.raises(NotImplementedError):
        decode_real(b"xx", "image")


def test_stub_features_contract():
    """Pin the stub feature definition: feature j == mean of the 16
    digest bytes of md5(payload || ':' || j) — the exact arithmetic the
    media_features DuckDB oracle reproduces."""
    import hashlib

    from dagster_etl_spark.operators.multimodal import stub_features

    payload = "hello world".encode()
    got = stub_features(payload, 4)
    want = [
        sum(hashlib.md5(payload + f":{j}".encode()).digest()) / 16.0
        for j in range(4)
    ]
    assert got == want
    # exactly representable in float32 (what the Arrow schema carries)
    import numpy as np

    assert all(float(np.float32(v)) == v for v in got)
