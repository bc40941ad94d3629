"""Baseline JPEG codec (operators/codecs_jpeg.py): pure stdlib+numpy
sequential-DCT encode/decode. Lossy — tests assert small reconstruction
error on smooth content, structural exactness where the math is exact
(flat blocks), and behavioral checks (byte stuffing, quality knob,
unsupported variants). Note the self-consistency caveat: with no
external JPEG library in the container, round trips validate
encoder+decoder against each OTHER plus the original pixels — the
original-pixel comparison is what rules out mirrored-bug pairs."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from dagster_etl_spark.operators import codecs
from dagster_etl_spark.operators.codecs_jpeg import decode_jpeg, encode_jpeg


def _gradient(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return ((x * 3 + y * 2) % 256).astype(np.uint8)


def test_gray_round_trip_close():
    img = _gradient(32, 48)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert np.abs(out.astype(int) - img).mean() < 1.0


def test_rgb_round_trip_close_odd_dims():
    y, x = np.mgrid[0:21, 0:35]  # non-multiple-of-8 dims -> edge padding
    img = np.dstack([(x * 2 + y) % 200, (x + y * 2) % 200, (x * 3) % 200]).astype(
        np.uint8
    )
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 2.0


def test_flat_blocks_exact():
    """A constant image is DC-only: quantization is exact at any
    quality, so the round trip must be bit-perfect."""
    for v in (0, 130, 255):
        img = np.full((17, 23), v, np.uint8)
        assert np.array_equal(decode_jpeg(encode_jpeg(img, quality=60)), img)


def test_noise_survives_byte_stuffing():
    """Dense random content produces 0xFF bytes in the entropy stream;
    the stuffing/unstuffing pair must round-trip without desync (exact
    equality is not expected — only a sane reconstruction)."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(24, 24), dtype=np.uint8)
    payload = encode_jpeg(img, quality=100)
    out = decode_jpeg(payload)
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img).mean() < 20  # q100 noise is rough but bounded


def test_quality_knob_suppresses_high_frequencies():
    """A checkerboard is pure high-frequency energy: low quality must
    lose substantially more of it than high quality — validates the
    DCT/zigzag/quantization direction, not just self-consistency."""
    img = (np.indices((16, 16)).sum(axis=0) % 2 * 255).astype(np.uint8)
    err_hi = np.abs(decode_jpeg(encode_jpeg(img, 95)).astype(int) - img).mean()
    err_lo = np.abs(decode_jpeg(encode_jpeg(img, 10)).astype(int) - img).mean()
    assert err_lo > err_hi * 2
    assert err_hi < 30


def test_unsupported_variants_raise():
    img = _gradient(8, 8)
    payload = bytearray(encode_jpeg(img))
    sof = payload.index(b"\xff\xc0")
    payload[sof + 1] = 0xC2  # rewrite to progressive
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg(bytes(payload))
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"nope")


def test_truncated_payload_raises_value_error():
    """Cutting the payload anywhere must surface as ValueError, never a
    bare IndexError / struct.error from the parsing internals."""
    payload = encode_jpeg(_gradient(16, 16), quality=90)
    for cut in (4, len(payload) // 2, len(payload) - 3):
        with pytest.raises(ValueError):
            decode_jpeg(payload[:cut])


def test_stray_restart_marker_raises_value_error():
    """An RSTn marker inside an entropy-coded block (no DRI declared) is
    a corrupt stream and must raise ValueError, not leak the internal
    _RestartMarker exception type."""
    payload = bytearray(encode_jpeg(_gradient(32, 32), quality=90))
    sos = payload.index(b"\xff\xda")
    (seglen,) = struct.unpack_from(">H", payload, sos + 2)
    scan_start = sos + 2 + seglen
    # plant a restart marker a few bytes into the entropy stream
    payload[scan_start + 4 : scan_start + 4] = b"\xff\xd0"
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg(bytes(payload))


def test_decode_time_linear_in_scan_size():
    """The bit reader masks consumed bits, so decode cost per pixel must
    not grow with image size (the unmasked accumulator was quadratic)."""
    import time

    rng = np.random.default_rng(7)
    small = rng.integers(0, 256, size=(32, 32), dtype=np.uint8)
    big = rng.integers(0, 256, size=(128, 128), dtype=np.uint8)  # 16x pixels
    p_small, p_big = encode_jpeg(small, 95), encode_jpeg(big, 95)
    t0 = time.perf_counter()
    decode_jpeg(p_small)
    t_small = time.perf_counter() - t0
    t0 = time.perf_counter()
    decode_jpeg(p_big)
    t_big = time.perf_counter() - t0
    # linear scaling => ~16x; quadratic in scan bytes => ~256x. Allow a
    # wide margin for interpreter noise.
    assert t_big < t_small * 80


def test_dqt_emitted_in_zigzag_order():
    """The DQT segment must carry the quality-scaled Annex-K table in
    zigzag order (the wire format), so position 1 of the stream is the
    natural-order [0,1] entry — for luma quality-50 exactly 11 — and a
    conforming decoder sees libjpeg's frequency weighting."""
    from dagster_etl_spark.operators.codecs_jpeg import QUANT_LUMA, ZIGZAG

    payload = encode_jpeg(_gradient(8, 8), quality=50)  # scale factor 1.0
    dqt = payload.index(b"\xff\xdb")
    table = payload[dqt + 5 : dqt + 5 + 64]  # skip marker, length, Pq/Tq
    assert list(table) == [int(QUANT_LUMA[z]) for z in ZIGZAG]


def test_dispatch_through_decode_media():
    img = _gradient(16, 16)
    payload = encode_jpeg(img, quality=95)
    assert codecs.sniff_format(payload) == "jpeg"
    out = codecs.decode_media(payload)
    assert np.abs(out.astype(int) - img).mean() < 1.0


def test_jpeg_flows_through_spark_operators(spark):
    """JPEG bytes decode inside mapInPandas via the generic image
    decoder: features from true (reconstructed) pixels."""
    from dagster_etl_spark.operators.multimodal import extract_features

    img = np.dstack([_gradient(8, 8)] * 3)
    rows = [(1, encode_jpeg(img, quality=95), ("image", 8, 8, 0, "jpeg"))]
    from tests.test_multimodal_codecs import _media_df

    feats = extract_features(
        _media_df(spark, rows), dim=2, decoder=codecs.image_decoder
    ).collect()
    lum = img.mean(axis=2).astype(np.uint8).ravel().astype(np.float32)
    want = [float(b.mean()) for b in np.array_split(lum, 2)]
    assert feats[0].features == pytest.approx(want, abs=2.0)
