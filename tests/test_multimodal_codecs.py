"""Real-decode path for multimodal: pure stdlib+numpy PPM/PGM/BMP/WAV
codecs (operators/codecs.py) wired through the mapInPandas operators on
actual bytes — no stub in the loop.

Reference anchor: the reference moves media as opaque files between
stages; decode-on-read is the engine extension (SURVEY §2.8)."""

from __future__ import annotations

import numpy as np
import pytest

from dagster_etl_spark.operators import codecs
from dagster_etl_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_real,
    extract_features,
    resize_media,
)


def _rgb(h, w, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


# -- pure codec round-trips ---------------------------------------------------

def test_ppm_round_trip():
    img = _rgb(5, 3)
    assert np.array_equal(codecs.decode_pnm(codecs.encode_ppm(img)), img)


def test_pgm_round_trip_and_comment_header():
    img = _rgb(4, 6)[:, :, 0]
    payload = codecs.encode_pgm(img)
    assert np.array_equal(codecs.decode_pnm(payload), img)
    # header comments are legal netpbm; decoder must skip them
    commented = b"P5\n# synthetic\n6 4\n255\n" + img.tobytes()
    assert np.array_equal(codecs.decode_pnm(commented), img)


def test_bmp_round_trip_odd_width_padding():
    # w=3 -> 9-byte rows padded to 12: exercises the stride logic
    img = _rgb(4, 3)
    assert np.array_equal(codecs.decode_bmp(codecs.encode_bmp(img)), img)


def test_wav_round_trip_mono_and_stereo():
    mono = (np.arange(64, dtype=np.int16) * 100 - 3200).astype(np.int16)
    got, rate = codecs.decode_wav(codecs.encode_wav(mono, rate=8000))
    assert rate == 8000
    assert np.array_equal(got, mono)
    stereo = np.stack([mono, mono[::-1]], axis=1)
    got2, _ = codecs.decode_wav(codecs.encode_wav(stereo))
    assert np.array_equal(got2, stereo)


def test_sniff_format():
    img = _rgb(2, 2)
    assert codecs.sniff_format(codecs.encode_ppm(img)) == "ppm"
    assert codecs.sniff_format(codecs.encode_bmp(img)) == "bmp"
    assert codecs.sniff_format(codecs.encode_wav(np.zeros(4, np.int16))) == "wav"
    assert codecs.sniff_format(b"\x89PNG\r\n\x1a\nxxxx") == "png"
    assert codecs.sniff_format(b"nonsense") == "unknown"


def test_decode_real_dispatch_and_unsupported():
    img = _rgb(3, 3)
    assert np.array_equal(decode_real(codecs.encode_bmp(img), "image"), img)
    assert np.array_equal(decode_real(codecs.encode_png(img), "image"), img)
    with pytest.raises(NotImplementedError):
        decode_real(b"OggSpretend-opus", "audio")


# -- end-to-end through Spark mapInPandas on real bytes ----------------------

def _media_df(spark, rows):
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


def _meta(media_type, w, h):
    return {
        "media_type": media_type,
        "width": w,
        "height": h,
        "duration_ms": 0,
        "codec": media_type,
    }


def test_resize_media_real_bmp_golden(spark):
    """4x4 golden image through encode_bmp -> Spark binary column ->
    mapInPandas decode+resize: output bytes must equal the
    nearest-neighbor downsample of the true luminance plane."""
    img = _rgb(4, 4, seed=11)
    rows = [(1, bytearray(codecs.encode_bmp(img)), _meta("image", 4, 4))]
    out = (
        resize_media(
            _media_df(spark, rows), out_w=2, out_h=2, decoder=codecs.image_decoder
        )
        .collect()
    )
    assert len(out) == 1 and out[0].width == 2 and out[0].height == 2
    lum = img.mean(axis=2).astype(np.uint8)
    expect = lum[np.ix_([0, 2], [0, 2])]  # (arange(2)*4)//2 = [0, 2]
    got = np.frombuffer(bytes(out[0].media), np.uint8).reshape(2, 2)
    assert np.array_equal(got, expect)


def test_extract_features_real_ppm(spark):
    """Features from REAL pixel values: per-band means of the decoded
    luminance plane, verified against a local numpy recompute."""
    img = _rgb(8, 8, seed=23)
    rows = [(7, bytearray(codecs.encode_ppm(img)), _meta("image", 8, 8))]
    got = (
        extract_features(_media_df(spark, rows), dim=4, decoder=codecs.image_decoder)
        .collect()
    )
    assert len(got) == 1 and got[0].asset_id == 7
    lum = img.mean(axis=2).astype(np.uint8)
    bands = np.array_split(lum.ravel().astype(np.float32), 4)
    expect = [float(b.mean()) for b in bands]
    assert got[0].features == pytest.approx(expect, abs=1e-4)


def test_resize_media_mixed_formats(spark):
    """One batch mixing BMP and PGM payloads — the sniffing decoder
    routes each row by magic bytes inside the same Arrow batch."""
    bmp = _rgb(6, 5, seed=3)
    pgm = _rgb(3, 7, seed=4)[:, :, 1]
    rows = [
        (1, bytearray(codecs.encode_bmp(bmp)), _meta("image", 5, 6)),
        (2, bytearray(codecs.encode_pgm(pgm)), _meta("image", 7, 3)),
    ]
    out = {
        r.asset_id: r
        for r in resize_media(
            _media_df(spark, rows), out_w=3, out_h=3, decoder=codecs.image_decoder
        ).collect()
    }
    assert set(out) == {1, 2}
    for r in out.values():
        assert len(bytes(r.media)) == 9
    lum = bmp.mean(axis=2).astype(np.uint8)
    yi, xi = (np.arange(3) * 6) // 3, (np.arange(3) * 5) // 3
    assert np.array_equal(
        np.frombuffer(bytes(out[1].media), np.uint8).reshape(3, 3), lum[np.ix_(yi, xi)]
    )


def test_synth_real_media_decode_stats(spark):
    """End-to-end real-codec round trip through mapInPandas: synth PPM/
    WAV container bytes -> magic-byte dispatch decode -> integer stats
    matching the closed forms the DuckDB oracle uses."""
    from dagster_etl_spark.operators.multimodal import (
        decode_stats,
        synth_real_media_table,
    )

    docs = spark.createDataFrame([(8,), (5,), (6,), (7,)], "doc_id long")
    out = {r.asset_id: r for r in decode_stats(synth_real_media_table(docs)).collect()}

    img = out[8]  # kind 0: w = 8 + 8 % 9 = 16, h = 8 + 24 % 9 = 14
    w, h = 16, 14
    assert (img.fmt, img.img_w, img.img_h) == ("ppm", w, h)
    assert img.n_values == w * h * 3
    assert img.sum_val == 3 * (h * w * (w - 1) // 2 + w * h * (h - 1) // 2) + 3 * w * h
    assert (img.min_val, img.max_val) == (0, w + h)

    wav = out[5]  # kind 1: n = 50 + 5 % 200 = 55, r = 55 % 7 = 6
    assert (wav.fmt, wav.img_w, wav.img_h) == ("wav", 0, 0)
    assert wav.n_values == 55
    assert wav.sum_val == 6 * 5 // 2 - 3 * 6  # leftover samples 0..5 -> -3
    assert (wav.min_val, wav.max_val) == (-3, 3)

    png = out[6]  # kind 2: w = 8 + 6 % 9 = 14, h = 8 + 18 % 9 = 8
    w, h = 14, 8
    assert (png.fmt, png.img_w, png.img_h) == ("png", w, h)
    assert png.n_values == w * h
    assert png.sum_val == h * w * (w - 1) // 2 + w * h * (h - 1) // 2
    assert (png.min_val, png.max_val) == (0, w + h - 2)

    jpg = out[7]  # kind 3: wb = 1 + 7 % 3 = 2, hb = 1 + 21 % 3 = 1, v0 = 7
    wb, hb, v0 = 2, 1, 7
    assert (jpg.fmt, jpg.img_w, jpg.img_h) == ("jpeg", 8 * wb, 8 * hb)
    assert jpg.n_values == 64 * wb * hb
    assert jpg.sum_val == 64 * (wb * hb * v0 + 7 * hb * (wb * (wb - 1) // 2))
    assert (jpg.min_val, jpg.max_val) == (v0, v0 + 7 * (wb - 1))


# -- PNG ----------------------------------------------------------------------

def _png_with_filters(img: np.ndarray, ftypes) -> bytes:
    """Reference PNG writer applying a GIVEN filter type per row —
    exercises the decoder's Sub/Up/Average/Paeth reversal, which the
    engine's encoder (always filter 0) never produces."""
    import struct as st
    import zlib

    h, w = img.shape[:2]
    ch = 1 if img.ndim == 2 else img.shape[2]
    color = {1: 0, 3: 2, 4: 6}[ch]
    raw = img.reshape(h, w * ch).astype(np.int32)
    lines = bytearray()
    for y, ft in zip(range(h), ftypes):
        cur = raw[y]
        prev = raw[y - 1] if y > 0 else np.zeros(w * ch, np.int32)
        filt = np.empty(w * ch, np.int32)
        for x in range(w * ch):
            a = cur[x - ch] if x >= ch else 0
            b, c = prev[x], (prev[x - ch] if x >= ch else 0)
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filt[x] = (cur[x] - pred) & 0xFF
        lines += bytes([ft]) + filt.astype(np.uint8).tobytes()

    def chunk(tag, body):
        return st.pack(">I", len(body)) + tag + body + st.pack(
            ">I", zlib.crc32(tag + body) & 0xFFFFFFFF
        )

    ihdr = st.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )


def test_png_round_trip_gray_rgb_rgba():
    gray = _rgb(6, 5)[:, :, 0]
    rgb = _rgb(4, 7, seed=11)
    rgba = np.dstack([_rgb(3, 4, seed=13), _rgb(3, 4, seed=17)[:, :, :1]])
    for img in (gray, rgb, rgba):
        assert np.array_equal(codecs.decode_png(codecs.encode_png(img)), img)
    assert codecs.sniff_format(codecs.encode_png(rgb)) == "png"


def test_png_all_filter_types_reverse():
    """Every PNG row filter (None/Sub/Up/Average/Paeth) must reverse to
    the original pixels, gray and RGB."""
    for img in (_rgb(5, 6, seed=23)[:, :, 0], _rgb(5, 6, seed=29)):
        payload = _png_with_filters(img, [0, 1, 2, 3, 4])
        assert np.array_equal(codecs.decode_png(payload), img)


def test_png_unsupported_variants_raise():
    import struct as st
    import zlib

    def png(depth=8, color=0, interlace=0):
        ihdr = st.pack(">IIBBBBB", 2, 2, depth, color, 0, 0, interlace)
        def chunk(tag, body):
            return st.pack(">I", len(body)) + tag + body + st.pack(
                ">I", zlib.crc32(tag + body) & 0xFFFFFFFF
            )
        return b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(
            b"IDAT", zlib.compress(b"\x00\x00\x00" * 2)
        ) + chunk(b"IEND", b"")

    with pytest.raises(ValueError, match="16-bit"):
        codecs.decode_png(png(depth=16))
    with pytest.raises(ValueError, match="palette"):
        codecs.decode_png(png(color=3))
    with pytest.raises(ValueError, match="interlaced"):
        codecs.decode_png(png(interlace=1))


def test_png_nonzero_methods_raise():
    """A PNG declaring a nonstandard compression or filter METHOD (the
    IHDR fields, not the per-row filter type) must error precisely, not
    silently decode as method 0 and emit garbage pixels."""
    import struct as st
    import zlib

    def png(comp=0, filt=0):
        ihdr = st.pack(">IIBBBBB", 2, 2, 8, 0, comp, filt, 0)
        def chunk(tag, body):
            return st.pack(">I", len(body)) + tag + body + st.pack(
                ">I", zlib.crc32(tag + body) & 0xFFFFFFFF
            )
        return b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(
            b"IDAT", zlib.compress(b"\x00\x00\x00" * 2)
        ) + chunk(b"IEND", b"")

    assert codecs.decode_png(png()).shape == (2, 2)  # control: method 0 decodes
    with pytest.raises(ValueError, match="compression method"):
        codecs.decode_png(png(comp=1))
    with pytest.raises(ValueError, match="filter method"):
        codecs.decode_png(png(filt=1))


def test_png_flows_through_spark_operators(spark):
    """PNG payloads decode for real inside mapInPandas: features from
    true pixel values and a golden nearest-neighbor resize."""
    img = _rgb(8, 8, seed=31)
    rows = [(1, codecs.encode_png(img), ("image", 8, 8, 0, "png"))]
    feats = (
        extract_features(_media_df(spark, rows), dim=2, decoder=codecs.image_decoder)
        .collect()
    )
    lum = img.mean(axis=2).astype(np.uint8).ravel().astype(np.float32)
    want = [float(b.mean()) for b in np.array_split(lum, 2)]
    assert feats[0].features == pytest.approx(want, abs=1e-4)

    out = resize_media(
        _media_df(spark, rows), out_w=4, out_h=4, decoder=codecs.image_decoder
    ).collect()[0]
    got = np.frombuffer(out.media, np.uint8).reshape(4, 4)
    lum2 = img.mean(axis=2).astype(np.uint8)
    yi = (np.arange(4) * 8) // 4
    assert np.array_equal(got, lum2[np.ix_(yi, yi)])


def test_audio_stats_skips_non_audio(spark):
    """audio_stats over a mixed media table: only WAV assets produce
    rows, with exact integer energy/amplitude/peak."""
    from dagster_etl_spark.operators.multimodal import (
        audio_stats,
        synth_real_media_table,
    )

    docs = spark.createDataFrame([(4,), (5,), (6,)], "doc_id long")  # only 5 is wav
    rows = audio_stats(synth_real_media_table(docs)).collect()
    assert len(rows) == 1 and rows[0].asset_id == 5
    n = 50 + 5 % 200  # 55 samples, 7 full cycles + remainder 6
    assert rows[0].n_samples == n
    assert rows[0].sum_sq == 28 * (n // 7) + 19
    assert rows[0].sum_abs == 12 * (n // 7) + 9
    assert rows[0].peak == 3


def test_decode_media_malformed_payloads_raise_valueerror_only():
    """Error contract fuzz: truncations, bit flips, and random garbage
    across every supported container must surface only ValueError /
    NotImplementedError — never stdlib internals (struct.error,
    zlib.error, wave's bare RuntimeError, KeyError/OverflowError from
    corrupt JPEG entropy streams). Deterministic corpus; the wide
    randomized sweep (20k payloads) ran at development time."""
    import random

    from dagster_etl_spark.operators.codecs_jpeg import encode_jpeg

    rng = random.Random(99)
    img = (np.arange(16 * 16 * 3) % 256).reshape(16, 16, 3).astype(np.uint8)
    audio = (np.sin(np.arange(400) / 9) * 3000).astype(np.int16)
    valids = [
        codecs.encode_png(img),
        codecs.encode_bmp(img),
        codecs.encode_wav(audio, 8000),
        codecs.encode_ppm(img),
        codecs.encode_pgm(img.mean(axis=2).astype(np.uint8)),
        encode_jpeg(img),
    ]
    payloads = []
    for valid in valids:
        payloads += [valid[:cut] for cut in range(1, len(valid), 17)]
        for _ in range(150):
            b = bytearray(valid)
            for _ in range(rng.randrange(1, 8)):
                b[rng.randrange(len(b))] = rng.randrange(256)
            payloads.append(bytes(b))
    payloads += [
        bytes(rng.randrange(256) for _ in range(rng.randrange(0, 200)))
        for _ in range(200)
    ]
    for p in payloads:
        try:
            codecs.decode_media(p)
        except (ValueError, NotImplementedError):
            pass


def test_decode_operators_on_error_skip(spark):
    """One corrupt payload in a batch: on_error='fail' (default) fails
    the job; on_error='skip' drops just that asset and the batch —
    including a now-empty Arrow batch — still converts cleanly."""
    import pytest as _pytest

    from dagster_etl_spark.operators.codecs_jpeg import encode_jpeg
    from dagster_etl_spark.operators.multimodal import (
        audio_stats,
        decode_stats,
        decode_real,
        resize_media,
    )

    img = (np.arange(8 * 8 * 3) % 256).reshape(8, 8, 3).astype(np.uint8)
    good = encode_jpeg(img)
    corrupt = good[:20]  # truncated mid-header
    rows = [(1, good), (2, corrupt)]
    df = spark.createDataFrame(rows, "asset_id long, media binary")

    with _pytest.raises(Exception):
        decode_stats(df).collect()
    got = decode_stats(df, on_error="skip").collect()
    assert [r.asset_id for r in got] == [1]

    # corrupt WAV: sniffs as wav, then fails to parse
    audio = (np.sin(np.arange(200) / 7) * 1000).astype(np.int16)
    wav = codecs.encode_wav(audio, 8000)
    bad_wav = wav[:30]
    adf = spark.createDataFrame(
        [(1, wav), (2, bad_wav)], "asset_id long, media binary"
    )
    assert [r.asset_id for r in audio_stats(adf, on_error="skip").collect()] == [1]
    with _pytest.raises(Exception):
        audio_stats(adf).collect()

    # resize with the real decoder: the all-corrupt partition yields an
    # empty Arrow batch, which must still satisfy the output schema
    def real_img_decoder(payload, w, h):
        arr = decode_real(payload, "image")
        return arr.mean(axis=2).astype(np.uint8) if arr.ndim == 3 else arr

    rdf = spark.createDataFrame([(2, corrupt)], "asset_id long, media binary")
    rdf = rdf.selectExpr(
        "asset_id", "media", "named_struct('width', 8, 'height', 8) AS meta"
    )
    assert resize_media(rdf, decoder=real_img_decoder, on_error="skip").count() == 0

    with _pytest.raises(ValueError, match="on_error"):
        decode_stats(df, on_error="ignore")


# -- property-based round-trips (hypothesis) ---------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_dims = st.tuples(st.integers(1, 17), st.integers(1, 17))


@settings(max_examples=25, deadline=None)
@given(dims=_dims, seed=st.integers(0, 2**31 - 1))
def test_lossless_image_codecs_round_trip_any_shape(dims, seed):
    """PPM/BMP/PNG are lossless: encode->decode must be the identity
    for arbitrary shapes (odd widths exercise BMP row padding and PNG
    per-row filters) and arbitrary pixel content."""
    h, w = dims
    rng = np.random.default_rng(seed)
    rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, (h, w), dtype=np.uint8)
    assert np.array_equal(codecs.decode_pnm(codecs.encode_ppm(rgb)), rgb)
    assert np.array_equal(codecs.decode_pnm(codecs.encode_pgm(gray)), gray)
    assert np.array_equal(codecs.decode_bmp(codecs.encode_bmp(rgb)), rgb)
    assert np.array_equal(codecs.decode_png(codecs.encode_png(rgb)), rgb)
    assert np.array_equal(codecs.decode_png(codecs.encode_png(gray)), gray)


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 400),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_codec_round_trips_any_pcm16(n, rate, seed):
    rng = np.random.default_rng(seed)
    samples = rng.integers(-(2**15), 2**15, n, dtype=np.int16)
    got, got_rate = codecs.decode_wav(codecs.encode_wav(samples, rate))
    assert got_rate == rate
    assert np.array_equal(got.ravel(), samples)


@settings(max_examples=15, deadline=None)
@given(dims=st.tuples(st.integers(1, 24), st.integers(1, 24)), val=st.integers(0, 255))
def test_jpeg_round_trip_constant_image_near_exact(dims, val):
    """JPEG is lossy, but a constant image is pure DC: round-trip error
    must be within quantization rounding (and shape/dtype exact)."""
    from dagster_etl_spark.operators.codecs_jpeg import decode_jpeg, encode_jpeg

    h, w = dims
    img = np.full((h, w, 3), val, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img))
    assert out.shape == img.shape and out.dtype == np.uint8
    assert int(np.abs(out.astype(int) - int(val)).max()) <= 3


def test_allocation_bomb_guard():
    """A few hundred crafted bytes declaring a multi-gigapixel image
    (huge SOF/IHDR dims) must raise ValueError BEFORE allocating —
    a zlib-bombed PNG or giant JPEG SOF would otherwise OOM an
    executor processing untrusted crawl data."""
    import struct

    from dagster_etl_spark.operators.codecs_jpeg import decode_jpeg, encode_jpeg

    img = np.zeros((8, 8, 3), np.uint8)
    jpg = bytearray(encode_jpeg(img))
    sof = bytes(jpg).find(b"\xff\xc0")
    struct.pack_into(">HH", jpg, sof + 5, 30000, 30000)
    with pytest.raises(ValueError, match="allocation-bomb"):
        decode_jpeg(bytes(jpg))

    png = bytearray(codecs.encode_png(img))
    struct.pack_into(">II", png, 16, 20000, 20000)  # IHDR w, h
    with pytest.raises(ValueError, match="allocation-bomb"):
        codecs.decode_png(bytes(png))

    # override admits legitimately oversized assets / tightens the cap
    with pytest.raises(ValueError, match="allocation-bomb"):
        decode_jpeg(encode_jpeg(img), max_pixels=16)
    assert codecs.decode_png(codecs.encode_png(img), max_pixels=64).shape == (8, 8, 3)

def test_png_zlib_bomb_bounded_inflate():
    """A PNG declaring tiny dims with a huge DEFLATE stream must fail
    fast WITHOUT materializing the inflated bytes: zlib expands up to
    ~1000:1, so an unbounded zlib.decompress of a few-MB payload
    reaches GBs even when the declared 8x8 dims pass the dim guard."""
    import struct
    import zlib

    img = np.zeros((8, 8, 3), np.uint8)
    png = bytes(codecs.encode_png(img))

    def chunk(tag: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body)) + tag + body + b"\x00" * 4

    ihdr_end = 8 + 12 + 13  # magic + IHDR chunk (len+tag+13-byte body+crc)
    bomb = zlib.compress(b"\x00" * 50_000_000, 9)  # ~50 MB from ~50 KB
    crafted = (
        png[:ihdr_end] + chunk(b"IDAT", bomb) + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="inflates past"):
        codecs.decode_png(crafted)

    # an IDAT that inflates short still fails the scanline-size check
    short = png[:ihdr_end] + chunk(b"IDAT", zlib.compress(b"\x00" * 3)) + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="scanline"):
        codecs.decode_png(short)


def test_jpeg_zero_sampling_factor_raises_value_error():
    """SOF with sampling factor 0 (hv byte 0x00) must raise ValueError,
    not ZeroDivisionError, so decode_stats(on_error='skip') survives
    the payload instead of killing the job."""
    from dagster_etl_spark.operators.codecs_jpeg import decode_jpeg, encode_jpeg

    img = np.zeros((8, 8, 3), np.uint8)
    jpg = bytearray(encode_jpeg(img))
    sof = bytes(jpg).find(b"\xff\xc0")
    jpg[sof + 11] = 0x00  # first component's h/v sampling byte
    with pytest.raises(ValueError, match="sampling factor"):
        decode_jpeg(bytes(jpg))
    jpg[sof + 11] = 0x55  # 5x5 — above the T.81 max of 4
    with pytest.raises(ValueError, match="sampling factor"):
        decode_jpeg(bytes(jpg))


def test_png_unterminated_or_trailing_idat_stream_raises():
    """A zlib stream that emits exactly the scanline budget but never
    reaches its final-block terminator (Z_FULL_FLUSH cut), or one with
    bytes after the stream end, must be rejected — both were accepted
    once the bounded-inflate path stopped requiring full-stream decode."""
    import struct as st
    import zlib

    lines = b"\x00\xaa\xbb\x00\xcc\xdd"  # 2x2 gray, filter 0 rows

    def chunk(tag, body):
        return st.pack(">I", len(body)) + tag + body + st.pack(
            ">I", zlib.crc32(tag + body) & 0xFFFFFFFF
        )

    def png(idat):
        ihdr = st.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
        )

    assert codecs.decode_png(png(zlib.compress(lines))).shape == (2, 2)

    co = zlib.compressobj()
    unterminated = co.compress(lines) + co.flush(zlib.Z_FULL_FLUSH)
    with pytest.raises(ValueError, match="truncated"):
        codecs.decode_png(png(unterminated))

    with pytest.raises(ValueError, match="trailing"):
        codecs.decode_png(png(zlib.compress(lines) + b"\x00garbage"))


def test_image_dhash_cross_container_collision(spark):
    """dHash is content-based: the same scene encoded as PPM (RGB) and
    PNG (grayscale gradient) collides, a different scene does not, and
    audio rows are skipped. Hash verified against a hand-packed bit
    computation on the reference image."""
    import pandas as pd

    from dagster_etl_spark.operators.codecs import encode_png, encode_ppm, encode_wav
    from dagster_etl_spark.operators.multimodal import image_dhash

    def gradient(w, h):
        y, x = np.mgrid[0:h, 0:w]
        return (x + y).astype(np.uint8)

    g = gradient(12, 10)
    rows = [
        (1, encode_png(g)),
        (2, encode_ppm(np.repeat(g[:, :, None], 3, axis=2))),  # same scene, RGB PPM
        (3, encode_png(gradient(8, 10))),                      # different width
        (4, encode_png(255 - g)),                              # inverted gradient
        (5, encode_wav((np.arange(40) % 5 - 2).astype(np.int16))),  # audio: skipped
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["asset_id", "media"])
    )
    got = {r.asset_id: r.dhash for r in image_dhash(df).collect()}
    assert set(got) == {1, 2, 3, 4}          # WAV skipped
    assert got[1] == got[2]                  # container-independent
    assert got[1] != got[3]                  # resolution-sensitive
    assert got[4] != got[1]                  # inverted gradient flips bits
    # hand-packed expectation for the 12-wide gradient: per row,
    # bit x = [((x+1)*12)//9 > (x*12)//9] — xi = 0,1,2,4,5,6,8,9,10:
    # every step increases -> all 8 bits set -> rowbits 255 across all
    # 8 rows -> uint64 0xFFFF...FF -> int64 -1
    assert got[1] == -1


def test_image_dhash_rejects_over_64_bits():
    """r10 ADVICE: hash_w*hash_h > 64 would silently wrap in the
    uint64 packing — must fail at entry, before any Spark work."""
    from dagster_etl_spark.operators.multimodal import image_dhash

    with pytest.raises(ValueError, match="must be <= 64"):
        image_dhash(None, hash_w=16, hash_h=8)


def test_audio_fingerprint_semantics(spark):
    """The audio dhash-sibling: same PCM content collides across
    deliveries (mono vs duplicated-channel stereo — the integer
    downmix doubles every window sum, gradient SIGNS unchanged),
    different content diverges, images are skipped (dhash's mirror),
    and n_windows is pinned to the one packed-word size."""
    import pandas as pd

    from dagster_etl_spark.operators.codecs import encode_png, encode_wav
    from dagster_etl_spark.operators.multimodal import audio_fingerprint

    ramp = (np.arange(120) % 11 - 5).astype(np.int16)
    stereo = np.stack([ramp, ramp], axis=1)  # same content, 2 channels
    other = (np.arange(120) % 5 - 2).astype(np.int16)[::-1]
    rows = [
        (1, encode_wav(ramp)),
        (2, encode_wav(stereo)),
        (3, encode_wav(other)),
        (4, encode_png((np.arange(64) % 7).reshape(8, 8).astype(np.uint8))),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["asset_id", "media"]))
    got = {r.asset_id: r.afp for r in audio_fingerprint(df).collect()}
    assert set(got) == {1, 2, 3}            # PNG skipped
    assert got[1] == got[2]                 # delivery-shape independent
    assert got[1] != got[3]                 # content-sensitive

    with pytest.raises(ValueError, match="must be 65"):
        audio_fingerprint(df, n_windows=64)
