"""Multimodal (image/audio/video) column support for training-data
pipelines: opaque ``binary`` payloads + a typed metadata struct, with
decode / feature-extraction / resize / frame-sampling as Arrow-batched
``mapInPandas`` operators.

Spark-side design (all real and tested):
* payloads are ``BinaryType`` columns — never strings — so Tungsten
  stores them compactly and Arrow ships them zero-copy to Python;
* metadata is a ``struct`` column (media_type, width, height,
  duration_ms, codec) so pruning/pushdown work on it without touching
  payload bytes (project the struct, Parquet never reads the blobs);
* Python work happens in ``mapInPandas`` over Arrow record batches —
  per-batch vectorized, never per-row UDF calls;
* 1→N expansion (frame sampling) yields multiple output rows per input
  row from the same iterator, no explode of materialized arrays.

Decode layer, two tiers:
* REAL — PPM/PGM/BMP images and PCM WAV audio decode for real via the
  pure stdlib+numpy codecs in :mod:`.codecs` (``decode_real`` /
  ``codecs.image_decoder``), exercised end-to-end through
  ``mapInPandas`` in tests on actual bytes;
* STUB — for codec-library formats (opus/av1; ffmpeg et al. are
  not in this container) ``decode_stub`` derives deterministic fake
  pixels from the payload, keeping features SQL-reproducible for the
  DuckDB oracle. Schemas, batch iteration, output shapes and row
  multiplicity are identical on both tiers — the real 100 TB plumbing.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dagster_etl_spark.plans.layout import spread as df_spread
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

META_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("codec", StringType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media", BinaryType()),
        StructField("meta", META_SCHEMA),
    ]
)

_TYPES = ("image", "audio", "video")
_CODECS = ("png", "opus", "av1")


def synth_media_table(documents: DataFrame) -> DataFrame:
    """Deterministic multimodal table from the documents fixture: the
    text's UTF-8 bytes become the opaque payload (any bytes do — the
    engine never interprets them outside decode), metadata derives from
    doc_id. This is the fixture adapter, not a toy schema: the operators
    below only see (asset_id, media, meta)."""
    type_expr = (
        f"CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN '{_TYPES[0]}' "
        f"WHEN 1 THEN '{_TYPES[1]}' ELSE '{_TYPES[2]}' END"
    )
    codec_expr = (
        f"CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN '{_CODECS[0]}' "
        f"WHEN 1 THEN '{_CODECS[1]}' ELSE '{_CODECS[2]}' END"
    )
    return documents.selectExpr(
        "doc_id AS asset_id",
        "CAST(text AS BINARY) AS media",
        f"""named_struct(
            'media_type', {type_expr},
            'width', CAST(64 + doc_id % 448 AS INT),
            'height', CAST(64 + (doc_id * 7) % 448 AS INT),
            'duration_ms', CAST(1000 + (doc_id * 37) % 59000 AS BIGINT),
            'codec', {codec_expr}
        ) AS meta""",
    )


def media_metadata(df: DataFrame) -> DataFrame:
    """Metadata + payload stats without decoding: struct projection and
    JVM-side byte ops only. At 100 TB this plan reads the meta struct
    and payload lengths from Parquet column chunks — decode cost zero."""
    return df.select(
        "asset_id",
        F.col("meta.media_type").alias("media_type"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.duration_ms").alias("duration_ms"),
        F.col("meta.codec").alias("codec"),
        F.length("media").alias("n_bytes"),
        F.md5("media").alias("payload_md5"),
    )


def synth_real_media_table(documents: DataFrame) -> DataFrame:
    """Deterministic REAL-codec media table from the documents fixture:
    doc_id % 4 picks the container — 0: binary PPM (pixel[y, x, c] =
    x + y + c, dims 8..16 from doc_id), 1: PCM16 WAV (sample[i] =
    i % 7 - 3, 50..249 samples), 2: non-interlaced grayscale PNG
    (pixel[y, x] = x + y, DEFLATE IDAT), 3: baseline JPEG at quality
    100 with per-8x8-block-constant pixels (value = doc_id % 200 +
    7*bx + 13*by < 256) — DC-only blocks with unit quantization make
    the lossy codec BIT-EXACT, so even JPEG joins the closed-form
    oracle. The payloads are genuine container bytes produced by
    :mod:`.codecs` / :mod:`.codecs_jpeg` encoders, so downstream
    operators exercise the full parse-header/inflate/unfilter/
    entropy-decode path — while every derived statistic stays a closed
    form of doc_id for the DuckDB oracle (see queries_multimodal).
    Arrow-batched mapInPandas, same plumbing as every decode operator."""
    from dagster_etl_spark.operators.codecs import encode_png, encode_ppm, encode_wav
    from dagster_etl_spark.operators.codecs_jpeg import encode_jpeg

    schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("media", BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for aid in pdf["doc_id"]:
                aid = int(aid)
                kind = aid % 4
                if kind == 0:
                    w, h = 8 + aid % 9, 8 + (aid * 3) % 9
                    y, x = np.mgrid[0:h, 0:w]
                    img = (x + y)[:, :, None] + np.arange(3)[None, None, :]
                    payloads.append(encode_ppm(img.astype(np.uint8)))
                elif kind == 1:
                    n = 50 + aid % 200
                    payloads.append(
                        encode_wav((np.arange(n) % 7 - 3).astype(np.int16))
                    )
                elif kind == 2:
                    w, h = 8 + aid % 9, 8 + (aid * 3) % 9
                    y, x = np.mgrid[0:h, 0:w]
                    payloads.append(encode_png((x + y).astype(np.uint8)))
                else:
                    wb, hb = 1 + aid % 3, 1 + (aid * 3) % 3
                    by, bx = np.mgrid[0:hb, 0:wb]
                    blocks = (aid % 200 + 7 * bx + 13 * by).astype(np.uint8)
                    img = blocks.repeat(8, axis=0).repeat(8, axis=1)
                    payloads.append(encode_jpeg(img, quality=100))
            yield pd.DataFrame({"asset_id": pdf["doc_id"], "media": payloads})

    return df_spread(documents.select("doc_id")).mapInPandas(run, schema=schema)


def _skip_errors(on_error: str) -> bool:
    """Validate the shared corrupt-payload policy knob. ``"fail"``
    (default) propagates decode errors — one bad asset fails the task,
    the right contract for oracle-checked fixtures. ``"skip"`` drops
    undecodable assets and keeps the batch going — the right contract
    for a 100 TB crawl corpus, where corrupt files are a statistical
    certainty and must not kill a 1000-executor job; callers monitor
    the input-vs-output row-count delta."""
    if on_error not in ("fail", "skip"):
        raise ValueError(f"on_error must be 'fail' or 'skip', got {on_error!r}")
    return on_error == "skip"


def decode_stats(df: DataFrame, on_error: str = "fail") -> DataFrame:
    """REAL decode -> integer content statistics per asset: format (by
    magic bytes), image dims (0 for audio), value count / sum / min /
    max over every decoded pixel or sample. All-integer output keeps the
    contract bit-exact against a SQL oracle — no float summation order
    to worry about. Proves the codec path end-to-end: a wrong header
    parse, row stride, or channel order changes the sums. See
    :func:`_skip_errors` for the ``on_error`` contract."""
    from dagster_etl_spark.operators.codecs import decode_media, sniff_format

    skip = _skip_errors(on_error)

    schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("fmt", StringType()),
            StructField("img_w", IntegerType()),
            StructField("img_h", IntegerType()),
            StructField("n_values", LongType()),
            StructField("sum_val", LongType()),
            StructField("min_val", IntegerType()),
            StructField("max_val", IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["media"]):
                raw = bytes(payload)
                try:
                    arr = decode_media(raw)
                except (ValueError, NotImplementedError):
                    if skip:
                        continue
                    raise
                flat = arr.ravel().astype(np.int64)
                img_w = arr.shape[1] if arr.ndim >= 2 else 0
                img_h = arr.shape[0] if arr.ndim >= 2 else 0
                rows.append(
                    (
                        int(aid),
                        sniff_format(raw),
                        img_w,
                        img_h,
                        flat.size,
                        int(flat.sum()),
                        int(flat.min()),
                        int(flat.max()),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.mapInPandas(run, schema=schema)


def image_dhash(
    df: DataFrame, on_error: str = "fail", hash_w: int = 8, hash_h: int = 8
) -> DataFrame:
    """Perceptual difference-hash (dHash) over REAL decoded pixels:
    decode (magic-byte dispatch) -> integer-sum grayscale (channel SUM,
    not mean — exact in int64 and monotone-equivalent for the gradient
    comparisons) -> nearest-neighbor resize to (hash_w+1) x hash_h ->
    pack the horizontal gradient signs ``g[y, x+1] > g[y, x]`` into a
    64-bit BIGINT (numpy uint64 accumulate, reinterpreted int64).
    Audio payloads (1-D decode) are skipped — dHash is an image
    operator composable over mixed media tables.

    This is the standard image near-dup primitive: assets with equal
    dhash are visual duplicates regardless of container/encoding, so a
    PNG and a PPM rendering of the same scene collide here while no
    byte-level dedup could pair them.
    """
    from dagster_etl_spark.operators.codecs import decode_media

    if hash_w * hash_h > 64:
        # the hash is packed into ONE 64-bit word; more bits would
        # silently wrap in the uint64 shifts below
        raise ValueError(
            f"hash_w * hash_h must be <= 64, got {hash_w}*{hash_h}="
            f"{hash_w * hash_h}"
        )

    skip = _skip_errors(on_error)

    schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("dhash", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for aid, payload in zip(pdf["asset_id"], pdf["media"]):
                try:
                    arr = decode_media(bytes(payload))
                except (ValueError, NotImplementedError):
                    if skip:
                        continue
                    raise
                if arr.ndim < 2:  # audio: not an image
                    continue
                g = (
                    arr.astype(np.int64).sum(axis=2)
                    if arr.ndim == 3
                    else arr.astype(np.int64)
                )
                h, w = g.shape
                yi = (np.arange(hash_h) * h) // hash_h
                xi = (np.arange(hash_w + 1) * w) // (hash_w + 1)
                s = g[np.ix_(yi, xi)]
                bits = (s[:, 1:] > s[:, :-1]).ravel()  # row-major: y*hash_w + x
                weights = np.left_shift(
                    np.uint64(1), np.arange(hash_w * hash_h, dtype=np.uint64)
                )
                u = int(weights[bits].sum(dtype=np.uint64))
                ids.append(int(aid))
                # two's-complement wrap: BIGINT carries the raw 64 bits
                hashes.append(u - (1 << 64) if u >= (1 << 63) else u)
            yield pd.DataFrame(
                {
                    "asset_id": np.asarray(ids, dtype=np.int64),
                    "dhash": np.asarray(hashes, dtype=np.int64),
                }
            )

    return df.mapInPandas(run, schema=schema)


def byte_stats(df: DataFrame, media_col: str = "media") -> DataFrame:
    """Integer stats (count / sum / min / max) over a raw-byte payload
    column — the oracle-checkable fingerprint of any byte-producing
    operator (resize output, extracted frames). Arrow-batched."""
    schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("n_values", LongType()),
            StructField("sum_val", LongType()),
            StructField("min_val", IntegerType()),
            StructField("max_val", IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf[media_col]):
                b = np.frombuffer(bytes(payload), np.uint8).astype(np.int64)
                rows.append(
                    (
                        int(aid),
                        b.size,
                        int(b.sum()),
                        int(b.min()) if b.size else 0,
                        int(b.max()) if b.size else 0,
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.mapInPandas(run, schema=schema)


def audio_stats(df: DataFrame, on_error: str = "fail") -> DataFrame:
    """REAL audio analysis over decoded PCM samples: per asset the
    sample count, integer energy (sum of squares — RMS's numerator),
    integer absolute sum (mean-amplitude numerator) and peak magnitude.
    Integer outputs keep the oracle exact; callers derive RMS/mean in
    whatever float width they want. Non-audio payloads are skipped (0
    output rows), so the operator composes with mixed media tables;
    corrupt WAVs follow ``on_error`` (:func:`_skip_errors`)."""
    from dagster_etl_spark.operators.codecs import decode_wav, sniff_format

    skip = _skip_errors(on_error)

    schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("n_samples", LongType()),
            StructField("sum_sq", LongType()),
            StructField("sum_abs", LongType()),
            StructField("peak", IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["media"]):
                raw = bytes(payload)
                if sniff_format(raw) != "wav":
                    continue
                try:
                    samples = decode_wav(raw)[0].astype(np.int64).ravel()
                except ValueError:
                    if skip:
                        continue
                    raise
                rows.append(
                    (
                        int(aid),
                        samples.size,
                        int((samples * samples).sum()),
                        int(np.abs(samples).sum()),
                        int(np.abs(samples).max()) if samples.size else 0,
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.mapInPandas(run, schema=schema)


# -- decode layer -------------------------------------------------------------

def decode_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decoder: deterministic fake pixels from the payload bytes
    (md5-seeded), shaped (height, width) uint8. Replace with
    ``decode_real`` when a codec library is available."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width), dtype=np.uint8)


def decode_real(payload: bytes, media_type: str) -> np.ndarray:
    """Real decode. PPM/PGM/BMP images and PCM WAV audio decode with
    the pure stdlib+numpy codecs in :mod:`..operators.codecs` — actual
    bytes to actual pixels/samples, no external library. Formats that
    need a codec library (opus/av1) raise NotImplementedError
    with the production wiring (PIL.Image.open for images,
    soundfile.read for audio, av.open for video); the mapInPandas
    plumbing is decoder-agnostic — pass decoder=."""
    from dagster_etl_spark.operators import codecs

    return codecs.decode_media(payload)


# -- feature extraction -------------------------------------------------------

def band_bytes_stub(payload: bytes, band: int) -> bytes:
    """Deterministic fake "band pixels": the 16 digest bytes of
    ``md5(payload || ':' || band)``. Pure md5 arithmetic, so the DuckDB
    oracle reproduces the downstream features exactly (same pattern as
    the similarity hyperplanes, similarity.py)."""
    return hashlib.md5(payload + b":%d" % band).digest()


def stub_features(payload: bytes, dim: int) -> list[float]:
    """STUB feature contract: feature j = mean of band j's 16 digest
    bytes. byte-sum <= 4080 and /16 is a power-of-two shift, so every
    value is exactly representable in float32 — bit-equal across
    Python, Spark and the SQL oracle."""
    return [sum(band_bytes_stub(payload, j)) / 16.0 for j in range(dim)]


def extract_features(
    df: DataFrame, dim: int = 16, decoder=None, on_error: str = "fail"
) -> DataFrame:
    """Fixed-dim float feature vector per asset from decoded content.
    Arrow-batched; output schema (asset_id, features array<float>)
    feeds the similarity operators.

    With ``decoder=None`` (default, container path) features follow the
    md5 stub contract of :func:`stub_features` — SQL-reproducible, see
    the ``media_features`` oracle. Passing a real decoder (production:
    PIL/soundfile/PyAV via :func:`decode_real`) switches to per-band
    pixel means of the decoded array; plumbing is identical. Corrupt
    payloads follow ``on_error`` (:func:`_skip_errors`).
    """
    skip = _skip_errors(on_error)
    out_schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("features", ArrayType(FloatType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for aid, payload, meta in zip(pdf["asset_id"], pdf["media"], pdf["meta"]):
                raw = bytes(payload)
                if decoder is None:
                    feats.append(stub_features(raw, dim))
                else:
                    try:
                        img = decoder(raw, int(meta["width"]) % 64 + 8, 8)
                    except (ValueError, NotImplementedError):
                        if skip:
                            continue
                        raise
                    bands = np.array_split(img.ravel().astype(np.float32), dim)
                    feats.append([float(b.mean()) for b in bands])
                ids.append(aid)
            yield pd.DataFrame(
                {"asset_id": np.asarray(ids, dtype=np.int64), "features": feats}
            )

    return df.mapInPandas(run, schema=out_schema)


def resize_media(
    df: DataFrame,
    out_w: int = 32,
    out_h: int = 32,
    decoder=decode_stub,
    on_error: str = "fail",
) -> DataFrame:
    """Decode -> nearest-neighbor resize -> re-encode (raw bytes).
    Output payload is exactly out_w*out_h bytes; resize itself is pure
    NumPy striding (no codec needed), so only decode is stubbed.
    Corrupt payloads follow ``on_error`` (:func:`_skip_errors`)."""
    skip = _skip_errors(on_error)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, out = [], []
            for aid, payload, meta in zip(pdf["asset_id"], pdf["media"], pdf["meta"]):
                w, h = int(meta["width"]), int(meta["height"])
                try:
                    img = decoder(bytes(payload), w, h)
                except (ValueError, NotImplementedError):
                    if skip:
                        continue
                    raise
                yi = (np.arange(out_h) * h) // out_h
                xi = (np.arange(out_w) * w) // out_w
                out.append(img[np.ix_(yi, xi)].tobytes())
                ids.append(aid)
            yield pd.DataFrame(
                {
                    "asset_id": np.asarray(ids, dtype=np.int64),
                    "media": out,
                    "width": out_w,
                    "height": out_h,
                }
            )

    schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("media", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )
    return df.mapInPandas(run, schema=schema)


def sample_frames(df: DataFrame, every_ms: int = 5000) -> DataFrame:
    """1→N frame sampling for video assets: one output row per sampled
    timestamp (frame payload = deterministic slice stub). Row
    multiplicity — ceil(duration/every) for videos, 0 otherwise — is the
    SQL-checkable contract; frame bytes go through the decode stub."""
    schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_ms", LongType()),
            StructField("frame", BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, mss, frames = [], [], [], []
            for aid, payload, meta in zip(pdf["asset_id"], pdf["media"], pdf["meta"]):
                if meta["media_type"] != "video":
                    continue
                dur = int(meta["duration_ms"])
                n = -(-dur // every_ms)  # ceil
                raw = bytes(payload)
                for i in range(n):
                    ids.append(aid)
                    idxs.append(i)
                    mss.append(i * every_ms)
                    # stub frame: deterministic rotating slice of payload
                    off = (i * 17) % max(1, len(raw))
                    frames.append(raw[off:] + raw[:off])
            yield pd.DataFrame(
                {"asset_id": ids, "frame_idx": idxs, "frame_ms": mss, "frame": frames}
            )

    return df.mapInPandas(run, schema=schema)


def audio_fingerprint(
    df: DataFrame, on_error: str = "fail", n_windows: int = 65
) -> DataFrame:
    """Perceptual audio fingerprint over REAL decoded PCM — the audio
    sibling of :func:`image_dhash`: decode WAV -> flatten channels by
    integer sum (exact, monotone-equivalent for the comparisons) ->
    split the sample axis into ``n_windows`` equal spans (prefix-sum
    window energies, exact int64) -> pack the gradient signs
    ``s[w+1] > s[w]`` into a 64-bit BIGINT. Same-content audio
    collides regardless of container/delivery — byte-level dedup
    cannot pair a re-muxed or re-chunked copy of the same PCM; this
    does. Non-audio payloads are skipped (dhash's mirror image), so
    the two operators tile a mixed media table between them.

    n_windows must be 65 (64 gradient bits = one packed word); the
    parameter exists to make the invariant explicit at the call site.
    """
    from dagster_etl_spark.operators.codecs import decode_wav, sniff_format

    if n_windows != 65:
        raise ValueError(
            f"n_windows must be 65 (64 gradient bits), got {n_windows}"
        )
    skip = _skip_errors(on_error)

    schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("afp", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps = [], []
            for aid, payload in zip(pdf["asset_id"], pdf["media"]):
                raw = bytes(payload)
                if sniff_format(raw) != "wav":
                    continue
                try:
                    arr = decode_wav(raw)[0].astype(np.int64)
                except ValueError:
                    if skip:
                        continue
                    raise
                if arr.ndim == 2:  # stereo: exact integer downmix
                    arr = arr.sum(axis=1)
                n = arr.size
                idx = (np.arange(n_windows + 1, dtype=np.int64) * n) // n_windows
                cum = np.concatenate(([0], np.cumsum(arr)))
                s = cum[idx[1:]] - cum[idx[:-1]]  # 65 exact window sums
                bits = s[1:] > s[:-1]  # 64 gradient signs
                weights = np.left_shift(
                    np.uint64(1), np.arange(64, dtype=np.uint64)
                )
                u = int(weights[bits].sum(dtype=np.uint64))
                ids.append(int(aid))
                fps.append(u - (1 << 64) if u >= (1 << 63) else u)
            yield pd.DataFrame({"asset_id": ids, "afp": fps}).astype(
                {"asset_id": "int64", "afp": "int64"}
            )

    return df.mapInPandas(run, schema=schema)
