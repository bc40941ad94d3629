"""Pure stdlib+numpy media codecs: real byte->array decoding without
PIL/ffmpeg/librosa (none of which ship in this container).

Four container formats need no external codec library:

* **PPM (P6) / PGM (P5)** — the netpbm formats are an ASCII header plus
  raw sample bytes;
* **BMP** — uncompressed BITMAPINFOHEADER 8/24-bit, little-endian
  struct fields + padded bottom-up rows;
* **PNG** (non-interlaced 8-bit gray/RGB/RGBA) — CRC'd chunks via
  ``struct``, DEFLATE IDAT via stdlib ``zlib``, per-row filter
  reversal (Sub/Up/Average/Paeth) implemented here;
* **WAV** — RIFF chunks around raw PCM16/PCM8 frames (parsed with the
  stdlib ``wave`` module).

These give the multimodal operators (multimodal.py) a REAL decode path
end-to-end: actual image/audio bytes in a ``binary`` column, decoded
inside ``mapInPandas``, features/resizes computed from true pixel or
sample values. Baseline sequential JPEG decodes too (see
:mod:`.codecs_jpeg` — Huffman + IDCT in numpy). Formats that genuinely
need codec libraries (opus, av1, progressive JPEG,
palette/16-bit/interlaced PNG) still raise — see :func:`sniff_format`.

Encoders for the same formats are provided so tests and fixtures can
synthesize valid payloads deterministically.

Reference capability anchor: the reference pipeline treats media as
opaque files moved between stages (SURVEY §2.8); decode-on-read inside
the engine is the extension a training-data pipeline needs.
"""

from __future__ import annotations

import functools
import io
import struct
import wave
import zlib

import numpy as np

# Stdlib parsers raise their own types on corrupt bytes (struct.error
# on short buffers, zlib.error on bad DEFLATE, wave.Error/EOFError on
# bad RIFF, Index/Key/OverflowError from out-of-range fields). The
# decoders promise ValueError for every malformed payload, so each
# public decode_* is wrapped at its boundary.
_MALFORMED = (
    struct.error,
    zlib.error,
    wave.Error,
    EOFError,
    IndexError,
    KeyError,
    OverflowError,
)


# Allocation-bomb guard: a few hundred crafted bytes can DECLARE a
# multi-gigapixel image (huge SOF/IHDR dims + a zlib bomb or truncated
# scan) and OOM-kill an executor before any data-size check fires.
# 2^26 pixels (~8192x8192) is far beyond any training-data asset;
# decoders raise ValueError past it BEFORE allocating. Sizing note:
# the final uint8 RGB at the cap is 192 MiB, but the JPEG decode path
# materializes float64 intermediates (dequantized coeffs, IDCT einsum
# output, stacked YCbCr->RGB planes) of ~8-24 bytes/pixel/component,
# so PEAK working set at the cap is a few GiB per in-flight decode —
# bounded, but budget executor memory for the float64 peak, not the
# 192 MiB output. Override per call via ``max_pixels=``.
MAX_DECODE_PIXELS = 1 << 26


def check_decode_dims(w: int, h: int, fmt: str, max_pixels: int | None) -> None:
    limit = MAX_DECODE_PIXELS if max_pixels is None else max_pixels
    if w <= 0 or h <= 0 or w * h > limit:
        raise ValueError(
            f"{fmt} declares {w}x{h} pixels — outside (0, {limit}] "
            "(allocation-bomb guard; raise max_pixels for legitimate "
            "oversized assets)"
        )


def _valueerror_boundary(fmt: str, *extra: type[BaseException]):
    # ``extra`` widens the net for one decoder only — e.g. stdlib
    # wave/chunk raises a bare RuntimeError seeking past a corrupt
    # chunk boundary, which must not be swallowed elsewhere
    caught = _MALFORMED + extra

    def deco(fn):
        @functools.wraps(fn)
        def wrapped(payload, *args, **kwargs):
            try:
                return fn(payload, *args, **kwargs)
            except caught as exc:
                raise ValueError(f"malformed {fmt} payload: {exc}") from exc

        return wrapped

    return deco


# -- netpbm (PPM P6 / PGM P5) -------------------------------------------------


def encode_ppm(img: np.ndarray) -> bytes:
    """RGB (h, w, 3) uint8 -> binary PPM (P6)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("PPM encoder expects (h, w, 3) uint8")
    h, w = img.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def encode_pgm(img: np.ndarray) -> bytes:
    """Grayscale (h, w) uint8 -> binary PGM (P5)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 2:
        raise ValueError("PGM encoder expects (h, w) uint8")
    h, w = img.shape
    return b"P5\n%d %d\n255\n" % (w, h) + img.tobytes()


def _read_pnm_header(payload: bytes) -> tuple[bytes, int, int, int, int]:
    """Parse magic, width, height, maxval; return them + data offset.
    Netpbm headers are whitespace-separated tokens with '#' comments."""
    pos = 0
    tokens: list[bytes] = []
    magic = payload[:2]
    pos = 2
    while len(tokens) < 3:
        if pos >= len(payload):
            raise ValueError("truncated netpbm header")
        c = payload[pos : pos + 1]
        if c == b"#":  # comment to end of line
            nl = payload.find(b"\n", pos)
            pos = len(payload) if nl < 0 else nl + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(payload) and not payload[end : end + 1].isspace():
                end += 1
            tokens.append(payload[pos:end])
            pos = end
    pos += 1  # single whitespace byte after maxval, then raster data
    w, h, maxval = (int(t) for t in tokens)
    return magic, w, h, maxval, pos


@_valueerror_boundary("PNM")
def decode_pnm(payload: bytes) -> np.ndarray:
    """Binary PPM/PGM bytes -> uint8 array: (h, w, 3) for P6, (h, w)
    for P5."""
    magic, w, h, maxval, off = _read_pnm_header(payload)
    if maxval != 255:
        raise ValueError(f"only maxval=255 supported, got {maxval}")
    if magic == b"P6":
        n = w * h * 3
        return np.frombuffer(payload, np.uint8, n, off).reshape(h, w, 3).copy()
    if magic == b"P5":
        n = w * h
        return np.frombuffer(payload, np.uint8, n, off).reshape(h, w).copy()
    raise ValueError(f"unsupported netpbm magic {magic!r}")


# -- BMP ----------------------------------------------------------------------


def encode_bmp(img: np.ndarray) -> bytes:
    """RGB (h, w, 3) uint8 -> 24-bit uncompressed BMP (bottom-up rows,
    BGR byte order, rows padded to 4 bytes — the classic layout)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("BMP encoder expects (h, w, 3) uint8")
    h, w = img.shape[:2]
    row = w * 3
    pad = (-row) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        body += img[y, :, ::-1].tobytes()  # RGB -> BGR
        body += b"\x00" * pad
    data_off = 14 + 40
    file_size = data_off + len(body)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + bytes(body)


@_valueerror_boundary("BMP")
def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 8-bit (grayscale palette) or 24-bit BMP -> uint8
    array: (h, w) or (h, w, 3) RGB. Handles bottom-up and top-down
    rows and 4-byte row padding."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression != 0:
        raise ValueError(f"compressed BMP (method {compression}) unsupported")
    h = abs(h_signed)
    bottom_up = h_signed > 0
    if bpp == 24:
        row = w * 3
        stride = row + ((-row) % 4)
        raw = np.frombuffer(payload, np.uint8, stride * h, data_off)
        img = raw.reshape(h, stride)[:, :row].reshape(h, w, 3)[:, :, ::-1]
    elif bpp == 8:
        stride = w + ((-w) % 4)
        raw = np.frombuffer(payload, np.uint8, stride * h, data_off)
        img = raw.reshape(h, stride)[:, :w]
    else:
        raise ValueError(f"{bpp}-bit BMP unsupported (8/24 only)")
    if bottom_up:
        img = img[::-1]
    return img.copy()


# -- PNG ----------------------------------------------------------------------
#
# Non-interlaced 8-bit PNG is pure stdlib: the container is CRC'd
# chunks (struct), the IDAT stream is DEFLATE (zlib), and the only
# codec-specific work is reversing the per-row byte filters (spec
# §6.2: None/Sub/Up/Average/Paeth). Grayscale (color type 0), RGB (2),
# gray+alpha (4) and RGBA (6) at bit depth 8 cover the overwhelming
# majority of real-world lossless images; palette (3), 16-bit and
# Adam7 interlace still raise with a precise message.

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def encode_png(img: np.ndarray) -> bytes:
    """(h, w) gray or (h, w, 3|4) uint8 -> non-interlaced 8-bit PNG
    (filter 0 rows, one zlib-deflated IDAT)."""
    import zlib

    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color, ch = 0, 1
    elif img.ndim == 3 and img.shape[2] == 3:
        color, ch = 2, 3
    elif img.ndim == 3 and img.shape[2] == 4:
        color, ch = 6, 4
    else:
        raise ValueError("PNG encoder expects (h, w), (h, w, 3) or (h, w, 4) uint8")
    h, w = img.shape[:2]
    raw = img.reshape(h, w * ch)
    scanlines = b"".join(b"\x00" + raw[y].tobytes() for y in range(h))

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scanlines))
        + chunk(b"IEND", b"")
    )


def _png_unfilter(data: np.ndarray, h: int, w: int, ch: int) -> np.ndarray:
    """Reverse the per-row PNG filters. Sub/Up/Average/Paeth recurrences
    are sequential in x and/or y; rows are vectorized where the filter
    allows (None/Up), per-pixel otherwise — decode runs inside Arrow
    batches, not per-row UDF calls, so this loop is per-image, bounded."""
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    rows = data.reshape(h, stride + 1)
    for y in range(h):
        ftype = int(rows[y, 0])
        cur = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:  # None
            res = cur
        elif ftype == 2:  # Up
            res = (cur + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            res = np.empty(stride, np.int32)
            for x in range(stride):
                a = res[x - ch] if x >= ch else 0
                b = prev[x]
                if ftype == 1:
                    res[x] = (cur[x] + a) & 0xFF
                elif ftype == 3:
                    res[x] = (cur[x] + ((a + b) >> 1)) & 0xFF
                else:
                    c = int(prev[x - ch]) if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    res[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {ftype}")
        out[y] = res.astype(np.uint8)
    return out.reshape((h, w) if ch == 1 else (h, w, ch))


@_valueerror_boundary("PNG")
def decode_png(payload: bytes, max_pixels: int | None = None) -> np.ndarray:
    """Non-interlaced 8-bit PNG bytes -> uint8 array: (h, w) for
    grayscale, (h, w, 3|2|4) for RGB / gray+alpha / RGBA. Declared
    dimensions are bounded BEFORE the IDAT inflate, and the inflate
    itself is capped at the declared scanline budget (decompressobj
    with max_length), so a DEFLATE bomb — tiny declared dims, huge
    expansion — fails fast without materializing."""
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = 8
    w = h = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + body + crc
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8:
                raise ValueError(f"{depth}-bit PNG unsupported (8-bit only)")
            if color not in _PNG_CHANNELS:
                raise ValueError(f"PNG color type {color} unsupported (palette needs PIL)")
            if interlace != 0:
                raise ValueError("Adam7-interlaced PNG unsupported")
            if comp != 0:
                raise ValueError(f"PNG compression method {comp} unsupported (0 only)")
            if filt != 0:
                raise ValueError(f"PNG filter method {filt} unsupported (0 only)")
            check_decode_dims(w, h, "PNG", max_pixels)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    ch = _PNG_CHANNELS[color]
    expected = h * (w * ch + 1)
    # Bounded inflate: decompress at most expected+1 bytes so a DEFLATE
    # bomb (tiny declared dims, huge expansion) never materializes past
    # the scanline budget. A correct stream consumes all input exactly.
    dec = zlib.decompressobj()
    raw = dec.decompress(bytes(idat), expected + 1)
    if len(raw) > expected or dec.unconsumed_tail or dec.decompress(b"", 1):
        raise ValueError("PNG IDAT inflates past declared scanline size")
    if not dec.eof:
        raise ValueError("PNG IDAT zlib stream truncated (no stream terminator)")
    if dec.unused_data:
        raise ValueError("PNG IDAT has trailing bytes past zlib stream end")
    data = np.frombuffer(raw, np.uint8)
    if data.size != expected:
        raise ValueError("PNG scanline data size mismatch")
    return _png_unfilter(data, h, w, ch)


# -- WAV ----------------------------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Mono or (n, channels) int16 samples -> PCM16 WAV bytes."""
    samples = np.asarray(samples, dtype=np.int16)
    channels = 1 if samples.ndim == 1 else samples.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


@_valueerror_boundary("WAV", RuntimeError)
def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (samples, rate). PCM16 -> int16 array, PCM8
    (unsigned) -> int16 centered at 0. Multi-channel -> (n, channels)."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        channels = wf.getnchannels()
        width = wf.getsampwidth()
        rate = wf.getframerate()
        frames = wf.readframes(wf.getnframes())
    if width == 2:
        samples = np.frombuffer(frames, np.int16)
    elif width == 1:
        samples = np.frombuffer(frames, np.uint8).astype(np.int16) - 128
    else:
        raise ValueError(f"{8 * width}-bit WAV unsupported (8/16 only)")
    if channels > 1:
        samples = samples.reshape(-1, channels)
    return samples.copy(), rate


# -- dispatch -----------------------------------------------------------------


def sniff_format(payload: bytes) -> str:
    """Identify a payload by magic bytes. Returns one of
    ppm/pgm/bmp/wav, or the detected-but-unsupported codec name."""
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"P5":
        return "pgm"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:4] == b"OggS":
        return "ogg"
    return "unknown"


def decode_media(payload: bytes) -> np.ndarray:
    """Real decode for any supported container: image formats -> uint8
    pixel array, WAV -> int16 sample array. Raises on formats that need
    an external codec (ogg/opus, video) — see multimodal.decode_real."""
    fmt = sniff_format(payload)
    if fmt in ("ppm", "pgm"):
        return decode_pnm(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    if fmt == "wav":
        return decode_wav(payload)[0]
    if fmt == "png":
        return decode_png(payload)
    if fmt == "jpeg":
        from dagster_etl_spark.operators.codecs_jpeg import decode_jpeg

        return decode_jpeg(payload)
    raise NotImplementedError(
        f"format {fmt!r} needs an external codec library (ffmpeg/libopus); "
        "supported here: ppm, pgm, bmp, png, jpeg, wav"
    )


def image_decoder(payload: bytes, width: int = 0, height: int = 0) -> np.ndarray:
    """Drop-in ``decoder=`` for multimodal.resize_media /
    extract_features: decodes real PPM/PGM/BMP bytes to a 2-D luminance
    array (RGB is averaged). The (width, height) hints from metadata are
    ignored — real containers carry their own dimensions."""
    img = decode_media(payload)
    if img.ndim == 3:
        img = img.mean(axis=2).astype(np.uint8)
    if img.ndim != 2:
        raise ValueError("image_decoder got non-image payload")
    return img
