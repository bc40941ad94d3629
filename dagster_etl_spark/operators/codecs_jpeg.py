"""Baseline JPEG (ITU T.81 sequential DCT, SOF0) codec in pure
stdlib + numpy — no PIL/libjpeg. Completes the real-decode tier of
:mod:`.codecs` for the dominant lossy image format.

Decoder scope: baseline Huffman-coded scans, 8-bit samples, grayscale
or 3-component YCbCr with sampling factors 1 or 2 (4:4:4 / 4:2:2 /
4:2:0), restart markers honored. Progressive (SOF2), arithmetic coding
and 12-bit precision raise ValueError with a precise message.

Encoder scope (test-fixture generator): grayscale and 4:4:4 color,
quality-scaled Annex-K quantization tables, the spec's standard Huffman
tables. Lossy by nature — round-trip tests assert small error on
smooth images, not bit equality.

The DCT pair is the orthonormal 8x8 DCT-II as two matrix products with
a precomputed basis (numpy, vectorized per block batch); entropy coding
is the only sequential part and runs per image inside Arrow-batched
``mapInPandas``, same execution shape as every other decoder here.

Tables from ITU T.81 Annex K (public spec constants).
"""

from __future__ import annotations

import struct

import numpy as np

# -- spec constants (ITU T.81 Annex K) ----------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# standard Huffman tables: (BITS counts per code length 1..16, HUFFVAL)
STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# orthonormal 8x8 DCT-II basis: forward F = M @ f @ M.T, inverse
# f = M.T @ F @ M
_x = np.arange(8)
_M = np.cos((2 * _x[None, :] + 1) * _x[:, None] * np.pi / 16) * np.sqrt(2 / 8)
_M[0] = np.sqrt(1 / 8)


def _canonical_codes(bits, values):
    """BITS/HUFFVAL -> {symbol: (code, length)} per T.81 Annex C."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits, values):
    """BITS/HUFFVAL -> {(length, code): symbol} for bitwise decoding."""
    return {(l, c): s for s, (c, l) in _canonical_codes(bits, values).items()}


# -- bit I/O ------------------------------------------------------------------


class _BitReader:
    """Entropy-coded segment reader: un-stuffs 0xFF00, stops at markers
    (restarts are consumed by the caller)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        else:
            self.pos += 1
        # mask off consumed high bits so the int stays bounded (an
        # unmasked accumulator grows 8 bits per byte and makes decode
        # time quadratic in scan size)
        self.bitbuf = ((self.bitbuf & ((1 << self.nbits) - 1)) << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align(self) -> None:
        self.nbits = 0

    def skip_restart(self) -> None:
        """Consume an RSTn marker at the current (aligned) position."""
        if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
            self.pos += 2
        else:
            raise ValueError("expected restart marker")


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _huff_decode(r: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 sign extension of a t-bit magnitude."""
    return v - (1 << t) + 1 if t and v < (1 << (t - 1)) else v


# -- decoder ------------------------------------------------------------------


def decode_jpeg(payload: bytes, max_pixels: int | None = None) -> np.ndarray:
    """Baseline JPEG bytes -> uint8 array: (h, w) grayscale or
    (h, w, 3) RGB.

    Malformed input surfaces only as ValueError: truncated payloads
    (IndexError/struct.error internally), references to undeclared
    quant/Huffman tables or unknown Huffman codes (KeyError), and
    mid-block restart markers are wrapped at this boundary. Declared
    SOF dimensions are bounded (codecs.MAX_DECODE_PIXELS, override via
    ``max_pixels``) before the component planes are allocated — a
    crafted few-hundred-byte SOF can otherwise demand gigabytes.
    """
    try:
        return _decode_jpeg(payload, max_pixels)
    except (IndexError, struct.error) as exc:
        raise ValueError("truncated JPEG payload") from exc
    except KeyError as exc:
        raise ValueError(f"corrupt JPEG payload (bad table/code ref {exc})") from exc
    except OverflowError as exc:
        # corrupt entropy streams can accumulate DC diffs past C-long
        # range before any structural check fires
        raise ValueError("corrupt JPEG payload (coefficient overflow)") from exc


def _decode_jpeg(payload: bytes, max_pixels: int | None = None) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    frame = None
    restart_interval = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                qtables[tq] = np.frombuffer(body, np.uint8, 64, i + 1).astype(np.int32)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                values = list(body[i + 17 : i + 17 + n])
                htables[(tc, th)] = _decode_table(bits, values)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError(f"{prec}-bit JPEG unsupported (8-bit only)")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", body, 6 + 3 * c)
                ch, cv = hv >> 4, hv & 0xF
                # T.81 B.2.2: 1 <= Hi,Vi <= 4. A zero factor would reach
                # _decode_scan's hmax/vmax divisions as ZeroDivisionError,
                # escaping the ValueError-only decode boundary.
                if not (1 <= ch <= 4 and 1 <= cv <= 4):
                    raise ValueError(
                        f"JPEG sampling factor {ch}x{cv} out of range (1..4)"
                    )
                comps.append({"id": cid, "h": ch, "v": cv, "tq": tq})
            from dagster_etl_spark.operators.codecs import check_decode_dims

            check_decode_dims(w, h, "JPEG", max_pixels)
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"JPEG SOF{marker - 0xC0} (progressive/arithmetic/lossless) "
                "unsupported — baseline sequential only"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan_sel = []
            for c in range(ns):
                cs, tdta = body[1 + 2 * c], body[2 + 2 * c]
                scan_sel.append((cs, tdta >> 4, tdta & 0xF))
            return _decode_scan(
                payload, pos + seglen, frame, scan_sel, qtables, htables,
                restart_interval,
            )
        pos += seglen
    raise ValueError("JPEG missing SOS scan")


def _decode_scan(data, pos, frame, scan_sel, qtables, htables, restart_interval):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-frame["w"] // (8 * hmax))
    mcus_y = -(-frame["h"] // (8 * vmax))
    for c in comps:
        c["bw"] = mcus_x * c["h"]  # blocks per row
        c["bh"] = mcus_y * c["v"]
        c["blocks"] = np.zeros((c["bh"] * c["bw"], 64), np.int32)
    sel = {cs: (td, ta) for cs, td, ta in scan_sel}

    r = _BitReader(data, pos)
    preds = {c["id"]: 0 for c in comps}
    mcu = 0
    total_mcus = mcus_x * mcus_y
    try:
        while mcu < total_mcus:
            if restart_interval and mcu and mcu % restart_interval == 0:
                r.byte_align()
                r.skip_restart()
                preds = {c["id"]: 0 for c in comps}
            my, mx = divmod(mcu, mcus_x)
            for c in comps:
                td, ta = sel[c["id"]]
                dc_tab = htables[(0, td)]
                ac_tab = htables[(1, ta)]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = np.zeros(64, np.int32)
                        t = _huff_decode(r, dc_tab)
                        diff = _extend(r.read_bits(t), t) if t else 0
                        preds[c["id"]] += diff
                        blk[0] = preds[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(r, ac_tab)
                            rrrr, ssss = rs >> 4, rs & 0xF
                            if ssss == 0:
                                if rrrr == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += rrrr
                            if k > 63:
                                raise ValueError("AC run past end of block")
                            blk[k] = _extend(r.read_bits(ssss), ssss)
                            k += 1
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        c["blocks"][row * c["bw"] + col] = blk
            mcu += 1
    except _RestartMarker as exc:
        raise ValueError(
            "corrupt JPEG: restart marker inside an entropy-coded block"
        ) from exc

    # dequantize + dezigzag + IDCT, vectorized over all blocks at once
    planes = []
    for c in comps:
        q = qtables[c["tq"]]
        coeffs = np.zeros((len(c["blocks"]), 64), np.float64)
        coeffs[:, ZIGZAG] = c["blocks"] * q[np.newaxis, :]
        b = coeffs.reshape(-1, 8, 8)
        pix = np.einsum("ux,nuv,vy->nxy", _M, b, _M) + 128.0
        grid = (
            pix.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        # upsample to full resolution (nearest — T.81 leaves the filter
        # to the decoder) and crop to frame dims
        ry, rx = vmax // c["v"], hmax // c["h"]
        grid = grid.repeat(ry, axis=0).repeat(rx, axis=1)
        planes.append(grid[: frame["h"], : frame["w"]])

    if len(planes) == 1:
        return np.clip(planes[0].round(), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=2,
    )
    return np.clip(rgb.round(), 0, 255).astype(np.uint8)


# -- encoder (fixture generator) ----------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (category, category-bit pattern) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    return t, v if v > 0 else v + (1 << t) - 1


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling of an Annex-K table."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * s + 50) // 100, 1, 255).astype(np.int32)


def encode_jpeg(img: np.ndarray, quality: int = 90) -> bytes:
    """(h, w) gray or (h, w, 3) RGB uint8 -> baseline JPEG (4:4:4,
    standard Huffman tables)."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    if not gray and (img.ndim != 3 or img.shape[2] != 3):
        raise ValueError("JPEG encoder expects (h, w) or (h, w, 3) uint8")
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64) - 128.0]
    else:
        r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b - 128.0,
            -0.168736 * r - 0.331264 * g + 0.5 * b,  # Cb - 128 centered
            0.5 * r - 0.418688 * g - 0.081312 * b,  # Cr - 128 centered
        ]
    # Annex-K tables are declared in natural (row-major) order; both the
    # DQT wire format and the per-coefficient division operate in zigzag
    # order, so permute once here. This keeps quality-N frequency
    # weighting identical to libjpeg's interpretation of the same table.
    qt = [_scaled_quant(QUANT_LUMA, quality)[ZIGZAG]]
    if not gray:
        qt.append(_scaled_quant(QUANT_CHROMA, quality)[ZIGZAG])

    enc_dc = [_canonical_codes(*STD_DC_LUMA), _canonical_codes(*STD_DC_CHROMA)]
    enc_ac = [_canonical_codes(*STD_AC_LUMA), _canonical_codes(*STD_AC_CHROMA)]

    bw = _BitWriter()
    bh_blocks, bw_blocks = -(-h // 8), -(-w // 8)
    preds = [0] * len(planes)
    for by in range(bh_blocks):
        for bx in range(bw_blocks):
            for ci, plane in enumerate(planes):
                block = np.zeros((8, 8))
                tile = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                block[: tile.shape[0], : tile.shape[1]] = tile
                # replicate edge samples into the pad region
                if tile.shape[0] < 8:
                    block[tile.shape[0] :, :] = block[tile.shape[0] - 1, :]
                if tile.shape[1] < 8:
                    block[:, tile.shape[1] :] = block[:, tile.shape[1] - 1 : tile.shape[1]]
                q = qt[0 if ci == 0 else 1]
                coeffs = _M @ block @ _M.T
                zz = np.round(coeffs.ravel()[ZIGZAG] / q).astype(np.int32)
                ti = 0 if ci == 0 else 1
                diff = int(zz[0]) - preds[ci]
                preds[ci] = int(zz[0])
                t, bits = _magnitude(diff)
                code, length = enc_dc[ti][t]
                bw.write(code, length)
                if t:
                    bw.write(bits, t)
                run = 0
                last_nz = np.nonzero(zz[1:])[0]
                last = last_nz[-1] + 1 if len(last_nz) else 0
                for k in range(1, last + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = enc_ac[ti][0xF0]  # ZRL
                        bw.write(code, length)
                        run -= 16
                    t, bits = _magnitude(v)
                    code, length = enc_ac[ti][(run << 4) | t]
                    bw.write(code, length)
                    bw.write(bits, t)
                    run = 0
                if last < 63:
                    code, length = enc_ac[ti][0x00]  # EOB
                    bw.write(code, length)
    scan = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    for i, q in enumerate(qt):
        out += seg(0xDB, bytes([i]) + bytes(int(x) for x in q))
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for c in range(nc):
        sof += struct.pack(">BBB", c + 1, 0x11, 0 if c == 0 else 1)
    out += seg(0xC0, sof)
    tables = [(0x00, STD_DC_LUMA), (0x10, STD_AC_LUMA)]
    if not gray:
        tables += [(0x01, STD_DC_CHROMA), (0x11, STD_AC_CHROMA)]
    for tid, (bits, values) in tables:
        out += seg(0xC4, bytes([tid]) + bytes(bits) + bytes(values))
    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00 if c == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += scan
    out += b"\xff\xd9"
    return bytes(out)
