"""Multimodal-column queries: binary payloads + typed metadata over
the documents fixture. The metadata query is fully SQL-expressible
(payload = UTF-8 of text, so DuckDB's md5(text) equals Spark's
md5(binary)); decode-dependent operators get row-multiplicity oracles
or rows-only checks, with value determinism asserted in tests."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dagster_etl_spark.operators.multimodal import (
    extract_features,
    media_metadata,
    sample_frames,
    synth_media_table,
)
from dagster_etl_spark.registry import register
from dagster_etl_spark.sources.fixtures import load_table


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return synth_media_table(load_table(spark, sf_dir, "documents"))


_META_ORACLE = """
SELECT doc_id AS asset_id,
       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
       CAST(64 + doc_id % 448 AS INT) AS width,
       CAST(64 + (doc_id * 7) % 448 AS INT) AS height,
       CAST(1000 + (doc_id * 37) % 59000 AS BIGINT) AS duration_ms,
       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'opus' ELSE 'av1' END AS codec,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       md5(text) AS payload_md5
FROM documents
"""


@register(
    "media_metadata",
    oracle=_META_ORACLE,
    tags=("llm", "multimodal"),
    doc="Typed-metadata + payload stats over binary media columns — "
    "struct projection and JVM byte ops, zero decode.",
)
def q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_metadata(_media(spark, sf_dir))


_FRAMES_ORACLE = """
SELECT doc_id AS asset_id,
       CAST(unnest(range(0, CAST(ceil((1000 + (doc_id * 37) % 59000) / 5000.0) AS BIGINT))) AS INT) AS frame_idx
FROM documents
WHERE CAST(doc_id % 3 AS INT) = 2
"""


@register(
    "media_frame_sample",
    oracle=_FRAMES_ORACLE,
    tags=("llm", "multimodal"),
    doc="Video frame sampling (1→N mapInPandas expansion): row "
    "multiplicity ceil(duration/5s) per video asset is the verified "
    "contract; frame payload bytes are stub-decoded.",
)
def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_frames(_media(spark, sf_dir), every_ms=5000).select(
        "asset_id", "frame_idx"
    )


_FEAT_DIM = 16

# feature j in DuckDB: md5(text || ':j') hex digest -> sum of its 16
# bytes / 16. Hex pairs decode via strpos arithmetic; the digest string
# is let-bound so md5 runs once per feature, not 32×.
_HEXPOS = "strpos('0123456789abcdef', {c}) - 1"


def _duck_feature(j: int) -> str:
    byte = (
        f"(16 * ({_HEXPOS.format(c='h[2*i+1]')}) + ({_HEXPOS.format(c='h[2*i+2]')}))"
    )
    return (
        f"CAST(list_transform([md5(text || ':{j}')], h -> "
        f"list_sum(list_transform(range(0, 16), i -> {byte})))[1] / 16.0 "
        f"AS DOUBLE) AS f{j}"
    )


_FEATURES_ORACLE = (
    "SELECT doc_id AS asset_id, "
    + ", ".join(_duck_feature(j) for j in range(_FEAT_DIM))
    + " FROM documents"
)


@register(
    "media_features",
    oracle=_FEATURES_ORACLE,
    tags=("llm", "multimodal"),
    doc="Arrow-batched feature extraction over media payloads "
    "(mapInPandas, fixed-dim float vectors). The stub features are md5 "
    "band-digest means (multimodal.stub_features) — pure md5 "
    "arithmetic, so the DuckDB oracle recomputes every vector element "
    "exactly; the query emits them as scalar double columns (the "
    "driver canonicalizer cannot sort list columns).",
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    feats = extract_features(_media(spark, sf_dir), dim=_FEAT_DIM)
    return feats.select(
        "asset_id",
        *[
            feats["features"].getItem(j).cast("double").alias(f"f{j}")
            for j in range(_FEAT_DIM)
        ],
    )


# Real-codec decode stats — every statistic is a closed form of doc_id
# (see synth_real_media_table: PPM pixel[y,x,c] = x+y+c, WAV sample[i]
# = i%7-3, PNG gray pixel[y,x] = x+y, JPEG q100 block-constant value
# v0 + 7*bx + 13*by with v0 = doc_id % 200 — DC-only + unit quant =
# bit-exact), so the oracle recomputes the decoded content
# analytically. Integer-only output: no float summation order to match.
_DECODE_STATS_ORACLE = """
WITH p AS (
  SELECT doc_id, CAST(doc_id % 4 AS INT) AS kind,
         CAST(8 + doc_id % 9 AS BIGINT) AS w,
         CAST(8 + (doc_id * 3) % 9 AS BIGINT) AS h,
         CAST(50 + doc_id % 200 AS BIGINT) AS n,
         CAST(1 + doc_id % 3 AS BIGINT) AS wb,
         CAST(1 + (doc_id * 3) % 3 AS BIGINT) AS hb,
         CAST(doc_id % 200 AS BIGINT) AS v0
  FROM documents
)
SELECT doc_id AS asset_id,
       CASE kind WHEN 0 THEN 'ppm' WHEN 1 THEN 'wav' WHEN 2 THEN 'png'
            ELSE 'jpeg' END AS fmt,
       CAST(CASE kind WHEN 1 THEN 0 WHEN 3 THEN 8 * wb ELSE w END AS INT) AS img_w,
       CAST(CASE kind WHEN 1 THEN 0 WHEN 3 THEN 8 * hb ELSE h END AS INT) AS img_h,
       CAST(CASE kind WHEN 0 THEN w * h * 3 WHEN 1 THEN n WHEN 2 THEN w * h
            ELSE 64 * wb * hb END AS BIGINT) AS n_values,
       CAST(CASE kind
            WHEN 0 THEN 3 * (h * ((w * (w - 1)) // 2) + w * ((h * (h - 1)) // 2)) + 3 * w * h
            WHEN 1 THEN ((n % 7) * ((n % 7) - 1)) // 2 - 3 * (n % 7)
            WHEN 2 THEN h * ((w * (w - 1)) // 2) + w * ((h * (h - 1)) // 2)
            ELSE 64 * (wb * hb * v0 + 7 * hb * ((wb * (wb - 1)) // 2)
                       + 13 * wb * ((hb * (hb - 1)) // 2))
            END AS BIGINT) AS sum_val,
       CAST(CASE kind WHEN 1 THEN -3 WHEN 3 THEN v0 ELSE 0 END AS INT) AS min_val,
       CAST(CASE kind WHEN 0 THEN w + h WHEN 1 THEN 3 WHEN 2 THEN w + h - 2
            ELSE v0 + 7 * (wb - 1) + 13 * (hb - 1) END AS INT) AS max_val
FROM p
"""


@register(
    "media_decode_stats",
    oracle=_DECODE_STATS_ORACLE,
    tags=("llm", "multimodal", "codecs"),
    doc="REAL codec round-trip: genuine PPM/WAV/PNG/JPEG container "
    "bytes (codecs/codecs_jpeg encoders) decoded back by magic-byte "
    "dispatch (codecs.decode_media) inside Arrow-batched mapInPandas; "
    "integer content stats (count/sum/min/max over every pixel/sample) "
    "match the closed-form oracle, proving header parse, DEFLATE "
    "inflate, filter reversal, Huffman entropy decode + IDCT (JPEG "
    "made bit-exact via q100 DC-only blocks), row layout and sample "
    "width end-to-end.",
)
def q_media_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dagster_etl_spark.operators.multimodal import (
        decode_stats,
        synth_real_media_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    return decode_stats(synth_real_media_table(docs))


# Audio analysis over REAL decoded PCM: the synthetic waveform is
# sample[i] = i % 7 - 3 over n = 50 + doc_id % 200 samples (WAV assets
# are doc_id % 4 == 1), so energy and amplitude sums decompose into
# full 7-sample cycles (sum_sq 28, sum_abs 12 per cycle) plus a CASE on
# the remainder r = n % 7.
_AUDIO_ORACLE = """
WITH p AS (
  SELECT doc_id, CAST(50 + doc_id % 200 AS BIGINT) AS n
  FROM documents WHERE doc_id % 4 = 1
)
SELECT doc_id AS asset_id,
       n AS n_samples,
       CAST(28 * (n // 7) + CASE n % 7
            WHEN 0 THEN 0 WHEN 1 THEN 9 WHEN 2 THEN 13 WHEN 3 THEN 14
            WHEN 4 THEN 14 WHEN 5 THEN 15 ELSE 19 END AS BIGINT) AS sum_sq,
       CAST(12 * (n // 7) + CASE n % 7
            WHEN 0 THEN 0 WHEN 1 THEN 3 WHEN 2 THEN 5 WHEN 3 THEN 6
            WHEN 4 THEN 6 WHEN 5 THEN 7 ELSE 9 END AS BIGINT) AS sum_abs,
       CAST(3 AS INT) AS peak
FROM p
"""


@register(
    "audio_feature_stats",
    oracle=_AUDIO_ORACLE,
    tags=("llm", "multimodal", "codecs"),
    doc="REAL audio feature extraction: PCM16 WAV bytes decode inside "
    "Arrow-batched mapInPandas to integer energy (sum of squares), "
    "absolute amplitude sum and peak per asset — the RMS/mean-amplitude "
    "numerators — matching the closed-form waveform oracle exactly. "
    "Non-audio payloads in the same table are skipped (composable with "
    "mixed media).",
)
def q_audio_feature_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dagster_etl_spark.operators.multimodal import (
        audio_stats,
        synth_real_media_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    return audio_stats(synth_real_media_table(docs))


# Resize verification: for the synthetic PNG gradient (pixel = x + y),
# nearest-neighbor output pixel [yo, xo] is exactly
# (yo*h)//OH + (xo*w)//OW, so per-asset stats of the RESIZED bytes are
# floor-sum closed forms DuckDB folds with list_transform.
_RESIZE_OUT = 4

_RESIZE_ORACLE = f"""
WITH p AS (
  SELECT doc_id,
         CAST(8 + doc_id % 9 AS BIGINT) AS w,
         CAST(8 + (doc_id * 3) % 9 AS BIGINT) AS h
  FROM documents WHERE doc_id % 4 = 2
)
SELECT doc_id AS asset_id,
       CAST({_RESIZE_OUT * _RESIZE_OUT} AS BIGINT) AS n_values,
       CAST({_RESIZE_OUT} * list_sum(list_transform(range(0, {_RESIZE_OUT}), i -> (i * h) // {_RESIZE_OUT}))
          + {_RESIZE_OUT} * list_sum(list_transform(range(0, {_RESIZE_OUT}), i -> (i * w) // {_RESIZE_OUT}))
          AS BIGINT) AS sum_val,
       CAST(0 AS INT) AS min_val,
       CAST((({_RESIZE_OUT - 1} * h) // {_RESIZE_OUT}) + (({_RESIZE_OUT - 1} * w) // {_RESIZE_OUT}) AS INT) AS max_val
FROM p
"""


@register(
    "media_resize_stats",
    oracle=_RESIZE_ORACLE,
    tags=("llm", "multimodal", "codecs"),
    doc="REAL decode -> nearest-neighbor resize verified value-exactly: "
    "PNG gradient assets resize to 4x4 through image_decoder inside "
    "mapInPandas, and the resized pixel bytes match the floor-sum "
    "closed form of the sampling arithmetic (a wrong stride, axis "
    "order, or index mapping changes the sums).",
)
def q_media_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from dagster_etl_spark.operators import codecs
    from dagster_etl_spark.operators.multimodal import (
        byte_stats,
        resize_media,
        synth_real_media_table,
    )

    docs = load_table(spark, sf_dir, "documents").filter("doc_id % 4 = 2")
    # resize_media samples with the meta dims; carry the true ones
    media = synth_real_media_table(docs).withColumn(
        "meta",
        F.expr(
            "named_struct('media_type', 'image', "
            "'width', CAST(8 + asset_id % 9 AS INT), "
            "'height', CAST(8 + (asset_id * 3) % 9 AS INT), "
            "'duration_ms', CAST(0 AS BIGINT), 'codec', 'png')"
        ),
    )
    resized = resize_media(
        media, out_w=_RESIZE_OUT, out_h=_RESIZE_OUT, decoder=codecs.image_decoder
    )
    return byte_stats(resized)


# Image near-dup: dHash bits over the synthetic assets reduce to closed
# forms of doc_id (PPM/PNG gradients: bit x = [((x+1)*w)//9 > (x*w)//9],
# identical across rows so hash = rowbits * 0x0101010101010101; JPEG
# block-constant: the same with block index xi//8), so the oracle
# recomputes the full 64-bit hash — HUGEINT arithmetic, wrapped to the
# signed BIGINT the uint64->int64 reinterpretation produces. WAV assets
# are skipped by the operator (1-D decode). PPM and PNG assets with the
# same width collide BY DESIGN: same scene, different container — the
# pairing byte-level dedup cannot see.
_DHASH_ORACLE = """
WITH p AS (
  SELECT doc_id, CAST(doc_id % 4 AS INT) AS kind,
         CAST(8 + doc_id % 9 AS BIGINT) AS w,
         CAST(1 + doc_id % 3 AS BIGINT) AS wb
  FROM documents WHERE doc_id % 4 <> 1
),
rb AS (
  SELECT doc_id,
    CASE WHEN kind IN (0, 2) THEN
      CAST(list_sum(list_transform(range(0, 8), x ->
        CASE WHEN ((x+1)*w)//9 > (x*w)//9 THEN 1<<x ELSE 0 END)) AS HUGEINT)
    ELSE
      CAST(list_sum(list_transform(range(0, 8), x ->
        CASE WHEN (((x+1)*8*wb)//9)//8 > ((x*8*wb)//9)//8 THEN 1<<x ELSE 0 END)) AS HUGEINT)
    END AS rowbits
  FROM p
),
h AS (
  SELECT doc_id AS asset_id,
         CAST(CASE WHEN rowbits * 72340172838076673 >= 9223372036854775808
              THEN rowbits * 72340172838076673 - 18446744073709551616
              ELSE rowbits * 72340172838076673 END AS BIGINT) AS dhash
  FROM rb
)
SELECT h.asset_id, h.dhash, g.group_size, g.canonical_id
FROM h JOIN (
  SELECT dhash, COUNT(*) AS group_size, MIN(asset_id) AS canonical_id
  FROM h GROUP BY dhash
) g USING (dhash)
"""


@register(
    "image_dhash_groups",
    oracle=_DHASH_ORACLE,
    tags=("llm", "multimodal", "dedup", "codecs"),
    doc="Image near-dup via perceptual difference-hash over REAL "
    "decoded pixels: decode (PPM/PNG/JPEG) -> integer grayscale -> "
    "9x8 nearest-neighbor resample -> 64-bit gradient-sign hash inside "
    "Arrow-batched mapInPandas, then a hash-groupBy assigns duplicate "
    "groups (size + canonical id) joined back per asset. Collides "
    "same-content assets across containers; the full 64-bit value "
    "matches the closed-form oracle bit-for-bit.",
)
def q_image_dhash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from dagster_etl_spark.operators.multimodal import (
        image_dhash,
        synth_real_media_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    h = image_dhash(synth_real_media_table(docs))
    g = h.groupBy("dhash").agg(
        F.count(F.lit(1)).alias("group_size"),
        F.min("asset_id").alias("canonical_id"),
    )
    return h.join(g, on="dhash").select(
        "asset_id", "dhash", "group_size", "canonical_id"
    )


def _afp_oracle() -> str:
    """Closed-form audio-fingerprint oracle. The synth WAV for
    doc_id % 4 == 1 is sample[i] = i % 7 - 3 over n = 50 + doc_id % 200
    samples, so every window sum is exact integer arithmetic:
    g(m) = sum_{i<m} (i%7-3) collapses to a residue formula (full
    7-periods sum to zero), window w's sum is
    s(w) = g(((w+1)*n)//65) - g((w*n)//65), and the 64 gradient-sign
    bits pack into BIGINT two's-complement (bit 63 contributes -2^63)."""

    def g(m: str) -> str:
        return f"(((({m})%7)*((({m})%7)-1))//2 - 3*(({m})%7))"

    def s(w: str) -> str:
        return f"({g(f'((({w})+1)*n)//65')} - {g(f'(({w})*n)//65')})"

    low_bits = (
        "CAST(list_sum(list_transform(range(0, 63), w -> "
        f"CASE WHEN {s('w+1')} > {s('w')} "
        "THEN (CAST(1 AS BIGINT) << w) ELSE CAST(0 AS BIGINT) END)) AS BIGINT)"
    )
    sign_bit = (
        f"CASE WHEN {s('64')} > {s('63')} "
        "THEN CAST(-9223372036854775807 - 1 AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    )
    return f"""
WITH a AS (
  SELECT doc_id AS asset_id, CAST(50 + doc_id % 200 AS BIGINT) AS n
  FROM documents WHERE doc_id % 4 = 1
),
h AS (
  SELECT asset_id, {low_bits} + {sign_bit} AS afp
  FROM a
)
SELECT h.asset_id, h.afp, g.group_size, g.canonical_id
FROM h JOIN (
  SELECT afp, COUNT(*) AS group_size, MIN(asset_id) AS canonical_id
  FROM h GROUP BY afp
) g USING (afp)
"""


@register(
    "audio_fingerprint_groups",
    oracle=_afp_oracle(),
    tags=("llm", "multimodal", "dedup", "codecs"),
    doc="Audio near-dup via perceptual gradient fingerprint over REAL "
    "decoded PCM: decode WAV -> integer channel downmix -> 65 exact "
    "prefix-sum window energies -> 64-bit gradient-sign hash inside "
    "Arrow-batched mapInPandas, then a hash-groupBy assigns duplicate "
    "groups joined back per asset. The dhash mirror image: images are "
    "skipped here, audio there -- together they tile a mixed media "
    "table. Full 64-bit value matches the closed-form oracle "
    "bit-for-bit.",
)
def q_audio_fingerprint_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from dagster_etl_spark.operators.multimodal import (
        audio_fingerprint,
        synth_real_media_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    h = audio_fingerprint(synth_real_media_table(docs))
    g = h.groupBy("afp").agg(
        F.count(F.lit(1)).alias("group_size"),
        F.min("asset_id").alias("canonical_id"),
    )
    return h.join(g, on="afp").select(
        "asset_id", "afp", "group_size", "canonical_id"
    )
