"""Cross-engine scale trend for the LLM-pipeline bench family (r10).

The five documents/embeddings bench queries (minhash_neardup,
clean_corpus, doc_stats, doc_fingerprints, ann_cosine_topk) had
Spark-only scale smokes and sf0.1 bench rows, but — unlike the WIP,
window, and parity families — never a DuckDB pairing at scale. This
closes that gap with the same protocol as the other trend tools:
identical parquet for both engines, interleaved D,S pairs, median per
engine, spreads reported. The DuckDB side runs each query's registered
oracle over views on the scaled parquet; the Spark side runs the
registered query via the noop sink.

Materialization — two growth axes, matched to each query's semantics:

* ``cipher`` corpus (minhash_neardup, doc_stats, doc_fingerprints):
  K copies with per-copy distinct Caesar-translated text (lowercase
  rot i%25+1, uppercase rot i//25 — all (r1, r2) pairs distinct for
  K <= 50). Token/shingle COUNTS are identical to the original per
  copy, shingle VALUES are disjoint across copies, so the near-dup
  pair count grows linearly with K (more distinct documents at the
  same dup density) instead of quadratically (the identical-copy axis
  would make every doc a K-member clique and the run output-bound).
* ``dup`` corpus (clean_corpus): the scale_smoke ``inflate`` axis —
  K shifted copies, 1-in-7 with an appended variant token. Exact-dedup
  collapsing a K-duplicated crawl is precisely clean_corpus's job, so
  identical copies are the realistic input for it.
* rotated embeddings (ann_cosine_topk): K copies with vec_id shifted
  and the 64-dim vector rotated by i%64 positions (norms preserved,
  no identical-vector ties); the 5 query vectors (vec_id < 5) stay
  the copy-0 originals, so query count is constant while the corpus
  grows — the realistic ANN growth axis.

Usage: python tools/scale_trend_llm.py [sf_dir] [mult ...]
Defaults: /root/testdata/sf0.1 and multipliers 10 50.
SCALE_LLM_QUERIES=a,b,c narrows the query list.
"""

from __future__ import annotations

import json
import os
import statistics
import string
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
MULTS = [int(a) for a in sys.argv[2:]] or [10, 50]
RUNS = 3

# query -> (corpus kind, tables the scratch dir must contain)
QUERIES: dict[str, str] = {
    "doc_stats": "cipher",
    "doc_fingerprints": "cipher",
    "minhash_neardup": "cipher",
    "clean_corpus": "dup",
    "ann_cosine_topk": "cipher",  # embeddings live in the cipher dir
    # r10 late additions: substring-dup spans grow linearly on the
    # cipher axis (each copy's intra-corpus dups are disjoint from
    # every other copy's); epoch shuffle is text-independent (doc_id
    # is the only input — the registered query reads documents, so the
    # documents axis IS its growth axis); dhash media is synthesized
    # 1:1 from documents rows (synth_real_media_table: content a
    # closed form of doc_id), so the documents axis is the media-count
    # axis. The dhash/afp duck pairing is decode-vs-formula (the
    # oracle never touches bytes) — kept for the trend only; r12 adds
    # a single-process Python decode baseline (_python_media_baseline)
    # so those two rows also carry a like-for-like
    # ratio_vs_python_decode, which is the quotable number.
    "duplicate_ngram_spans": "cipher",
    "epoch_shuffle_order": "cipher",
    "image_dhash_groups": "cipher",
    # r11 registrations, trend-rowed in the same round (the r10 process
    # gap was queries landing after their sweep): audio fingerprints
    # ride the documents axis like dhash (synth media 1:1 with docs);
    # the weighted sampler's inputs (doc_id, source, n_chars) are all
    # preserved per cipher copy
    "audio_fingerprint_groups": "cipher",
    "weighted_corpus_sample": "cipher",
    # the composed epoch pipeline and the token-budget mixer both ride
    # the documents axis (source/n_chars preserved per cipher copy;
    # budgets fixed, so the mixer's OUTPUT stays ~constant while the
    # per-source windows sweep the grown corpus)
    "training_order_pipeline": "cipher",
    "token_budget_mixture": "cipher",
    # per-character translation preserves each copy's line structure,
    # so the induced self-repeat (and its removal) scales 1:1 with docs
    "self_repetition_removal": "cipher",
    # r12 registrations, trend-rowed in the same round: the graded
    # contamination score and its bloom gate ride the documents axis
    # (each cipher copy contributes ~1/17 of its ids to the benchmark
    # slice, so the benchmark grows with the corpus — the worst case
    # for the broadcast side); semantic_dedup rides the rotated
    # embeddings and is SPECIAL-CASED below: its within-bucket
    # pairwise cost is N^2/nlist, so the trend applies the operator's
    # own sizing rule (nlist ~ sqrt(N)) on BOTH engines instead of
    # freezing the sf0.01 nlist=16 and measuring a quadratic nobody
    # would deploy.
    "contamination_score": "cipher",
    # r14: BM25 rides the cipher axis — disjoint vocab per copy means
    # each seed query (1-in-97 of every copy) only matches its own
    # copy, so scored pairs grow LINEARLY with the corpus (the
    # realistic retrieval growth law), not quadratically
    "bm25_topk_docs": "cipher",
    # dedup_substrings also rides cipher: per-copy disjoint vocab means
    # spans duplicate only within a copy — per-doc output, linear work
    "dedup_substrings": "cipher",
    # containment: same linear-pair law as minhash/jaccard on cipher
    "containment_neardup": "cipher",
    "decontaminate_bloom_gate": "cipher",
    "semantic_dedup": "cipher",
    # PQ rides the rotated embeddings; codebooks/encode are plan
    # constants + scan-local expressions, so the axis measures the
    # encode+score scan (the rerank variant adds the bounded
    # candidate join)
    "pq_ann_topk": "cipher",
    "pq_ann_rerank": "cipher",
    "ivf_pq_ann_topk": "cipher",
    # r13 registrations, trend-rowed in the same round: the
    # temperature mixer is a dimension-sized aggregate over the
    # documents axis (source/n_chars preserved per cipher copy); the
    # filtered ANN rides the rotated embeddings (labels preserved per
    # copy, queries constant at vec_id < 20); cross-corpus near-dup
    # splits each cipher corpus 2:1 on doc_id % 3 — per-copy
    # translation keeps the cross-boundary dup density linear in K
    # exactly like the self-join row
    "temperature_mixture": "cipher",
    "filtered_ann_topk": "cipher",
    "cross_corpus_neardup": "cipher",
    # filtered IVF rides the rotated embeddings like the other ANN
    # rows; the estimate gate rides the cipher documents (pair count
    # grows linearly, same axis as minhash_neardup)
    "filtered_ivf_ann_topk": "cipher",
    "minhash_estimate_gate": "cipher",
    # the CM sketch rides the documents axis; translation grows the
    # vocabulary linearly (each copy's tokens are distinct), which is
    # exactly the regime the sketch exists for
    "cm_heavy_hitters": "cipher",
    # late r14: the surprisal scorer and the drift monitor are
    # one-pass token aggregates over the documents axis (per-copy
    # disjoint vocab keeps every token's corpus count equal to its
    # copy count — per-doc scores are copy-invariant, work linear);
    # DSIR's hashed buckets are FIXED at 4096, so bucket counts grow
    # linearly and the candidate scoring join stays bucket-keyed
    "ccnet_surprisal_buckets": "cipher",
    "dsir_select": "cipher",
    "corpus_drift_tv": "cipher",
    # hybrid RRF: the BM25 leg is linear on cipher (per-copy vocab);
    # since r15 the semantic leg's query set is BOUNDED (id % 97 == 0
    # AND id < HYBRID_Q_ID_CAP -> <= 21 queries at any corpus size),
    # so the brute-force cosine leg is queries x corpus = LINEAR in
    # the corpus — trendable past x10 now. Query sets that grow with
    # the corpus belong on hybrid_rrf_ivf
    "hybrid_rrf_retrieval": "cipher",
    # the bigram LM rides the same axis as the unigram form: per-copy
    # disjoint vocab keeps transition counts copy-invariant
    "bigram_surprisal_buckets": "cipher",
    # the IVF-leg hybrid swaps the exact scan for the IVF index at the
    # registered nlist=16; measured at x10 only, like its exact twin —
    # the flat hash-quantizer inlines centroids as plan literals, so a
    # sqrt(N)-sized nlist bloats task binaries (5 MiB at nlist=500)
    # instead of helping; the AT-SCALE semantic leg is the bucketed
    # IncrementalIVFPQIndex (its own trend rows), and the RRF fuse
    # composes with any ranked leg unchanged
    "hybrid_rrf_ivf": "cipher",
    # r15: the fastText-shape classifier is one explode + a broadcast
    # 4096-row model join + one per-doc aggregate over the documents
    # axis — work linear in corpus tokens, model size constant
    "quality_classifier_score": "cipher",
    # r15: the subword walk is scan-local (zero shuffles) over the
    # documents axis — the trend measures the per-character CASE-chain
    # constant factor, linear in corpus characters
    "subword_segment": "cipher",
    # the KN bigram LM rides the same axis as the add-one bigram form:
    # per-copy disjoint vocab keeps counts, continuation counts and
    # distinct-bigram totals copy-invariant — work linear in tokens
    "kn_bigram_surprisal": "cipher",
    # the composite gate = gopher (scan-local) + classifier (broadcast
    # model join) + ccnet (one-pass LM aggregates) + two id equi-joins
    # — every branch linear on the documents axis
    "quality_gate_composite": "cipher",
    # budgets fixed => output ~constant while the per-source windows
    # sweep the grown corpus (same law as token_budget_mixture); the
    # subword walk itself is scan-local
    "token_budget_mixture_subword": "cipher",
    # subword-budgeted packing: chunking + the walk are scan-local,
    # one bucket-window shuffle — same law as packed_sequences
    "packed_sequences_subword": "cipher",
    # span decontamination rides cipher like dedup_substrings: each
    # copy's 1/17 benchmark slice only matches its own copy's spans,
    # so bench set and matches both grow linearly
    "scrub_benchmark_spans": "cipher",
    # multiclass langid: same law as the binary classifier (one
    # broadcast-join scan + per-doc aggregate), 5 sum measures
    "lang_classifier_scores": "cipher",
    # r16: the incremental IVF-PQ rides the rotated embeddings like
    # ivf_pq_ann_topk (quantizers freeze on the vec_id % 3 = 0 slice
    # of the GROWN corpus; appends encode scan-local; the probe reads
    # nprobe/nlist of the bucket-pruned codes — the r16 pushdown)
    "ivf_pq_ann_incremental": "cipher",
    # r16: the BPE merge-rank walk is scan-local like the WordPiece
    # walk — the trend measures the bounded pair-merge fold's
    # per-character constant, linear in corpus characters
    "bpe_segment": "cipher",
    # BPE-budgeted mixing: same law as the subword budget twin
    "token_budget_mixture_bpe": "cipher",
}


def _semantic_nlist(n_vecs: int) -> int:
    """The IncrementalANNIndex sizing rule applied to SemDeDup's
    quantizer: nlist ~ sqrt(N) (x50: 100k vecs -> 316 lists)."""
    return max(16, int(n_vecs ** 0.5))
_sel = os.environ.get("SCALE_LLM_QUERIES")
if _sel:
    QUERIES = {q: QUERIES[q] for q in _sel.split(",") if q}


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _python_media_baseline(doc_ids, which: str) -> float:
    """Single-process decode-to-decode comparator for the two media
    rows (r11 verdict task 4). The DuckDB oracle computes a CLOSED
    FORM of doc_id — no container bytes ever exist on that side — so
    the duck ratio for image_dhash_groups / audio_fingerprint_groups
    was decode-vs-formula: fine for correctness, unquotable for
    performance. This runs the SAME work as the Spark operator —
    synthesize the container bytes (multimodal.py synth_real_media_
    table), decode them, hash (image_dhash / audio_fingerprint inner
    loops), group and join back — in ONE Python process with the same
    codecs and numpy, no Spark. Returns wall seconds."""
    import numpy as np

    from dagster_etl_spark.operators.codecs import (
        decode_media,
        decode_wav,
        encode_png,
        encode_ppm,
        encode_wav,
        sniff_format,
    )
    from dagster_etl_spark.operators.codecs_jpeg import encode_jpeg

    t0 = time.perf_counter()
    per_asset: dict[int, int] = {}
    for aid in doc_ids:
        aid = int(aid)
        kind = aid % 4
        # payload synthesis == multimodal.py:142-168
        if kind == 0:
            w, h = 8 + aid % 9, 8 + (aid * 3) % 9
            y, x = np.mgrid[0:h, 0:w]
            img = (x + y)[:, :, None] + np.arange(3)[None, None, :]
            payload = encode_ppm(img.astype(np.uint8))
        elif kind == 1:
            n = 50 + aid % 200
            payload = encode_wav((np.arange(n) % 7 - 3).astype(np.int16))
        elif kind == 2:
            w, h = 8 + aid % 9, 8 + (aid * 3) % 9
            y, x = np.mgrid[0:h, 0:w]
            payload = encode_png((x + y).astype(np.uint8))
        else:
            wb, hb = 1 + aid % 3, 1 + (aid * 3) % 3
            by, bx = np.mgrid[0:hb, 0:wb]
            blocks = (aid % 200 + 7 * bx + 13 * by).astype(np.uint8)
            img = blocks.repeat(8, axis=0).repeat(8, axis=1)
            payload = encode_jpeg(img, quality=100)

        if which == "dhash":
            # == image_dhash inner loop (multimodal.py:281-308)
            arr = decode_media(payload)
            if arr.ndim < 2:
                continue
            g = (
                arr.astype(np.int64).sum(axis=2)
                if arr.ndim == 3
                else arr.astype(np.int64)
            )
            h, w = g.shape
            yi = (np.arange(8) * h) // 8
            xi = (np.arange(9) * w) // 9
            s = g[np.ix_(yi, xi)]
            bits = (s[:, 1:] > s[:, :-1]).ravel()
            weights = np.left_shift(np.uint64(1), np.arange(64, dtype=np.uint64))
            u = int(weights[bits].sum(dtype=np.uint64))
        else:
            # == audio_fingerprint inner loop (multimodal.py:607-633)
            if sniff_format(payload) != "wav":
                continue
            arr = decode_wav(payload)[0].astype(np.int64)
            if arr.ndim == 2:
                arr = arr.sum(axis=1)
            n = arr.size
            idx = (np.arange(66, dtype=np.int64) * n) // 65
            cum = np.concatenate(([0], np.cumsum(arr)))
            s = cum[idx[1:]] - cum[idx[:-1]]
            bits = s[1:] > s[:-1]
            weights = np.left_shift(np.uint64(1), np.arange(64, dtype=np.uint64))
            u = int(weights[bits].sum(dtype=np.uint64))
        per_asset[aid] = u - (1 << 64) if u >= (1 << 63) else u

    # group + join-back (the query's groupBy/join, single-process)
    groups: dict[int, list[int]] = {}
    for a, hsh in per_asset.items():
        g = groups.setdefault(hsh, [0, a])
        g[0] += 1
        g[1] = min(g[1], a)
    _ = [(a, hsh, groups[hsh][0], groups[hsh][1]) for a, hsh in per_asset.items()]
    return time.perf_counter() - t0


def _cipher_docs(docs, k: int, n: int):
    """K textually-distinct copies via per-copy letter translation."""
    from pyspark.sql import functions as F

    lower, upper = string.ascii_lowercase, string.ascii_uppercase
    parts = []
    for i in range(k):
        if i == 0:
            t = F.col("text")
        else:
            r1 = i % 25 + 1
            r2 = (i // 25) % 26
            t = F.translate(
                F.col("text"),
                lower + upper,
                lower[r1:] + lower[:r1] + upper[r2:] + upper[:r2],
            )
        parts.append(
            docs.select(
                (F.col("doc_id") + i * n).alias("doc_id"),
                t.alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _rot_embeddings(emb, k: int, n: int, dim: int = 64):
    from pyspark.sql import functions as F

    parts = []
    for i in range(k):
        r = i % dim
        if r == 0:
            v = F.col("embedding")
        else:
            v = F.concat(
                F.slice("embedding", r + 1, dim - r), F.slice("embedding", 1, r)
            )
        parts.append(
            emb.select(
                (F.col("vec_id") + i * n).alias("vec_id"),
                v.alias("embedding"),
                "label",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _materialize(spark, k: int) -> dict[str, str]:
    from pyspark.sql import functions as F

    from dagster_etl_spark.scratch import scratch_dir
    from dagster_etl_spark.sources.fixtures import load_table
    from tools.scale_smoke import inflate

    dirs = {
        "cipher": scratch_dir(f"scale_trend_llm_cipher_x{k}"),
        "dup": scratch_dir(f"scale_trend_llm_dup_x{k}"),
    }
    docs = load_table(spark, SF_DIR, "documents")
    n = docs.count()
    cip = _cipher_docs(docs, k, n) if k > 1 else docs
    cip.repartition(32).write.mode("overwrite").parquet(
        f"{dirs['cipher']}/documents.parquet"
    )
    dup = (
        inflate(docs.select("doc_id", "text"), k) if k > 1
        else docs.select("doc_id", "text")
    )
    dup.repartition(32).write.mode("overwrite").parquet(
        f"{dirs['dup']}/documents.parquet"
    )
    emb = load_table(spark, SF_DIR, "embeddings")
    ne = emb.count()
    rot = _rot_embeddings(emb, k, ne) if k > 1 else emb
    rot.withColumn("embedding", F.col("embedding").cast("array<float>")) \
        .repartition(32).write.mode("overwrite").parquet(
            f"{dirs['cipher']}/embeddings.parquet"
        )
    return dirs


def main() -> None:
    import duckdb

    from dagster_etl_spark import registry
    from dagster_etl_spark.plans.cache import release_pinned
    from dagster_etl_spark.session import get_spark

    spark = get_spark("scale-trend-llm")
    specs = registry.all_queries()
    qs = registry.queries()

    result: dict[str, dict] = {q: {} for q in QUERIES}
    rows = {}
    for k in MULTS:
        dirs = _materialize(spark, k)
        cons = {}
        for kind, d in dirs.items():
            con = duckdb.connect()
            for t in ("documents", "embeddings"):
                p = f"{d}/{t}.parquet"
                if Path(p).exists():
                    con.execute(
                        f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{p}/*.parquet')"
                    )
            cons[kind] = con
        rows[f"x{k}"] = {
            "documents": cons["cipher"].execute(
                "SELECT COUNT(*) FROM documents"
            ).fetchone()[0],
            "embeddings": cons["cipher"].execute(
                "SELECT COUNT(*) FROM embeddings"
            ).fetchone()[0],
        }

        for qname, kind in QUERIES.items():
            con = cons[kind]
            oracle = specs[qname].oracle
            data_dir = dirs[kind]

            def build():
                release_pinned()
                return qs[qname](spark, data_dir)

            if qname == "semantic_dedup":
                from dagster_etl_spark.operators.dedup import semantic_dedup
                from dagster_etl_spark.queries_llm import (
                    SEMDEDUP_COS_T,
                    _semantic_dedup_oracle,
                )
                from dagster_etl_spark.sources.fixtures import load_table

                n_vecs = rows[f"x{k}"]["embeddings"]
                nlist = _semantic_nlist(n_vecs)
                oracle = _semantic_dedup_oracle(nlist=nlist)

                def build(nlist=nlist, data_dir=data_dir):
                    release_pinned()
                    return semantic_dedup(
                        load_table(spark, data_dir, "embeddings"),
                        nlist=nlist,
                        threshold=SEMDEDUP_COS_T,
                    )

            con.execute(oracle).arrow()  # warm
            _noop(build())
            ducks: list[float] = []
            sparks: list[float] = []
            for _ in range(RUNS):
                t0 = time.perf_counter()
                con.execute(oracle).arrow()
                ducks.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                _noop(build())
                sparks.append(time.perf_counter() - t0)
            release_pinned()
            d = statistics.median(ducks)
            s = statistics.median(sparks)
            result[qname][f"x{k}"] = {
                "duckdb_sec": round(d, 3),
                "spark_sec": round(s, 3),
                "ratio": round(s / d, 2),
                "duck_spread_sec": round(max(ducks) - min(ducks), 3),
                "spark_spread_sec": round(max(sparks) - min(sparks), 3),
            }
            if qname in ("image_dhash_groups", "audio_fingerprint_groups"):
                # the duck oracle is a closed form (no bytes), so its
                # ratio is decode-vs-formula; pair these rows with a
                # like-for-like single-process decode loop instead
                which = "dhash" if qname == "image_dhash_groups" else "afp"
                doc_ids = (
                    con.execute("SELECT doc_id FROM documents")
                    .fetchnumpy()["doc_id"]
                )
                py = _python_media_baseline(doc_ids, which)
                row = result[qname][f"x{k}"]
                row["python_single_sec"] = round(py, 3)
                row["ratio_vs_python_decode"] = round(s / py, 3)
                row["duck_ratio_note"] = (
                    "duckdb side is a closed form of doc_id (no decode); "
                    "quote ratio_vs_python_decode"
                )
            print(
                f"# {qname} x{k}: duck {d:.3f}s spark {s:.3f}s "
                f"ratio {s / d:.2f}",
                file=sys.stderr,
            )
        for con in cons.values():
            con.close()
    print(
        json.dumps(
            {
                "sf_dir": SF_DIR,
                "multipliers": MULTS,
                "runs": RUNS,
                "rows": rows,
                "methodology": "same parquet both engines; interleaved "
                "D,S pairs; median per engine; oracle via .arrow() vs "
                "noop-sink registered query with release_pinned between "
                "builds; cipher axis = distinct copies (linear pair "
                "growth), dup axis = identical copies (dedup workload), "
                "embeddings rotated per copy. Media rows (dhash/afp) "
                "additionally carry python_single_sec: the SAME synth+"
                "decode+hash+group loop in one Python process (same "
                "codecs/numpy, no Spark) — the decode-to-decode "
                "comparator; their duckdb_sec is a closed form of "
                "doc_id (no bytes) and is kept for the trend only.",
                "queries": result,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
