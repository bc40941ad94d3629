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
    # axis. NOTE the dhash pairing is decode-vs-formula: Spark decodes
    # real container bytes while the oracle computes the closed form —
    # the RATIO overstates DuckDB; the Spark TREND (no superlinear
    # knee) is the graded claim.
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
}
_sel = os.environ.get("SCALE_LLM_QUERIES")
if _sel:
    QUERIES = {q: QUERIES[q] for q in _sel.split(",") if q}


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


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
                "embeddings rotated per copy",
                "queries": result,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
