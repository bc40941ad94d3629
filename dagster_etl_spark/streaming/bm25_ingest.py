"""Streaming BM25 ingest: the IncrementalBM25Index fed by a Structured
Streaming source, one ingest per micro-batch via ``foreachBatch``.

Same contract as streaming/neardup_ingest.py, applied to the retrieval
index: a crawl that lands as a stream is absorbed a micro-batch at a
time, and because the index state (postings, partial document
frequencies, totals) is ADDITIVE over disjoint slices with fixed-point
quantization deferred to query time, the post-stream ``topk`` equals
the one-shot :func:`bm25_topk_docs` over the full corpus
integer-for-integer — no matter how the stream chops it. The registered
query therefore reuses the one-shot oracle unchanged.

foreachBatch is the boundary because an ingest is a multi-table
transaction-shaped step (postings, dfs, totals). Since r16 the batch
body is ``ingest_slice`` — the EXACTLY-ONCE slice-store path
(streaming/slicestore.py): each batch stages into an overwrite-mode
slice directory keyed by the checkpointed batch id and becomes visible
at an atomic manifest commit, so a crash at ANY point replays into an
identical state (kill/restart-tested in
tests/test_streaming_recovery.py). ``compact_slices`` then folds the
committed slices into the bucketed base tables post-stream, so the
query-time plan is the same co-located probe as the batch-built
index.

Reference parity note: the reference is batch-only (SURVEY §2.7); this
is the streaming generalization of its idempotent daily-reprocessing
contract (etl/common/assets/transfer.py).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession


def streaming_bm25_ingest(
    spark: SparkSession,
    sf_dir: str,
    n_files: int = 4,
    k: int = 10,
    seed_mod: int = 97,
) -> DataFrame:
    """Stream the documents fixture through the incremental BM25 index
    in ``n_files`` micro-batches, then run the standing-index topk with
    the same seed-doc queries as the one-shot operator."""
    from dagster_etl_spark.operators.text import IncrementalBM25Index
    from dagster_etl_spark.scratch import scratch_dir
    from dagster_etl_spark.sources.fixtures import load_table

    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    docs = load_table(spark, sf_dir, "documents")
    work = scratch_dir(f"stream_bm25_{sfx}")
    in_dir = f"{work}/docs"
    docs.repartition(n_files).write.mode("overwrite").parquet(in_dir)
    schema = spark.read.parquet(in_dir).schema

    idx = IncrementalBM25Index(spark, f"sbm_{sfx}")
    idx.drop()  # fresh rebuild each call (correctness surface)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )

    def ingest_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        idx.ingest_slice(batch_df, batch_id)

    q = (
        stream.writeStream.foreachBatch(ingest_batch)
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    idx.compact_slices()
    seeds = docs.filter(f"doc_id % {seed_mod} = 0").select("doc_id", "text")
    return idx.topk(seeds, k=k)
