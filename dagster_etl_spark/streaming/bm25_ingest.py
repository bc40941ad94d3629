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
transaction-shaped step (append postings, append dfs, append totals);
a replayed batch after a crash would re-append (at-least-once) — at
scale the checkpointed batch id gates re-execution exactly as in the
upsert sink docstring (streaming/sinks.py).

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
        idx.ingest(batch_df)

    q = (
        stream.writeStream.foreachBatch(ingest_batch)
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    seeds = docs.filter(f"doc_id % {seed_mod} = 0").select("doc_id", "text")
    return idx.topk(seeds, k=k)
