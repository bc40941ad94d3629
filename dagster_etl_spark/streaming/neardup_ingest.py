"""Streaming near-dup ingest: the IncrementalNearDupIndex fed by a
Structured Streaming source, one ingest per micro-batch via
``foreachBatch``.

This is the r11 incremental trilogy meeting the streaming extension:
a crawl that lands as a stream (Kafka topic, file drops) doesn't get
batched into days first — each micro-batch is "today's slice". The
pair-completeness invariant (operators/dedup.py) is slicing-agnostic:
every pair is found on the micro-batch where its later member arrives,
never re-found, so the accumulated pairs table equals the one-shot
MinHash+LSH over the full corpus no matter how the stream chops it.

foreachBatch is the right boundary because an ingest is a multi-table
TRANSACTION-shaped step (bands, hashes, pairs) — not a single
streaming aggregation. Since r16 the batch body is ``ingest_slice`` —
the EXACTLY-ONCE slice-store path (streaming/slicestore.py): each
batch stages into an overwrite-mode slice directory keyed by the
checkpointed batch id and becomes visible at an atomic manifest
commit, so a crash at ANY point replays into an identical state
(kill/restart-tested in tests/test_streaming_recovery.py);
``compact_slices`` folds the committed slices into the bucketed base
tables post-stream, restoring the co-located probe plan.

Reference parity note: the reference is batch-only (SURVEY §2.7); its
dedup story is idempotent daily reprocessing (etl/common/assets/
transfer.py). This is the streaming generalization of the same
contract.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession


def streaming_neardup_ingest(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.2,
    n_files: int = 4,
) -> DataFrame:
    """Stream the documents fixture through the incremental index in
    ``n_files`` micro-batches (the fixture is re-materialized into
    that many files and streamed with maxFilesPerTrigger=1 — a single
    parquet file would collapse to one degenerate batch), then return
    the accumulated pairs table."""
    from dagster_etl_spark.operators.dedup import IncrementalNearDupIndex
    from dagster_etl_spark.scratch import scratch_dir
    from dagster_etl_spark.sources.fixtures import load_table

    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    docs = load_table(spark, sf_dir, "documents")
    work = scratch_dir(f"stream_nd_{sfx}")
    in_dir = f"{work}/docs"
    docs.repartition(n_files).write.mode("overwrite").parquet(in_dir)
    schema = spark.read.parquet(in_dir).schema

    idx = IncrementalNearDupIndex(spark, f"snd_{sfx}")
    idx.drop()  # fresh rebuild each call (correctness surface)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )

    def ingest_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        idx.ingest_slice(batch_df, batch_id, threshold=threshold)

    q = (
        stream.writeStream.foreachBatch(ingest_batch)
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    idx.compact_slices()
    return idx.pairs()
