"""Streaming DSIR ingest: the IncrementalDSIRModel fed by a Structured
Streaming source, one exactly-once ingest per micro-batch via
``foreachBatch`` + the slice store (streaming/slicestore.py).

This is the r17 completion of the exactly-once rollout across all
streamed incremental indexes (BM25 and near-dup in r16, unigram-LM and
DSIR here): the importance-resampling model a curation deployment keeps
warm absorbs the crawl stream one micro-batch at a time, and because
its per-bucket target/raw counts and totals are ADDITIVE over disjoint
slices with smoothing and the k-th-largest threshold applied at probe
time, the post-stream ``select`` equals the one-shot
:func:`~dagster_etl_spark.operators.text.dsir_select` over the full
corpus integer-for-integer — the registered query reuses the one-shot
oracle unchanged.

The batch body is ``ingest_slice``: each batch stages (counts, totals)
into an overwrite-mode slice directory keyed by the checkpointed batch
id and becomes visible at the atomic manifest commit, so a crash at ANY
point replays into an identical state (kill/restart-tested in
tests/test_streaming_recovery.py). ``compact_slices`` folds the
committed slices into the bucketed base tables post-stream.

Reference parity note: the reference is batch-only (SURVEY §2.7); this
is the streaming generalization of its idempotent daily-reprocessing
contract applied to the importance-sampling model.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession


def streaming_dsir_ingest(
    spark: SparkSession,
    sf_dir: str,
    n_files: int = 4,
    k: int = 25,
    work_dir: str | None = None,
    fail_at: tuple[int, str] | None = None,
) -> DataFrame:
    """Stream the documents fixture through the incremental DSIR model
    in ``n_files`` micro-batches (exactly-once via ingest_slice), then
    select the top-k candidates against the standing state — exactly
    dsir_select's output.

    ``work_dir`` pins the scratch root so a second call recovers from
    the same checkpoint (freshness derives from {work}/docs being
    fully committed — its parquet _SUCCESS marker);
    ``fail_at=(batch_id, hook_label)`` injects a crash at that
    ingest_slice fault hook (labels: staged_counts, staged_totals,
    post_commit)."""
    from dagster_etl_spark.operators.text import IncrementalDSIRModel
    from dagster_etl_spark.scratch import scratch_dir
    from dagster_etl_spark.sources.fixtures import load_table
    from dagster_etl_spark.sources.lake import staged_complete

    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    docs = load_table(spark, sf_dir, "documents")
    work = scratch_dir(f"stream_dsir_{sfx}") if work_dir is None else work_dir
    in_dir = f"{work}/docs"
    fresh = not staged_complete(spark, in_dir)
    wid = hashlib.md5(work.encode()).hexdigest()[:8]
    m = IncrementalDSIRModel(spark, f"sdsir_{wid}")
    if fresh:
        docs.repartition(n_files).write.mode("overwrite").parquet(in_dir)
        m.drop()  # fresh rebuild (correctness surface)
    schema = spark.read.parquet(in_dir).schema

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )

    def ingest_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return

        def hook(label: str) -> None:
            if fail_at is not None and fail_at == (batch_id, label):
                raise RuntimeError(
                    f"injected kill at batch {batch_id} / {label}"
                )

        m.ingest_slice(batch_df, batch_id, fault_hook=hook)

    q = (
        stream.writeStream.foreachBatch(ingest_batch)
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    m.compact_slices()
    return m.select(docs, k=k)
