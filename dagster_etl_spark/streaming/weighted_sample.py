"""Streaming weighted sampling: the integer-ticket sampler
(operators/sampling.weighted_sample_topk) maintained over a stream.

The ticket scheme is MERGEABLE: a row's ticket is a pure function of
(seed, id, weight), so the bottom-k of a union equals the bottom-k of
any partition's bottom-k's merged — which makes the weighted sample a
streaming aggregate. Each micro-batch keys its own rows and the
retained state is simply the k smallest tickets seen so far (per
group); when the stream ends the state IS the exact weighted sample of
everything that flowed past, bit-identical to the batch operator over
the full corpus (the slicing-agnostic invariant, same as the
incremental near-dup index).

This is how a 100 TB ingest keeps a standing quality-weighted eval
subsample without ever re-reading the corpus: O(k) state per group, an
O(batch) ticket projection per micro-batch, and the merge is one
union + window.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession


def streaming_weighted_sample(
    spark: SparkSession,
    sf_dir: str,
    weight_expr: str = "1 + n_chars % 8",
    k: int = 20,
    group_col: str = "source",
    seed: int = 7,
    n_files: int = 4,
    work_dir: str | None = None,
    fail_at_batch: int | None = None,
) -> DataFrame:
    """Stream the documents fixture in ``n_files`` micro-batches,
    maintaining the per-group bottom-k ticket state in foreachBatch;
    return the final state — the exact weighted sample of the full
    corpus (same oracle as the batch weighted_corpus_sample).

    Replay safety (r16): the merge is IDEMPOTENT — tickets are pure
    functions of (seed, id, weight) and the union dedups on (group,
    id) before ranking, so a checkpoint-replayed batch (crash after
    the state write, before Spark's checkpoint commit) re-merges its
    own rows into an identical bottom-k. Without the dedup a replayed
    row would enter the window TWICE and its duplicate could evict a
    legitimate doc from the k. ``work_dir`` pins the scratch root so a
    second call recovers from the same checkpoint;
    ``fail_at_batch`` injects a crash in exactly that window
    (tests/test_streaming_recovery.py)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from dagster_etl_spark.operators.sampling import _ticket_expr
    from dagster_etl_spark.functions import xdialect as x
    from dagster_etl_spark.scratch import scratch_dir
    from dagster_etl_spark.sources.fixtures import load_table

    sfx = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", group_col, "n_chars"
    )
    import os

    work = scratch_dir(f"stream_ws_{sfx}") if work_dir is None else work_dir
    in_dir = f"{work}/docs"
    # Freshness is a property of the WORK DIR, not of who named it
    # (r16 ADVICE): a pinned work_dir with no docs staging yet is a
    # FIRST call and must stage; one with staging present must not.
    # Gate on the parquet _SUCCESS marker, not bare dir existence
    # (r17 ADVICE): a crash mid-staging leaves a partial dir that a
    # recovery call must re-stage, not trust. (scratch_dir() wipes on
    # re-request, so the default path is always fresh by construction.)
    fresh = not os.path.isfile(os.path.join(in_dir, "_SUCCESS"))
    # the state identity follows the WORK DIR (not just sf_dir): a
    # pinned-work recovery call must find the same table the crashed
    # run wrote, and two different work dirs must never collide on a
    # leftover warehouse location
    wid = hashlib.md5(work.encode()).hexdigest()[:8]
    state_table = f"ws_state_{wid}"
    recovering = os.path.isdir(f"{work}/ckpt")
    if fresh:
        docs.repartition(n_files).write.mode("overwrite").parquet(in_dir)
    if not recovering:
        spark.sql(f"DROP TABLE IF EXISTS {state_table}")
        from dagster_etl_spark.sources.lake import delete_path

        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        delete_path(spark, f"{warehouse}/{state_table}")
    schema = spark.read.parquet(in_dir).schema

    key = _ticket_expr("doc_id", weight_expr, seed, x.SPARK)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        s = batch_df.sparkSession  # fresh per batch: relation cache safe
        keyed = batch_df.selectExpr("*", f"{key} AS ticket").filter(
            F.col("ticket").isNotNull()
        )
        if s.catalog.tableExists(state_table):
            keyed = s.table(state_table).drop("sample_rank").unionByName(keyed)
        # replay absorption: a checkpoint-replayed batch's rows are
        # already in the state — dedup on identity before ranking so
        # the re-merge is a fixpoint (tickets are deterministic, so
        # duplicates are bit-identical rows)
        keyed = keyed.dropDuplicates([group_col, "doc_id"])
        w = Window.partitionBy(group_col).orderBy("ticket", "doc_id")
        merged = (
            keyed.withColumn("sample_rank", F.row_number().over(w).cast("long"))
            .filter(F.col("sample_rank") <= k)
        )
        # overwrite a table the plan reads: stage through a collected
        # local frame — the state is O(k * groups) rows BY DESIGN (the
        # one bounded-driver-side exception, same class as the nlist
        # centroid collect in similarity.py)
        rows = merged.collect()
        s.createDataFrame(rows, merged.schema).write.mode(
            "overwrite"
        ).saveAsTable(state_table)
        if fail_at_batch is not None and batch_id == fail_at_batch:
            # the at-least-once window: state written, checkpoint not
            # committed — the restart replays this batch
            raise RuntimeError(f"injected kill at batch {batch_id}")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", f"{work}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark.catalog.refreshTable(state_table)
    return spark.table(state_table)
