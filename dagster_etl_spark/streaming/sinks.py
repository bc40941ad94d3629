"""Streaming sinks: keyed-upsert via ``foreachBatch`` — the streaming
entry into the same S9 writer the batch pipeline uses.

Each micro-batch runs the null-safe delete-then-insert merge, so a
restarted/replayed batch converges instead of duplicating (the
streaming twin of the reference's re-run-a-partition idempotency;
upsert semantics: writers/upsert.py). At scale the same function body
targets Iceberg ``MERGE INTO`` with exactly-once via checkpointed
batch ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def upsert_sink(
    result: DataFrame,
    path: str,
    keys: list[str],
    checkpoint: str,
    mode: str = "update",
    available_now: bool = True,
) -> StreamingQuery:
    """Write a streaming aggregation through the keyed upsert writer.

    Update output mode pairs with upsert: each batch emits changed
    aggregate rows, the merge replaces prior values for those keys."""
    from dagster_etl_spark.writers.upsert import upsert_parquet

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_parquet(batch_df.sparkSession, batch_df, path, keys)

    writer = (
        result.writeStream.foreachBatch(write_batch)
        .outputMode(mode)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
