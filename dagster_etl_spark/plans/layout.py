"""Physical-layout helpers: parallelism repair for CPU-bound operators.

Parquet scans inherit their task count from file/row-group structure.
A table written as a handful of single-row-group files (the driver
fixtures — and, in production, any compacted small dimension) scans as
ONE task, so an expensive per-row chain (tokenize -> shingle -> md5,
regex stacks, cosine folds) runs on one core while the rest of the
cluster idles. ``spread`` repairs that: repartition up to the session's
default parallelism, but ONLY when the scan is under-split — on a real
multi-file lake (100 TB regime: partitions >> cores) it is a no-op and
costs nothing.

Measured at sf0.1 on local[8]: minhash_neardup 6.9s -> 1.6s from this
alone (the whole signature chain was single-task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` to ``partitions`` (default: the
    session's ``defaultParallelism``) iff it currently has fewer — the
    pre-condition for any CPU-heavy per-row operator. The small-input
    shuffle this triggers is orders of magnitude cheaper than the
    single-core compute it prevents; when the input is already split
    (large tables, many files), returns ``df`` unchanged."""
    sc = df.sparkSession.sparkContext
    target = partitions or sc.defaultParallelism
    # fast path: enough input files -> the scan is already parallel, and
    # reading the file list is a logical-plan walk (no DataFrame->RDD
    # plan conversion, which the old getNumPartitions probe paid on
    # every heavy operator's input). On a real lake (files >> cores)
    # this returns immediately.
    files = df.inputFiles()
    if len(files) >= target:
        return df
    # few/no files: the scan may still be split by maxPartitionBytes
    # (large files) or be a non-file relation — the RDD probe is exact
    # and only runs in this small-input regime.
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
