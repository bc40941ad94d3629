"""Deterministic sampling and dataset splitting for training-data
pipelines.

Random sampling (``df.sample``) is seed- and partitioning-dependent:
re-run the job with different file splits and you get a different
sample — unacceptable for reproducible training sets. These operators
derive every decision from a content hash of the row's id, so the
assignment is a pure function of the data: stable across reruns,
engines, partitionings, and cluster sizes, and embarrassingly parallel
(a projection — no shuffle, no state).

The hash is the engine-wide 60-bit md5 prefix (functions/xdialect.h60),
so DuckDB oracles reproduce the exact same sample/split.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dagster_etl_spark.functions import xdialect as x

_BUCKETS = 10_000


def _bucket_expr(id_col: str, d: str, salt: str = "") -> str:
    """Stable bucket in [0, 10000) from the id (salted so independent
    samples of the same table decorrelate)."""
    key = f"CAST({id_col} AS VARCHAR)" if d == x.DUCK else f"CAST({id_col} AS STRING)"
    if salt:
        key = f"concat('{salt}', {key})" if d == x.SPARK else f"('{salt}' || {key})"
    return f"({x.h60(key, d)} % {_BUCKETS})"


def hash_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by id hash — the same rows
    every run, on every engine, at every scale."""
    cut = int(round(fraction * _BUCKETS))
    return df.filter(F.expr(f"{_bucket_expr(id_col, x.SPARK, salt)} < {cut}"))


def split_expr(
    id_col: str,
    d: str,
    weights: Sequence[tuple[str, float]] = (
        ("train", 0.8),
        ("val", 0.1),
        ("test", 0.1),
    ),
    salt: str = "",
) -> str:
    """CASE expression assigning each row a split label by hash-bucket
    range; identical SQL shape in both dialects."""
    bucket = _bucket_expr(id_col, d, salt)
    clauses, lo = [], 0
    for name, w in weights[:-1]:
        hi = lo + int(round(w * _BUCKETS))
        clauses.append(f"WHEN {bucket} < {hi} THEN '{name}'")
        lo = hi
    last = weights[-1][0]
    return "CASE " + " ".join(clauses) + f" ELSE '{last}' END"


def hash_split(
    df: DataFrame,
    weights: Sequence[tuple[str, float]] = (
        ("train", 0.8),
        ("val", 0.1),
        ("test", 0.1),
    ),
    id_col: str = "doc_id",
    out_col: str = "split",
    salt: str = "",
) -> DataFrame:
    """Partition a corpus into train/val/test (or any labeled weights)
    deterministically by id hash. A row's split never changes when the
    corpus grows — only the id matters — so incremental ingestion can't
    leak validation docs into train."""
    return df.withColumn(out_col, F.expr(split_expr(id_col, x.SPARK, weights, salt)))
