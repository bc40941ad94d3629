"""Streaming benchmark decontamination: the ingest-time shape of
operators/scrub.py's 13-gram rule.

A 100 TB crawl doesn't decontaminate in one batch pass at the end —
documents arrive continuously and the benchmark set is a STATIC side
known up front, so the natural operator is a stream-static join: each
micro-batch's documents explode to n-gram hashes, probe the broadcast
benchmark-gram relation, and contaminated docs are flagged/dropped
before they ever land in the training store. No streaming state at
all (the probe is stateless per batch — the benchmark relation is
planned once and broadcast into every micro-batch), so throughput is
the stateless-scan rate, not a state-store rate.

The gram expressions are the exact same xdialect chains as the batch
operator, so the stream's verdicts equal the batch verdicts doc-for-
doc (pinned by test + the registered query's DuckDB oracle, which is
the batch oracle)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dagster_etl_spark.functions import xdialect as x
from dagster_etl_spark.sources.fixtures import load_table
from dagster_etl_spark.streaming.media import read_documents_stream
from dagster_etl_spark.streaming.windowed import run_stream_to_batch


def contaminated_stream(
    stream: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    event_time_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Distinct contaminated ids from a documents STREAM — each batch's
    grams left-semi join the static benchmark grams (broadcast; the
    stream side never shuffles for the probe).

    State contract (r12 ADVICE): the plain ``dropDuplicates([id])``
    form keeps every emitted id as state forever — fine for a
    single-pass/bounded ingest (the registered query), unbounded on a
    long-running crawl. For long-horizon streams pass
    ``event_time_col``: the dedup switches to
    ``dropDuplicatesWithinWatermark`` under a ``watermark`` on that
    column, so state is bounded by the dedup horizon and a doc re-
    arriving later than the watermark may re-emit (same contract as
    streaming/dedup.py's delivery dedup)."""
    from dagster_etl_spark.operators.scrub import _grams

    bench_grams = F.broadcast(_grams(benchmark, text_col, None, n))
    sh = x.let(
        x.tokens(text_col, x.SPARK), "_t", x.shingles("_t", n, x.SPARK), x.SPARK
    )
    hashed = f"{x.xform('_sh', 's', x.h60('s', x.SPARK), x.SPARK)}"
    time_cols = [event_time_col] if event_time_col else []
    grams = stream.selectExpr(id_col, *time_cols, f"{sh} AS _sh").selectExpr(
        id_col, *time_cols, f"explode({hashed}) AS gh"
    )
    hits = grams.join(bench_grams, on="gh", how="left_semi")
    if event_time_col:
        return (
            hits.select(id_col, event_time_col)
            .withWatermark(event_time_col, watermark)
            .dropDuplicatesWithinWatermark([id_col])
            .select(id_col)
        )
    return hits.select(id_col).dropDuplicates([id_col])


def streaming_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query: stream the documents fixture through the
    13-gram probe against the static doc_id % 17 = 0 benchmark slice
    (the batch decontaminate_vs_benchmark's slice); executed to
    completion and returned as the distinct contaminated-id set —
    same oracle as the batch query.

    dropDuplicates on a stream keeps the seen-id set as state; with no
    watermark that state grows with the contaminated-id cardinality —
    bounded here and in any single-pass ingest, and the right
    dedup-key contract for append-mode emission (each contaminated doc
    emits exactly once, the first time it is seen)."""
    stream = read_documents_stream(spark, sf_dir)
    bench = load_table(spark, sf_dir, "documents").filter("doc_id % 17 = 0")
    return run_stream_to_batch(
        contaminated_stream(stream, bench), mode="append"
    )
