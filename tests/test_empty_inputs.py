"""Empty-input robustness: every core operator must return an EMPTY
frame with the right schema — not throw — when its input has no rows
(the daily-partition-with-no-data case every production pipeline hits).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _empty_like(df):
    return df.filter(F.lit(False))


def test_aggregation_operators_on_empty(spark):
    from dagster_etl_spark.operators.equipment import equipment_utilization
    from dagster_etl_spark.operators.wip import priority_wip_aggregate, wip_aggregate
    from dagster_etl_spark.sources.fixtures import load_table
    from tests.conftest import SF_SMALL

    li = _empty_like(load_table(spark, SF_SMALL, "lineitem"))
    out = wip_aggregate(
        li, group_cols=("l_linestatus", "l_suppkey"), qty_col="l_quantity",
        lot_col="l_orderkey", status_col="l_returnflag", active_statuses=("N", "A"),
    )
    assert out.count() == 0
    assert set(out.columns) == {
        "l_linestatus", "l_suppkey", "wip_qty", "lot_count", "avg_qty_per_lot",
    }
    out2 = priority_wip_aggregate(
        li.withColumn("o_orderpriority", F.lit("1-URGENT")),
        priority_col="o_orderpriority", high_value="1-URGENT",
        group_cols=("l_linestatus", "l_suppkey"), qty_col="l_quantity",
        lot_col="l_orderkey", status_col="l_returnflag", active_statuses=("N", "A"),
    )
    assert out2.count() == 0 and "high_priority_count" in out2.columns

    ev = _empty_like(load_table(spark, SF_SMALL, "events")).withColumn(
        "equipment_id", F.col("user_id") % 50
    )
    pivoted = equipment_utilization(
        ev, equipment_col="equipment_id", type_col="event_type",
        duration_col="value", event_types=("click", "view"),
        rate_numerator="click", rate_round=None,
    )
    assert pivoted.count() == 0  # fixed value list -> schema survives empty

def test_text_and_dedup_operators_on_empty(spark):
    from dagster_etl_spark.operators.dedup import (
        dedup_clusters,
        exact_dedup_stats,
        minhash_neardup_pairs,
    )
    from dagster_etl_spark.operators.text import chunk_docs, doc_stats, winnow_fingerprints
    from dagster_etl_spark.sources.fixtures import load_table
    from tests.conftest import SF_SMALL

    docs = _empty_like(load_table(spark, SF_SMALL, "documents"))
    assert doc_stats(docs).count() == 0
    assert exact_dedup_stats(docs).count() == 0
    assert minhash_neardup_pairs(docs).count() == 0
    assert chunk_docs(docs).count() == 0
    assert winnow_fingerprints(docs).count() == 0
    # iterative operator: empty pair set -> every doc (none) is a singleton
    assert dedup_clusters(docs).count() == 0


def test_temporal_and_history_on_empty(spark):
    from dagster_etl_spark.operators.history import latest_per_key, scd2_intervals
    from dagster_etl_spark.operators.temporal import fill_time_gaps
    from dagster_etl_spark.sources.fixtures import load_table
    from tests.conftest import SF_SMALL

    ev = _empty_like(load_table(spark, SF_SMALL, "events"))
    assert fill_time_gaps(
        ev, keys=["user_id"], ts_col="ts", value_col="value",
        tiebreak_col="event_id", grain_sec=900,
    ).count() == 0
    assert latest_per_key(ev, keys=["user_id"], order_by=["ts", "event_id"]).count() == 0
    assert scd2_intervals(
        ev, keys=["user_id"], ts_col="ts", attr_cols=["event_type"],
        tiebreak=["event_id"],
    ).count() == 0


def test_validation_and_upsert_on_empty(spark, tmp_path):
    from dagster_etl_spark.sources.fixtures import load_table
    from dagster_etl_spark.validation import DataValidator
    from dagster_etl_spark.writers.upsert import upsert_parquet
    from tests.conftest import SF_SMALL

    orders = load_table(spark, SF_SMALL, "orders")
    empty = _empty_like(orders)
    report = (
        DataValidator(empty)
        .check_not_null("o_orderkey")
        .check_row_count(min_rows=0)
        .validate()
    )
    assert all(r.passed for r in report.results)

    # upserting an empty batch into an existing target is a no-op
    path = str(tmp_path / "t")
    orders.limit(10).write.parquet(path)
    stats = upsert_parquet(spark, empty, path, keys=["o_orderkey"])
    assert stats == {"deleted": 0, "inserted": 0}
    assert spark.read.parquet(path).count() == 10


def test_r14_operators_on_empty_and_degenerate(spark):
    """The four r14 operators on the no-rows day and the degenerate
    shapes a crawl really produces: empty corpus, all-empty texts, a
    corpus with no seed queries at all."""
    from pyspark.sql import Row

    from dagster_etl_spark.operators.dedup import (
        containment_pairs,
        containment_probe,
        dedup_substrings,
    )
    from dagster_etl_spark.operators.text import bm25_topk_docs
    from dagster_etl_spark.sources.fixtures import load_table
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    empty = _empty_like(docs)

    out = dedup_substrings(empty)
    assert out.count() == 0
    assert set(out.columns) == {
        "doc_id", "text", "n_tokens", "n_removed_tokens", "n_spans_removed"
    }
    assert containment_pairs(empty).count() == 0
    assert containment_probe(empty, docs).count() == 0
    assert containment_probe(docs, empty).count() == 0
    out = bm25_topk_docs(empty)
    assert out.count() == 0
    assert set(out.columns) == {
        "query_id", "doc_id", "score_scaled", "score", "rank"
    }

    # whitespace-only / empty texts: tokenizer yields [], every
    # operator passes through without a row exploding or a div-by-zero
    blank = spark.createDataFrame(
        [Row(doc_id=1, text=""), Row(doc_id=2, text="   ")]
    )
    rows = {r.doc_id: r for r in dedup_substrings(blank).collect()}
    assert rows[1].text == "" and rows[1].n_tokens == 0
    assert rows[1].n_removed_tokens == 0 and rows[2].n_spans_removed == 0
    assert containment_pairs(blank).count() == 0
    # avgdl division guard: an all-blank corpus has total_tokens 0 and
    # a seed doc (doc_id 0 % 97 == 0 is absent here), so zero rows out
    assert bm25_topk_docs(blank).count() == 0

    # corpus with no seed queries (no doc_id % 97 == 0): empty result,
    # not an error
    no_seeds = docs.filter("doc_id % 97 <> 0")
    assert bm25_topk_docs(no_seeds).count() == 0


def test_late_r14_operators_on_empty_and_degenerate(spark):
    """The late-r14 operators on the no-rows day and crawl-degenerate
    shapes: empty corpus, all-blank texts, single-language corpora,
    and a corpus with no selection candidates."""
    from pyspark.sql import Row

    from dagster_etl_spark.operators.similarity import hybrid_rrf_topk
    from dagster_etl_spark.operators.text import (
        ccnet_surprisal_buckets,
        corpus_drift_tv,
        dsir_select,
    )
    from dagster_etl_spark.sources.fixtures import load_table
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    emb = load_table(spark, SF_SMALL, "embeddings")
    empty = _empty_like(docs)

    out = ccnet_surprisal_buckets(empty)
    assert out.count() == 0
    assert set(out.columns) == {
        "doc_id", "dl", "surprisal_scaled", "surprisal", "bucket"
    }
    out = dsir_select(empty)
    assert out.count() == 0
    assert set(out.columns) == {"doc_id", "lang", "n_features", "weight_q"}
    assert corpus_drift_tv(empty).count() == 0
    out = hybrid_rrf_topk(empty, _empty_like(emb))
    assert out.count() == 0
    assert set(out.columns) == {
        "query_id", "doc_id", "lex_rank", "sem_rank", "rrf_scaled", "rrf", "rank"
    }

    # blank texts: dl=0 docs are excluded from surprisal (no 0-div);
    # no bigrams -> no dsir candidates; no tokens -> no drift slices
    blank = spark.createDataFrame(
        [Row(doc_id=1, lang="de", text=""), Row(doc_id=2, lang="en", text="   ")]
    )
    assert ccnet_surprisal_buckets(blank).count() == 0
    assert dsir_select(blank).count() == 0
    assert corpus_drift_tv(blank).count() == 0

    # single-language corpus: drift of the only slice vs itself is 0
    mono = spark.createDataFrame(
        [Row(doc_id=1, lang="en", text="a b c"), Row(doc_id=2, lang="en", text="a d")]
    )
    rows = corpus_drift_tv(mono).collect()
    assert len(rows) == 1 and rows[0].tv_scaled == 0

    # no raw candidates (everything is the target slice): empty, not
    # an error; and no target docs at all: weights still defined
    # (ct empty -> smoothing-only numerators), nothing throws
    all_target = spark.createDataFrame(
        [Row(doc_id=1, lang="en", text="a b"), Row(doc_id=2, lang="en", text="c d")]
    )
    assert dsir_select(all_target).count() == 0
    no_target = spark.createDataFrame(
        [Row(doc_id=1, lang="de", text="a b"), Row(doc_id=2, lang="fr", text="c d")]
    )
    got = dsir_select(no_target, k=5)
    assert got.count() == 2  # k >= candidates: all kept

    # hybrid with one empty leg still fuses the other (full outer)
    lexonly = hybrid_rrf_topk(docs, _empty_like(emb))
    assert lexonly.count() > 0
    assert lexonly.filter("sem_rank IS NOT NULL").count() == 0
