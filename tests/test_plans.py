"""Physical-plan invariants for the batch query set — the 100 TB
posture, enforced: no cartesian products outside the two bounded
verifiers, no row-at-a-time Python evaluation anywhere, filters pushed
into the parquet scan, small dimensions broadcast. A regression that
silently de-optimizes a plan (a lost broadcast hint, a UDF sneaking
into a hot path) fails here before it costs anything at scale."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL

# batch-only, cheap-to-plan queries (streaming queries execute on build;
# ivf fits KMeans on build — both excluded from the sweep)
AUDITED = [
    "minhash_neardup",
    "simhash_neardup",
    "ann_cosine_topk",
    "lsh_ann_topk",
    "wip_aggregate",
    "priority_wip",
    "priority_wip_join",
    "cycle_time_stats",
    "equipment_pivot",
    "order_rank_window",
    "sessionize",
    "pricing_summary",
    "regional_revenue",
    "top_customers",
    "returned_item_customers",
    "asof_purchase_prior_view",
    "event_rollup_multigrain",
    "doc_stats",
    "doc_fingerprints",
    "doc_chunks",
    "packed_sequences",
    "clean_corpus",
    "latest_order_per_customer",
    "scd2_user_event_type",
    "salted_join_revenue",
    "stratified_event_sample",
    "redact_pii",
    "exact_dedup",
    "large_order_customers",
    "supplier_diversity",
    "rich_customers_without_low_orders",
    "incremental_event_rollup",
    "gap_filled_user_timeline",
    "events_json_flatten",
    "customer_priority_baskets",
    "approx_distinct_gate",
    "approx_quantile_gate",
    "bigram_novelty",
    "vocab_oov",
    "winnow_fingerprints",
    "funnel_conversion",
    "cohort_retention",
    "table_diff_reconcile",
    "value_percentiles_exact",
    "equipment_unpivot",
    "user_event_type_map",
    "curation_pipeline",
    "fuzzy_part_pairs",
    "major_suppliers",
    "order_price_window_stats",
    "lineitem_moment_stats",
    "zorder_span_stats",
    "quantized_ann_topk",
    "dedup_lines",
    "url_dedup",
    # r12 registrations (pure expression trees, no Python anywhere):
    # semantic_dedup and the PQ pair do bounded centroid/codebook
    # collects on build (like ivf) but plan as expressions; the bloom
    # gate's corpus probe must stay broadcast-join-only
    "semantic_dedup",
    "contamination_score",
    "decontaminate_bloom_gate",
    "pq_ann_topk",
    "pq_ann_rerank",
    # like the PQ pair: bounded centroid+codebook collects on build,
    # pure expression tree afterwards (r12 ADVICE: budgets existed but
    # the name was missing here, so they never ran)
    "ivf_pq_ann_topk",
    # r6 sweep widening: every remaining batch query that is cheap to
    # plan (excluded: streaming — executes on build; ivf/dedup_clusters/
    # dedup_survivors — iterative fit or CC jobs on build; media_* —
    # Arrow mapInPandas is their sanctioned shape; dbt/compaction —
    # materialize on build)
    "item_master_enrich",
    "events_lag",
    "customers_without_urgent_orders",
    "validation_report",
    "customer_segment_setops",
    "rolling_customer_spend",
    "events_json_percentiles",
    "shipping_priority",
    "late_shipment_priority",
    "priority_shipping_mix",
    "promo_revenue_share",
    "revenue_cube",
    "value_band_range_join",
    "lang_id",
    "tfidf_top_terms",
    "null_profile_orders",
    "decontaminate_vs_benchmark",
    "train_val_test_split",
    "corpus_mixture",
    "quality_deciles",
    "corpus_bigram_counts",
    "gopher_quality_flags",
    "ngram_jaccard_pairs",
    "embedding_neardup",
    # r13 registrations (pure expression trees; filtered IVF does the
    # bounded nlist-centroid collect on build like semantic_dedup)
    "temperature_mixture",
    "filtered_ann_topk",
    "cross_corpus_neardup",
    "filtered_ivf_ann_topk",
    "minhash_estimate_gate",
    "cm_heavy_hitters",
    # r14 registrations (pure expression trees)
    "bm25_topk_docs",
    "dedup_substrings",
    "containment_neardup",
    # late-r14 registrations (pure expression trees; the two
    # histogram-threshold operators pin their per-doc score frame so
    # the threshold branch and the final filter share one compute)
    "ccnet_surprisal_buckets",
    "dsir_select",
    "corpus_drift_tv",
    "hybrid_rrf_retrieval",
    "top_revenue_suppliers",
    "sole_failed_supplier",
    "bigram_surprisal_buckets",
    # the IVF-leg hybrid does the bounded nlist hash-centroid collect
    # on build, like filtered_ivf_ann_topk
    "hybrid_rrf_ivf",
    # r15 registrations (pure expression trees)
    "quality_classifier_score",
    "subword_segment",
    "kn_bigram_surprisal",
    "quality_gate_composite",
    "scrub_benchmark_spans",
    "lang_classifier_scores",
]


@pytest.fixture(scope="module")
def plans(spark):
    """(plan string, warm build-time job count) per audited query.

    Two passes: the first warms fixture reads (parquet footer sniffs
    launch one-off jobs); the second records the plan AND how many
    Spark jobs merely BUILDING the DataFrame launched — the r8 scale
    bugs included eager count() jobs on the build path, and this
    fixture is what catches a reintroduced one."""
    from dagster_etl_spark.registry import all_queries

    specs = all_queries()
    for name in AUDITED:  # warm pass
        specs[name].fn(spark, SF_SMALL)
    tracker = spark.sparkContext.statusTracker()

    def last_job() -> int:
        ids = tracker.getJobIdsForGroup(None)
        return max(ids) if ids else -1

    out = {}
    for name in AUDITED:
        before = last_job()
        df = specs[name].fn(spark, SF_SMALL)
        jobs = last_job() - before
        out[name] = (df._jdf.queryExecution().executedPlan().toString(), jobs)
    return out


def test_no_cartesian_products(plans):
    """The only sanctioned all-pairs plans are the bounded verifiers
    (embedding_neardup, capped ids) — none of the audited set."""
    for name, (plan, _) in plans.items():
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"


# r13 verdict task 3: `df.crossJoin(broadcast(...))` plans a
# BroadcastNestedLoopJoin, which test_no_cartesian_products never sees —
# an unbounded BNLJ (corpus x corpus) would sail through the cartesian
# audit. Every sanctioned BNLJ is listed here with its MAX planned count
# and the boundedness reason; any other occurrence fails the audit.
BNLJ_ALLOWED: dict[str, tuple[int, str]] = {
    # one-row scalar frames: crossJoin(broadcast(1-row aggregate)) --
    # the zero-build-job pattern that replaced eager driver count()s
    "rich_customers_without_low_orders": (
        1, "TPC-H Q22 threshold: broadcast 1-row mean-balance frame"),
    "major_suppliers": (
        1, "scalar threshold: broadcast 1-row aggregate frame"),
    "decontaminate_bloom_gate": (
        1, "broadcast 1-row corpus-count frame (BUILD_JOB_BUDGET 0 path)"),
    "tfidf_top_terms": (
        1, "idf needs N_docs: broadcast 1-row doc-count frame"),
    "temperature_mixture": (
        1, "mixture weights normalize by a broadcast 1-row total frame"),
    "semantic_dedup": (
        3, "per-cluster stats + 1-row totals, all broadcast dimension-"
           "sized frames (cluster count <= nlist)"),
    # bounded query batches: ANN entry points score a broadcast probe
    # batch against the corpus -- |queries| << |corpus| by contract
    # (documented in similarity.py docstrings)
    "ann_cosine_topk": (1, "broadcast bounded query batch vs corpus"),
    "quantized_ann_topk": (1, "broadcast bounded query batch vs corpus"),
    "pq_ann_topk": (1, "broadcast bounded query batch vs corpus"),
    "pq_ann_rerank": (1, "broadcast bounded query batch (rerank frame)"),
    # bounded verifier: capped-id all-pairs, sanctioned like its
    # CartesianProduct sibling would be
    "embedding_neardup": (
        1, "bounded exact-cosine verify over banded candidates"),
    "bm25_topk_docs": (
        1, "broadcast 1-row (n_docs, total_tokens) frame for idf/avgdl"),
    # histogram-threshold operators: a 1-row totals frame under the
    # pinned score subtree (prints once per consumer branch, executes
    # once) + the 1-row threshold frame itself
    "ccnet_surprisal_buckets": (
        3, "1-row (N, n_docs) frame x2 pinned prints + 1-row tercile-"
           "cutpoint frame"),
    "dsir_select": (
        3, "1-row (T, R) totals frame x2 pinned prints + 1-row "
           "k-th-weight threshold frame"),
    "corpus_drift_tv": (
        1, "broadcast 1-row corpus-total frame"),
    "containment_neardup": (
        2, "the audit_cap guard: a 1-row assert_true count frame under "
           "the pinned explode (prints once per self-join side, "
           "executes once) — the structural bound that makes the "
           "exhaustive pairwise form audit-only"),
    "hybrid_rrf_retrieval": (
        2, "inherits bm25's 1-row totals frame + cosine's broadcast "
           "bounded query batch"),
    "bigram_surprisal_buckets": (
        5, "one (V, n_docs) constants frame: its 1-row x 1-row build "
           "join + its fan-in, x2 pinned prints, + the 1-row tercile-"
           "cutpoint frame"),
    "kn_bigram_surprisal": (
        5, "one (Nbi, n_docs) constants frame: its 1-row x 1-row build "
           "join + its fan-in, x2 pinned prints, + the 1-row tercile-"
           "cutpoint frame (same shape as bigram_surprisal_buckets)"),
    "quality_gate_composite": (
        3, "inherits the ccnet branch's totals frame (x2 pinned "
           "prints) + its 1-row tercile-cutpoint frame; the classifier "
           "branch's model join is a broadcast HASH join, no nested "
           "loop"),
    "hybrid_rrf_ivf": (
        1, "inherits bm25's 1-row totals frame (the IVF leg's probe "
           "join is an equi-join on the bucket key, no nested loop)"),
}


def test_bnlj_only_on_allowlist(plans):
    """BroadcastNestedLoopJoin is sanctioned ONLY for broadcast 1-row
    scalar frames, bounded ANN query batches, and the capped verifier
    — each pinned in BNLJ_ALLOWED with a reason and a max count. A
    BNLJ anywhere else (or more of them than pinned) is an unbounded
    nested loop waiting for a corpus-sized side."""
    for name, (plan, _) in plans.items():
        n = plan.count("BroadcastNestedLoopJoin")
        cap, _reason = BNLJ_ALLOWED.get(name, (0, ""))
        assert n <= cap, (
            f"{name} plans {n} BroadcastNestedLoopJoin(s), allowlist cap "
            f"{cap} — justify boundedness in BNLJ_ALLOWED or remove the "
            "nested loop"
        )
    # stale entries hide future regressions: an allowlisted query that
    # no longer plans any BNLJ must be dropped from the list
    for name, (cap, _reason) in BNLJ_ALLOWED.items():
        if name in plans:
            n = plans[name][0].count("BroadcastNestedLoopJoin")
            assert n > 0, f"BNLJ_ALLOWED entry for {name} is stale"


# Queries sanctioned to plan an Arrow-batched MapInPandas node (guide
# §4.2: heavy per-row custom logic batch-native in Python), each with
# the measured reason. Row-wise Python (BatchEvalPython) stays banned
# everywhere; MapInPandas anywhere else is still a failure.
MAPINPANDAS_ALLOWED = {
    # r19: the tokenizer walks moved from interpreted SQL `aggregate`
    # folds to one Arrow batch entry per task — bpe_segment 5.6->0.55s,
    # subword_segment 1.5->0.41s Spark-only at sf0.1 (r18 verdict task
    # 1); results pinned identical to the retained expression twins
    # and the recursive-CTE oracles
    "subword_segment": 1,
}


def test_no_rowwise_python(plans):
    """BatchEvalPython = row-at-a-time Python UDF — banned everywhere.
    Arrow-batched Python (mapInPandas) is allowed only in multimodal
    decode (not in this audit set) and the MAPINPANDAS_ALLOWED
    tokenizer walks."""
    for name, (plan, _) in plans.items():
        assert "BatchEvalPython" not in plan, f"{name} runs row-wise Python"
        assert "ArrowEvalPython" not in plan, f"{name} runs Python in an expression"
        cap = MAPINPANDAS_ALLOWED.get(name, 0)
        n = plan.count("MapInPandas")
        assert n <= cap, f"{name} plans {n} MapInPandas node(s), cap {cap}"
    for name, cap in MAPINPANDAS_ALLOWED.items():
        if name in plans:
            assert plans[name][0].count("MapInPandas") > 0, (
                f"MAPINPANDAS_ALLOWED entry for {name} is stale"
            )


def test_filter_pushdown_reaches_scan(plans):
    """Native-column predicates must land in PushedFilters on the
    parquet scan, not as post-scan filters only."""
    plan = plans["returned_item_customers"][0]
    assert "PushedFilters" in plan
    assert "l_returnflag" in plan.split("PushedFilters", 1)[1][:500]


def test_small_dims_broadcast(plans):
    """Star joins must broadcast the dimension side (no shuffle of the
    fact table onto a tiny dim)."""
    for name in ("regional_revenue", "returned_item_customers", "priority_wip_join"):
        assert "BroadcastHashJoin" in plans[name][0], f"{name} lost its broadcast join"


# Shuffle-exchange budget per query — the INVARIANT form of the plan
# audit (strategy names vary with AQE and data size; the number of
# shuffles a query is allowed to pay does not). Values are the measured
# counts of the intended plans at r9; an increase means a new shuffle
# crept in and must be a conscious edit here, with a reason.
EXCHANGE_BUDGET = {
    "minhash_neardup": 5,
    "simhash_neardup": 3,
    "ann_cosine_topk": 2,
    "lsh_ann_topk": 2,
    "wip_aggregate": 1,
    # r9 split shape: 1 for the join-free main aggregate + 1 for the
    # urgent-count aggregate; the graft join is exchange-free (both
    # sides already hash-partitioned by the group keys)
    "priority_wip": 2,
    "priority_wip_join": 2,
    "cycle_time_stats": 1,
    "equipment_pivot": 2,
    "order_rank_window": 1,
    "sessionize": 1,
    "pricing_summary": 2,
    "regional_revenue": 1,
    "top_customers": 1,
    "returned_item_customers": 1,
    "asof_purchase_prior_view": 1,
    "event_rollup_multigrain": 1,
    "doc_stats": 1,
    "doc_fingerprints": 1,
    "doc_chunks": 1,
    "packed_sequences": 2,
    "clean_corpus": 3,
    "latest_order_per_customer": 1,
    "scd2_user_event_type": 1,
    "salted_join_revenue": 1,
    "stratified_event_sample": 0,
    "redact_pii": 1,
    "exact_dedup": 1,
    "large_order_customers": 1,
    "supplier_diversity": 2,
    "rich_customers_without_low_orders": 2,
    "incremental_event_rollup": 2,
    "gap_filled_user_timeline": 2,
    "events_json_flatten": 0,
    "customer_priority_baskets": 1,
    "approx_distinct_gate": 2,
    "approx_quantile_gate": 1,
    "bigram_novelty": 4,
    "vocab_oov": 4,
    "winnow_fingerprints": 1,
    "funnel_conversion": 8,
    "cohort_retention": 3,
    "table_diff_reconcile": 2,
    "value_percentiles_exact": 1,
    "equipment_unpivot": 2,
    "user_event_type_map": 2,
    "curation_pipeline": 2,
    "fuzzy_part_pairs": 0,
    "major_suppliers": 3,
    "order_price_window_stats": 1,
    "lineitem_moment_stats": 1,
    "zorder_span_stats": 2,
    "quantized_ann_topk": 2,
    "dedup_lines": 3,
    "url_dedup": 1,
    "item_master_enrich": 0,
    "events_lag": 1,
    "customers_without_urgent_orders": 0,
    "validation_report": 0,
    "customer_segment_setops": 4,
    "rolling_customer_spend": 1,
    "events_json_percentiles": 1,
    "shipping_priority": 1,
    "late_shipment_priority": 1,
    "priority_shipping_mix": 1,
    "promo_revenue_share": 1,
    "revenue_cube": 1,
    "value_band_range_join": 1,
    "lang_id": 1,
    "tfidf_top_terms": 8,
    "null_profile_orders": 1,
    "decontaminate_vs_benchmark": 3,
    "train_val_test_split": 0,
    "corpus_mixture": 0,
    "quality_deciles": 2,
    "corpus_bigram_counts": 2,
    "gopher_quality_flags": 1,
    "ngram_jaccard_pairs": 3,
    "embedding_neardup": 0,
    # r12: semantic_dedup = assignment window (1) + within-bucket pair
    # join (2 sides) + dropped-distinct (2 partial/final) + kept join
    # side shuffles; budget is the measured count at SF_SMALL.
    "semantic_dedup": 7,
    # corpus-gram distinct (2) + per-doc aggregate (1) + all-docs left
    # join side (1); the benchmark side broadcasts
    "contamination_score": 4,
    # the gate runs BOTH paths (bloom build aggregate, exact distinct,
    # two id-distincts, full-outer join, final single-row agg) PLUS the
    # in-plan corpus countDistinct that replaced the r12 build-time
    # count() job (2 exchanges); the bloom PROBE itself contributes
    # zero corpus exchanges
    # (test_bloom_probe_plan_has_no_corpus_shuffle pins that)
    "decontaminate_bloom_gate": 12,
    # broadcast query side: only the top-k window shuffles (+AQE read)
    "pq_ann_topk": 2,
    "pq_ann_rerank": 2,
    # list-restricted ADC + candidate window + rerank window; both
    # join build sides broadcast
    "ivf_pq_ann_topk": 2,
    # r13: source aggregate (1) + one-row total (Single) + AQE read;
    # the mixture output is dimension-sized
    "temperature_mixture": 3,
    # broadcast group join contributes zero; only the per-query top-k
    # window shuffles (+AQE read)
    "filtered_ann_topk": 2,
    # two banded sides (pinned melts) + candidate dedup + two verify
    # joins — same shape as minhash_neardup's 5
    "cross_corpus_neardup": 5,
    # broadcast probe join on (bucket, label): only the top-k window
    # shuffles (+AQE read)
    "filtered_ivf_ann_topk": 2,
    # minhash_neardup's candidate machinery (5) + the two signature
    # re-attach joins for the estimator + final one-row agg
    "minhash_estimate_gate": 8,
    # the pinned vocab aggregate's exchange PRINTS in both consumer
    # branches (sketch melt + estimate joins) but executes once
    # (plans/cache.pin); + cells aggregate + top-k Single (+AQE
    # reads); the three cell joins broadcast; +1 (r14): the hash(b0)
    # exchange for the per-bucket local pre-trim that caps the
    # single-partition top-k window at width*k rows (r13 ADVICE)
    "cm_heavy_hitters": 8,
    # r14: pinned explode feeds tf/df/query branches; tf aggregate,
    # df aggregate + term join re-shuffle, (query, doc) score
    # aggregate, per-query top-k window, one-row totals Single.
    # +2 (late r14): the df and query-term joins are SHUFFLE_HASH-
    # pinned (each adds a term re-shuffle of its own small side) —
    # the vocabulary-sized df frame sat exactly at the AQE broadcast
    # threshold at fixture x10 and the plan flip-flopped run-to-run
    # between broadcast (fast) and sort-merge (4-5x slower); at
    # 100 TB neither side is broadcastable, so the pinned shuffle is
    # the at-scale shape, not a concession
    "bm25_topk_docs": 9,
    # r14: shingle-frequency aggregate + semi-join on h, per-doc
    # island window + island aggregate + spans-array aggregate (the
    # pinned explode prints once per consumer but executes once)
    "dedup_substrings": 5,
    # r14: same shape as ngram_jaccard_pairs — pinned shingle explode
    # feeds both self-join sides, one pair aggregate. +2 (r15): the
    # audit_cap guard's 1-row count frame adds an Exchange
    # SinglePartition under the pin, printed once per self-join side
    # (executes once) — the deliberate cost of making the audit-only
    # framing structural
    "containment_neardup": 5,
    # late r14 (printed counts; pinned score frames reprint their
    # upstream exchanges once per consumer branch but execute once):
    # tf agg + term-count agg + doc agg + totals Single (x2 prints) +
    # score-histogram agg + cutpoint Single
    "ccnet_surprisal_buckets": 10,
    # candidate tf agg + target/raw bucket-count aggs + doc agg +
    # totals Single (x2 prints) + weight-histogram agg + threshold
    # Single
    "dsir_select": 12,
    # (slice, term) agg feeds three derived aggregates (term totals,
    # slice totals, corpus total — pinned, prints per consumer) + the
    # per-slice reduce
    "corpus_drift_tv": 8,
    # bm25 leg (9, incl. its SHUFFLE_HASH pins) + cosine leg's top-k
    # window + the fused per-query top-k window (the fuse join itself
    # is broadcast, no exchange)
    "hybrid_rrf_retrieval": 14,
    # bm25 leg (9, incl. its SHUFFLE_HASH pins) + IVF leg's
    # probe/top-k windows + the fused per-query top-k window
    "hybrid_rrf_ivf": 13,
    # bigram LM: tf/c12/c1 aggregates off the pinned explode + two
    # Singles for the constants frame + doc agg (x2 pinned prints) +
    # histogram agg + cutpoint Single
    "bigram_surprisal_buckets": 16,
    # late r14 analytics (Q15/Q21 shapes): revenue agg + 1-row max
    # Single + AQE read; both dim joins broadcast
    "top_revenue_suppliers": 3,
    # (order, supplier) dedup agg + per-order stats agg + the stats
    # join re-shuffle + supplier rollup; supplier dim broadcast
    "sole_failed_supplier": 4,
    # r15 fastText-shape classifier: ONE per-doc sum aggregate — the
    # model table is a broadcast hash join (4096 rows), no window, no
    # corpus sort
    "quality_classifier_score": 1,
    # r15 greedy subword walk: pure per-row expression tree — ZERO
    # shuffles is the operator's scale claim, pinned here
    "subword_segment": 0,
    # r15 Kneser-Ney bigram LM (printed counts; the pinned per-doc
    # score frame reprints its upstream once per consumer branch but
    # executes once): tf + c12 aggregates + the two countDistinct
    # aggregates (prefix continuations, suffix contexts — 2 exchanges
    # each via Expand) + (Nbi, n_docs) constants Singles + doc agg,
    # all x2 pinned prints, + histogram agg + cutpoint Single
    "kn_bigram_surprisal": 22,
    # r15 composite gate (printed counts): the classifier branch's
    # per-doc agg + its join re-shuffle, the ccnet branch's pinned
    # upstream (tf + term-count + doc aggs + totals Single, x2 prints)
    # + histogram agg + cutpoint Single + its join re-shuffle; the
    # gopher branch is scan-local
    "quality_gate_composite": 14,
    # r15 span decontamination (dedup_substrings family): benchmark
    # hash-set distinct + train semi-join input, per-doc island window
    # + island agg + spans-array agg (the pinned explode prints once
    # per consumer but executes once) — measured 4
    "scrub_benchmark_spans": 4,
    # r15 multiclass langid: same shape as quality_classifier_score —
    # ONE per-doc sum aggregate (5 measures), broadcast model join
    "lang_classifier_scores": 1,
}

# Queries whose BUILD legitimately launches bounded Spark jobs, with the
# measured job count: priority_wip_join's wip auto-probe (LIMIT-pushed
# distinct over 10k rows), curation_pipeline's localCheckpoint of the
# dedup edge set, validation_report's one-row rule aggregate. Everything
# else must launch ZERO jobs at build time — an eager count()/collect()
# on a build path is exactly the shape of the r8 scale bugs.
BUILD_JOB_BUDGET = {
    "priority_wip_join": 3,
    "curation_pipeline": 2,
    "validation_report": 3,
    # bounded build-time actions, documented per operator: the
    # hash-quantizer centroid collect (semantic_dedup), the one-pass
    # m*ksub codebook collect (pq_*; orderBy+window = multi-job under
    # AQE). The bloom gate's n_corpus count moved INTO the plan in r13
    # (cross-joined one-row aggregate) — zero build jobs now
    "semantic_dedup": 2,
    "contamination_score": 1,
    "pq_ann_topk": 4,
    "pq_ann_rerank": 4,
    # centroid collect + one-pass codebook collect (multi-job under AQE)
    # +1 in r16: the probe-pushdown's bounded probed-bucket collect
    # (<= min(nlist, n_queries * nprobe) rows) — it keeps the ADC
    # reconstruction off never-probed lists
    "ivf_pq_ann_topk": 7,
    # the bounded nlist hash-centroid collect
    "filtered_ivf_ann_topk": 1,
    "hybrid_rrf_ivf": 1,
}


def test_shuffle_exchange_budget(plans):
    import re

    for name, (plan, _) in plans.items():
        n = len(re.findall(r"\bExchange (?:hash|range|Single|RoundRobin)", plan))
        budget = EXCHANGE_BUDGET[name]
        assert n <= budget, (
            f"{name} plans {n} shuffle exchanges, budget {budget} — a new "
            "shuffle crept in; either remove it or consciously raise the "
            "budget with a reason"
        )


def test_no_eager_jobs_on_build(plans):
    for name, (_, jobs) in plans.items():
        budget = BUILD_JOB_BUDGET.get(name, 0)
        assert jobs <= budget, (
            f"building {name} launched {jobs} Spark jobs (budget {budget}) — "
            "an eager count()/collect() is on the build path"
        )


def test_whole_stage_codegen_present(spark):
    """The expression-heavy per-row operators must stay inside
    whole-stage codegen (a silent janino fallback would interpret the
    md5/token chains row by row). AQE hides codegen stages in the
    pre-execution plan string, so this reads explain mode 'codegen'."""
    from dagster_etl_spark.registry import all_queries

    specs = all_queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("codegen")
    # AQE reports 0 subtrees on a not-yet-executed adaptive plan; turn
    # it off just for the explain (session conf is runtime-mutable)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for name in ("doc_stats", "doc_fingerprints", "wip_aggregate"):
            df = specs[name].fn(spark, SF_SMALL)
            txt = df._jdf.queryExecution().explainString(mode)
            n = int(txt.split("Found ", 1)[1].split(" ", 1)[0])
            assert n >= 1, f"{name} fell out of codegen:\n{txt[:300]}"
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_registry_fronts_driver_window_priority():
    """The correctness driver checks the first 50 registry entries;
    the priority list must actually front-load them and every priority
    name must exist (a typo here would silently waste a window slot)."""
    from dagster_etl_spark import registry

    names = list(registry.all_queries())
    pri = [n for n in registry._DRIVER_WINDOW_PRIORITY]
    assert names[: len(pri)] == pri
    # names past slot 50 are a DELIBERATE deferral (they ride on the
    # builder's full ALLCHECK sweep and front the next round) — allow
    # at most one so a bloated list can't silently starve the window
    assert len(pri) <= 51


@pytest.mark.rotation_tripwire
def test_next_rotation_heads_derive_from_artifacts():
    """r11 verdict task 6: the next round's rotation heads must be
    COMPUTED from the artifacts, not hand-maintained. A registered
    query has a driver-green row coming from either the newest
    CORRECTNESS_r*.json (last round) or the current 50-slot window
    (this round); anything in neither will be the stalest name in the
    fleet next round and must be pre-declared in
    registry._NEXT_ROTATION_HEADS. Set equality both ways: a missing
    name means a mid-round registration was not pre-declared (the r10
    and r11 process gap); an extra name means the tuple is stale.

    r12 ADVICE: at round boundary the round driver writes
    CORRECTNESS_rN.json for exactly the current window, which made
    this test a SECOND deliberate red alongside
    test_driver_window_rotates_vs_last_round. Only one tripwire needs
    to force the rotation — when the newest artifact equals the
    not-yet-rotated window, skip here and let the rotation test carry
    the red."""
    import json
    import re
    from pathlib import Path

    from dagster_etl_spark import registry

    root = Path(__file__).resolve().parents[1]
    arts = sorted(
        root.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    if not arts:
        pytest.skip("no correctness artifacts yet")
    newest = set(json.loads(arts[-1].read_text()))
    registered = list(registry.all_queries())
    window = set(registered[:50])
    if newest == window:
        pytest.skip(
            "round boundary: newest CORRECTNESS artifact is this window; "
            "test_driver_window_rotates_vs_last_round forces the rotation"
        )
    expected = [n for n in registered if n not in newest and n not in window]
    declared = list(registry._NEXT_ROTATION_HEADS)
    assert sorted(declared) == sorted(expected), (
        "registry._NEXT_ROTATION_HEADS out of sync with artifacts: "
        f"missing={sorted(set(expected) - set(declared))} "
        f"stale={sorted(set(declared) - set(expected))}"
    )


def test_registry_keeps_rotation_headroom():
    """Perfect window disjointness round-over-round requires at least
    50 queries OUTSIDE the 50-slot window (len(registry) - 50 >= 50).
    If a round deletes queries below that line, the rotation test
    above becomes unsatisfiable and rotation silently degrades to
    partial — fail loudly here instead."""
    from dagster_etl_spark import registry

    n = len(registry.all_queries())
    assert n - 50 >= 50, (
        f"registry has {n} queries; need >= 100 for disjoint rotation"
    )


def test_allcheck_artifacts_cover_full_registry():
    """r10 process gap: three queries were registered AFTER the
    102-query ALLCHECK sweep, so they had no standing sweep row and
    only a judge spot-check covered them. Guard: every ALLCHECK
    artifact from the CURRENT round (the newest round number present)
    must have total == len(registry) — a stale-total artifact means
    the sweep must be re-run after registering new queries."""
    import json
    import re
    from pathlib import Path

    from dagster_etl_spark import registry

    root = Path(__file__).resolve().parents[1]
    arts = list(root.glob("ALLCHECK_r*.json"))
    if not arts:
        pytest.skip("no ALLCHECK artifacts yet")
    rnd = lambda p: int(re.search(r"_r(\d+)", p.name).group(1))  # noqa: E731
    newest = max(rnd(p) for p in arts)
    n = len(registry.all_queries())
    for p in arts:
        if rnd(p) != newest:
            continue  # historical artifacts legitimately have old totals
        total = json.loads(p.read_text())["total"]
        assert total == n, (
            f"{p.name} swept {total} queries but registry has {n}: "
            "re-run the ALLCHECK sweep after registering new queries"
        )


@pytest.mark.rotation_tripwire
def test_driver_window_rotates_vs_last_round():
    """Rotation invariant (round-agnostic): the 50 names the driver
    will check next must be disjoint from the most recent
    CORRECTNESS_r*.json window — re-checking last round's set while
    older queries age to 2+ rounds stale is exactly the r8 freshness
    bug. Perfect disjointness is achievable iff
    len(registry) - 50 >= 50; test_registry_keeps_rotation_headroom
    pins that invariant so it stays provable as the registry grows
    (115 registered queries at the r12 rotation; derive, don't trust:
    test_registry_keeps_rotation_headroom pins the live count).

    DELIBERATE lifecycle (r9 ADVICE adjudication): the newest artifact
    is written by the round driver AT ROUND END, so the moment
    CORRECTNESS_rN.json lands this test goes red and stays red until
    the rN+1 rotation — that failure IS the tripwire that forces the
    rotation to be the first commit of the next round. We keep the
    strict compare-against-newest form on purpose: comparing against
    arts[-2] whenever the head artifact equals the current window
    would also pass for a never-rotated window at round N+1 (its set
    equals artifact rN exactly), silently disarming the tripwire."""
    import json
    import re
    from pathlib import Path

    from dagster_etl_spark import registry

    root = Path(__file__).resolve().parents[1]
    arts = sorted(
        root.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    if not arts:
        pytest.skip("no correctness artifacts yet")
    last_window = set(json.loads(arts[-1].read_text()))
    next_window = set(list(registry.all_queries())[:50])
    overlap = next_window & last_window
    assert not overlap, f"window repeats last round's queries: {sorted(overlap)}"


def test_no_query_stale_beyond_three_rounds():
    """r12 verdict task 7: staleness invariant. With 123 registered
    queries and a 50-slot window the coverage cycle is ~3 rounds; as
    the registry grows, a query could silently stop getting driver
    rows. Pin the bound: every registered query must either be in the
    CURRENT window (gets a row this round) or have a driver row in one
    of the three newest CORRECTNESS artifacts (a row within the last
    three rounds). A name in neither has gone >3 rounds without a
    fresh oracle check — rotate it in or shrink the registry."""
    import json
    import re
    from pathlib import Path

    from dagster_etl_spark import registry

    root = Path(__file__).resolve().parents[1]
    arts = sorted(
        root.glob("CORRECTNESS_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    if len(arts) < 3:
        pytest.skip("need >= 3 correctness artifacts to measure staleness")
    recent: set[str] = set()
    all_seen: set[str] = set()
    for p in arts:
        names = set(json.loads(p.read_text()))
        all_seen |= names
        if p in arts[-3:]:
            recent |= names
    registered = list(registry.all_queries())
    window = set(registered[:50])
    # names never seen in ANY artifact are mid-round registrations —
    # the heads-derivation test forces them to front the NEXT window,
    # so their first row lands within the bound by construction. A
    # name seen before but in neither the window nor the last three
    # artifacts has genuinely aged out — exactly the failure this
    # test exists to catch (heads membership does NOT excuse it: an
    # overflowing head set is the mechanism by which it would happen).
    stale = [
        n
        for n in registered
        if n not in window and n not in recent and n in all_seen
    ]
    assert not stale, (
        f"{len(stale)} queries have no driver row in 3 rounds and are not "
        f"in the current window: {sorted(stale)}"
    )


def test_session_conf_contract(spark):
    """The engine session's conf decisions are measurements, not taste
    (BASELINE.md r8/r9): parallelismFirst=false cost 6x at 10x data,
    a 64MB broadcast threshold cost 2.7x at 50x, and 32 shuffle
    partitions beat Spark's 200 by 1.6-1.9x session-interleaved on
    this box. Pin them so a drive-by 'tuning' commit reruns the
    experiments instead of silently regressing them."""
    conf = spark.conf
    assert conf.get("spark.sql.adaptive.enabled") == "true"
    assert (
        conf.get("spark.sql.adaptive.coalescePartitions.parallelismFirst")
        == "true"
    )
    # Spark's default 10MB — the r9 audit showed anything a fact can
    # grow into must build its hash table in parallel, not broadcast
    assert int(conf.get("spark.sql.autoBroadcastJoinThreshold").rstrip("b")) == (
        10 * 1024 * 1024
    )
    assert conf.get("spark.sql.session.timeZone") == "UTC"


def test_entry_point_conf_contract(spark):
    """Same contract for the OTHER session path: the driver provides
    its own SparkSession and __spark_entry__._configure mutates it.
    Pin the r8/r9-measured decisions there too — 32 shuffle partitions
    with the 200 initialPartitionNum AQE ceiling (so a larger run
    through the entry point isn't capped at 32), UTC, and the parquet
    timestamp handling the fixtures depend on."""
    import importlib.util
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    spec = importlib.util.spec_from_file_location(
        "spark_entry_for_conf_test", root / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    before = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.shuffle.partitions",
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        )
    }
    try:
        mod._configure(spark)
        conf = spark.conf
        assert conf.get("spark.sql.shuffle.partitions") == "32"
        # AQE coalesce only merges DOWNWARD from initialPartitionNum;
        # without the 200 ceiling, 32 alone caps shuffle parallelism
        # for any larger run through the entry point (r8 ADVICE item)
        assert (
            conf.get("spark.sql.adaptive.coalescePartitions.initialPartitionNum")
            == "200"
        )
        assert conf.get("spark.sql.session.timeZone") == "UTC"
        assert conf.get("spark.sql.parquet.inferTimestampNTZ.enabled") == "false"
    finally:
        for k, v in before.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
