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
]


@pytest.fixture(scope="module")
def plans(spark):
    from dagster_etl_spark.registry import all_queries

    specs = all_queries()
    out = {}
    for name in AUDITED:
        df = specs[name].fn(spark, SF_SMALL)
        out[name] = df._jdf.queryExecution().executedPlan().toString()
    return out


def test_no_cartesian_products(plans):
    """The only sanctioned all-pairs plans are the bounded verifiers
    (embedding_neardup, capped ids) — none of the audited set."""
    for name, plan in plans.items():
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"


def test_no_rowwise_python(plans):
    """BatchEvalPython = row-at-a-time Python UDF — banned everywhere.
    Arrow-batched Python (mapInPandas) is allowed only in multimodal
    decode, which is not in this audit set."""
    for name, plan in plans.items():
        assert "BatchEvalPython" not in plan, f"{name} runs row-wise Python"
        assert "ArrowEvalPython" not in plan, f"{name} runs Python in an expression"
        assert "MapInPandas" not in plan, f"{name} unexpectedly uses mapInPandas"


def test_filter_pushdown_reaches_scan(plans):
    """Native-column predicates must land in PushedFilters on the
    parquet scan, not as post-scan filters only."""
    plan = plans["returned_item_customers"]
    assert "PushedFilters" in plan
    assert "l_returnflag" in plan.split("PushedFilters", 1)[1][:500]


def test_small_dims_broadcast(plans):
    """Star joins must broadcast the dimension side (no shuffle of the
    fact table onto a tiny dim)."""
    for name in ("regional_revenue", "returned_item_customers", "priority_wip_join"):
        assert "BroadcastHashJoin" in plans[name], f"{name} lost its broadcast join"


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


def test_driver_window_rotates_vs_last_round():
    """Rotation invariant (round-agnostic): the 50 names the driver
    will check next must be disjoint from the most recent
    CORRECTNESS_r*.json window — re-checking last round's set while
    older queries age to 2+ rounds stale is exactly the r8 freshness
    bug. With 101 registered queries and a 50-slot window, perfect
    disjointness is always achievable."""
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
