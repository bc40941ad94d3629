"""Central query registry backing ``__spark_entry__.py``.

Every implemented operator from SURVEY.md §2 (plus the beyond-parity
scale operators) registers a named query here: a Spark program over the
driver fixture tables and, where SQL-expressible, a DuckDB oracle that
must produce the identical result (row count + schema + order-insensitive
value hash at sf0.01).

Determinism contract (why oracles match bit-for-bit):
* money/measure sums go through DECIMAL (exact, order-independent) and
  are cast to double only at the end;
* averages are exact-sum / count, divided in double the same way on
  both sides;
* every computed column is aliased identically in Spark and SQL;
* no floating ``round`` on values that could straddle a rounding
  boundary between engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, doc or (fn.__doc__ or ""), tags)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    _ensure_loaded()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {n: s.fn for n, s in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {n: s.oracle for n, s in all_queries().items() if s.oracle is not None}


_LOADED = False

# The correctness driver checks the FIRST 50 registry entries in
# iteration order. Names listed here are moved to the front (in list
# order) after module load; everything else keeps registration order
# behind them. Rotated per round so every registered query accumulates
# a driver-green row across rounds: round 4 fronts packed_sequences
# (oracle HUGEINT cast fixed this round — needs its first green driver
# row) plus the 37 queries whose last driver row is round 2, especially
# the round-3-rewritten ones (pricing_summary, cycle_time_stats,
# sessionize, priority_wip_join). Round-4 additions append below and
# must stay within the 50-slot window.
_DRIVER_WINDOW_PRIORITY: tuple[str, ...] = (
    # round 15: generated FROM the artifacts, not memory. Fronts the 47
    # pre-declared r15 heads from _NEXT_ROTATION_HEADS as checked at the
    # r14 boundary (the 30 r12 names that aged out of the r14 window +
    # the 17 mid/late-r14 registrations with ALLCHECK_r14-green rows at
    # all 3 SFs but no driver row), then the first 3 CORRECTNESS_r13.json
    # names (in artifact order) not already covered -- the next-stalest
    # driver rows in the fleet. The remaining 47 r13 names age to r16:
    # see _NEXT_ROTATION_HEADS below, which
    # tests/test_plans.py::test_next_rotation_heads_derive_from_artifacts
    # derives from the artifacts instead of trusting a comment.
    # Disjointness vs CORRECTNESS_r14.json (the newest artifact) is
    # enforced by tests/test_plans.py::test_driver_window_rotates_vs_last_round.
    # Invariant that keeps perfect disjointness provable as the registry
    # grows: len(registry) - 50 >= 50 (pinned by
    # tests/test_plans.py::test_registry_keeps_rotation_headroom).
    "lsh_ann_topk",
    "ivf_ann_topk",
    "ivf_ann_recall",
    "media_metadata",
    "media_frame_sample",
    "media_features",
    "wip_aggregate",
    "priority_wip_join",
    "cycle_time_stats",
    "equipment_pivot",
    "item_master_enrich",
    "order_rank_window",
    "events_lag",
    "sessionize",
    "customers_without_urgent_orders",
    "validation_report",
    "pricing_summary",
    "regional_revenue",
    "customer_segment_setops",
    "rolling_customer_spend",
    "events_json_percentiles",
    "shipping_priority",
    "returned_item_customers",
    "late_shipment_priority",
    "priority_shipping_mix",
    "promo_revenue_share",
    "revenue_cube",
    "approx_distinct_gate",
    "approx_quantile_gate",
    "url_dedup",
    "bm25_topk_docs",
    "dedup_substrings",
    "containment_neardup",
    "bm25_incremental",
    "streaming_bm25_ingest",
    "ccnet_surprisal_buckets",
    "dsir_select",
    "corpus_drift_tv",
    "hybrid_rrf_retrieval",
    "surprisal_incremental",
    "corpus_drift_incremental",
    "streaming_drift_monitor",
    "top_revenue_suppliers",
    "sole_failed_supplier",
    "bigram_surprisal_buckets",
    "hybrid_rrf_ivf",
    "dsir_incremental",
    "latest_order_per_customer",
    "scd2_user_event_type",
    "salted_join_revenue",
)

# Pre-declared rotation heads for the NEXT round (r14), in
# CORRECTNESS_r11.json artifact order: the 23 r11 names that did not
# fit the 50-slot r13 window above, so once CORRECTNESS_r13 lands their
# most recent driver row (r11) will be the oldest in the fleet. This
# tuple is CHECKED, not advisory:
# tests/test_plans.py::test_next_rotation_heads_derive_from_artifacts
# recomputes it as registry - (newest CORRECTNESS file UNION the
# current 50-slot window) -- any query registered mid-round without
# being appended here fails the suite, turning the manual
# pre-declaration discipline into an invariant. Mid-round registrations
# must be APPENDED here (and swept via ALLCHECK) so they front the next
# rotation too.
_NEXT_ROTATION_HEADS: tuple[str, ...] = (
    # r16 heads, in CORRECTNESS_r13.json artifact order: the 47 r13
    # names that did not fit the 50-slot r15 window above, so once
    # CORRECTNESS_r15 lands their most recent driver row (r13) will be
    # the oldest in the fleet. Mid-r15 registrations must be APPENDED
    # here (and swept via ALLCHECK) so they front the next rotation too.
    "large_order_customers",
    "supplier_diversity",
    "rich_customers_without_low_orders",
    "events_json_flatten",
    "customer_priority_baskets",
    "streaming_windowed_counts",
    "streaming_user_sessions",
    "streaming_dedup_counts",
    "streaming_segment_stats",
    "streaming_attribution_join",
    "asof_purchase_prior_view",
    "packed_sequences",
    "semantic_dedup",
    "contamination_score",
    "decontaminate_bloom_gate",
    "pq_ann_topk",
    "pq_ann_rerank",
    "ivf_pq_ann_topk",
    "ivf_pq_ann_incremental",
    "streaming_decontaminate",
    "dbt_incremental_orders",
    "cycle_time_stats_bucketed",
    "duplicate_ngram_spans",
    "image_dhash_groups",
    "epoch_shuffle_order",
    "top_customers",
    "curation_pipeline_v2",
    "priority_wip",
    "minhash_neardup",
    "exact_dedup",
    "clean_corpus",
    "doc_stats",
    "curation_pipeline",
    "compacted_scan",
    "ngram_jaccard_pairs",
    "simhash_neardup",
    "ann_cosine_topk",
    "embedding_neardup",
    "quantized_ann_topk",
    "media_decode_stats",
    "audio_feature_stats",
    "media_resize_stats",
    "equipment_unpivot",
    "funnel_conversion",
    "cohort_retention",
    "table_diff_reconcile",
    "value_percentiles_exact",
    # mid-r15 registrations (ALLCHECK_r15-swept; no driver row yet)
    "quality_classifier_score",
    "subword_segment",
    "token_budget_mixture_subword",
    "kn_bigram_surprisal",
    "quality_gate_composite",
    "packed_sequences_subword",
    "streaming_quality_score",
    "scrub_benchmark_spans",
    "lang_classifier_scores",
)


def _ensure_loaded() -> None:
    """Import all query-defining modules exactly once."""
    global _LOADED
    if _LOADED:
        return
    from dagster_etl_spark import queries_layout  # noqa: F401
    from dagster_etl_spark import queries_llm  # noqa: F401
    from dagster_etl_spark import queries_multimodal  # noqa: F401
    from dagster_etl_spark import queries_parity  # noqa: F401
    from dagster_etl_spark import queries_scale  # noqa: F401
    from dagster_etl_spark import queries_streaming  # noqa: F401
    from dagster_etl_spark import queries_temporal  # noqa: F401
    from dagster_etl_spark import queries_text  # noqa: F401

    fronted = [n for n in _DRIVER_WINDOW_PRIORITY if n in _REGISTRY]
    rest = [n for n in _REGISTRY if n not in set(fronted)]
    reordered = {n: _REGISTRY[n] for n in (*fronted, *rest)}
    _REGISTRY.clear()
    _REGISTRY.update(reordered)
    _LOADED = True
