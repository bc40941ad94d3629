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
    # round 18: generated FROM the artifacts, not memory. Fronts the
    # first 50 of the 60 pre-declared r18 heads from _NEXT_ROTATION_HEADS
    # as checked at the r17 boundary (the 8 r17 overflow names, then the
    # registered names with no row in CORRECTNESS_r16.json and outside
    # the r17 window, in artifact order). Includes all six queries the
    # r17 staleness tripwire named (zorder_span_stats,
    # wip_aggregate_approx, priority_wip_approx, dedup_lines,
    # dedup_survivors, self_repetition_removal). The 10 overflow names
    # front the r19 rotation: see _NEXT_ROTATION_HEADS below, which
    # tests/test_plans.py::test_next_rotation_heads_derive_from_artifacts
    # derives from the artifacts instead of trusting a comment.
    # Disjointness vs CORRECTNESS_r17.json (the newest artifact) is
    # enforced by tests/test_plans.py::test_driver_window_rotates_vs_last_round.
    # Invariant that keeps perfect disjointness provable as the registry
    # grows: len(registry) - 50 >= 50 (pinned by
    # tests/test_plans.py::test_registry_keeps_rotation_headroom).
    "zorder_span_stats",
    "lsh_ann_topk",
    "ivf_ann_topk",
    "ivf_ann_recall",
    "containment_neardup",
    "hybrid_rrf_retrieval",
    "hybrid_rrf_ivf",
    "media_metadata",
    "media_frame_sample",
    "media_features",
    "wip_aggregate",
    "wip_aggregate_approx",
    "priority_wip_approx",
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
    "latest_order_per_customer",
    "scd2_user_event_type",
    "salted_join_revenue",
    "top_revenue_suppliers",
    "sole_failed_supplier",
    "streaming_bm25_ingest",
    "streaming_drift_monitor",
    "dedup_lines",
    "dedup_survivors",
    "url_dedup",
    "self_repetition_removal",
    "bm25_topk_docs",
    "dedup_substrings",
    "bm25_incremental",
    "ccnet_surprisal_buckets",
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
    # r19 heads: the 10 r18 overflow names that did not fit the 50-slot
    # r18 window above (including the two mid-r17 registrations
    # ivf_pq_ann_rebucket / streaming_dsir_ingest, still awaiting their
    # first driver row), then the remaining registered names with no row
    # in CORRECTNESS_r17.json and not in the current window, in registry
    # order. Mid-r18 registrations must be APPENDED here (and swept via
    # ALLCHECK) so they front the next rotation too.
    "dsir_select",
    "corpus_drift_tv",
    "surprisal_incremental",
    "corpus_drift_incremental",
    "bigram_surprisal_buckets",
    "dsir_incremental",
    "bpe_segment",
    "token_budget_mixture_bpe",
    "ivf_pq_ann_rebucket",
    "streaming_dsir_ingest",
    "dbt_incremental_orders",
    "compacted_scan",
    "ngram_jaccard_pairs",
    "minhash_neardup",
    "simhash_neardup",
    "ann_cosine_topk",
    "embedding_neardup",
    "semantic_dedup",
    "pq_ann_rerank",
    "pq_ann_topk",
    "ivf_pq_ann_incremental",
    "ivf_pq_ann_topk",
    "quantized_ann_topk",
    "media_decode_stats",
    "audio_feature_stats",
    "media_resize_stats",
    "image_dhash_groups",
    "priority_wip",
    "cycle_time_stats_bucketed",
    "equipment_unpivot",
    "top_customers",
    "large_order_customers",
    "supplier_diversity",
    "rich_customers_without_low_orders",
    "events_json_flatten",
    "customer_priority_baskets",
    "funnel_conversion",
    "cohort_retention",
    "table_diff_reconcile",
    "value_percentiles_exact",
    "streaming_windowed_counts",
    "streaming_user_sessions",
    "streaming_dedup_counts",
    "streaming_segment_stats",
    "streaming_attribution_join",
    "streaming_decontaminate",
    "asof_purchase_prior_view",
    "doc_stats",
    "exact_dedup",
    "clean_corpus",
    "contamination_score",
    "decontaminate_bloom_gate",
    "epoch_shuffle_order",
    "packed_sequences",
    "curation_pipeline",
    "duplicate_ngram_spans",
    "curation_pipeline_v2",
    "quality_classifier_score",
    "subword_segment",
    "token_budget_mixture_subword",
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
