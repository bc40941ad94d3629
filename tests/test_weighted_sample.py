"""weighted_sample_topk: the integer-ticket min-hash weighted sampler.

Three contracts: (1) the scheme IS weighted sampling — heavy rows win
proportionally to weight across seeds (validated on a pure-Python
replica of the md5 ticket scheme, 400 seeds in milliseconds); (2) the
Spark implementation agrees with that replica exactly (engine parity,
per row); (3) the global top-k plans as TakeOrderedAndProject, never a
full sort."""

from __future__ import annotations

import hashlib

import pytest

from tests.conftest import SF_SMALL


def _py_ticket(seed: int, doc_id: int, w: int) -> int | None:
    """Pure-Python replica of _ticket_expr (60-bit md5 prefix min)."""
    if w <= 0:
        return None
    return min(
        int(hashlib.md5(f"{seed}:{doc_id}:{c}".encode()).hexdigest()[:15], 16)
        for c in range(1, w + 1)
    )


def test_scheme_is_weighted_sampling():
    """Across 400 seeds, P(row drawn first) must track w_i / W.
    10 rows: ids 0-4 weight 1, ids 5-9 weight 4 -> heavy rows should
    win ~80% of the time (binomial sd ~2%; assert within 8 points)."""
    weights = {i: (1 if i < 5 else 4) for i in range(10)}
    heavy_wins = 0
    for seed in range(400):
        winner = min(
            weights, key=lambda i: (_py_ticket(seed, i, weights[i]), i)
        )
        heavy_wins += winner >= 5
    share = heavy_wins / 400
    assert abs(share - 0.8) < 0.08, share


def test_spark_matches_python_replica(spark):
    """Engine parity: the Spark expression's ticket for every document
    equals the hashlib replica, and the grouped sample is exactly the
    replica's per-group bottom-k."""
    from pyspark.sql import functions as F

    from dagster_etl_spark.operators.sampling import weighted_sample_topk
    from dagster_etl_spark.sources.fixtures import load_table

    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "source", "n_chars"
    )
    rows = docs.collect()
    got = weighted_sample_topk(
        docs, weight_expr="1 + n_chars % 8", k=5, group_col="source", seed=3
    ).collect()

    expected: dict[str, list[tuple[int, int]]] = {}
    for r in rows:
        t = _py_ticket(3, r.doc_id, 1 + r.n_chars % 8)
        expected.setdefault(r.source, []).append((t, r.doc_id))
    want = {
        (src, did, t, rank + 1)
        for src, lst in expected.items()
        for rank, (t, did) in enumerate(sorted(lst)[:5])
    }
    assert {(r.source, r.doc_id, r.ticket, r.sample_rank) for r in got} == want


def test_zero_weight_never_sampled(spark):
    import pandas as pd

    from dagster_etl_spark.operators.sampling import weighted_sample_topk

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3], "w": [0, 1, 2]})
    )
    got = weighted_sample_topk(df, weight_expr="w", k=3, id_col="doc_id")
    assert {r.doc_id for r in got.collect()} == {2, 3}


def test_global_topk_plans_as_take_ordered(spark):
    """The ungrouped sample must never pay a full global sort: Spark's
    TakeOrderedAndProject (per-partition heads + merge) is the plan."""
    from dagster_etl_spark.operators.sampling import weighted_sample_topk
    from dagster_etl_spark.sources.fixtures import load_table

    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "n_chars")
    top = weighted_sample_topk(docs, weight_expr="1 + n_chars % 8", k=10)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:800]


def test_token_budget_mixture_semantics(spark):
    """Per-source budgets: every source stops at its budget-crossing
    doc (sum-before-last < budget <= sum-including-last unless the
    source ran out), unlisted sources are excluded, and the selection
    is a hash-order prefix (rerunning with the same seed is identical)."""
    from dagster_etl_spark.operators.sampling import token_budget_mixture
    from dagster_etl_spark.sources.fixtures import load_table

    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "source", "n_chars"
    )
    budgets = {"src0": 10**9, "src1": 3_000, "src2": 400}
    got = token_budget_mixture(docs, budgets, seed=5)
    rows = got.collect()
    assert {r.source for r in rows} <= set(budgets)

    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    totals = {
        r.source: r.total
        for r in docs.groupBy("source").agg(
            __import__("pyspark.sql.functions", fromlist=["sum"])
            .sum("n_chars")
            .alias("total")
        ).collect()
    }
    for src, b in budgets.items():
        sel = sorted(by_src.get(src, []), key=lambda r: r.cum_tokens)
        assert sel, f"{src} selected nothing"
        took = sum(r.n_chars for r in sel)
        if took < b:  # source exhausted under budget -> all docs kept
            assert len(sel) == docs.filter(f"source = '{src}'").count()
            assert took == totals[src]
        else:  # crossing doc kept, nothing after it
            assert took - sel[-1].n_chars < b <= took

    # determinism: same seed, same selection
    again = {(r.source, r.doc_id) for r in token_budget_mixture(
        docs, budgets, seed=5).collect()}
    assert again == {(r.source, r.doc_id) for r in rows}


def test_fractional_weights_round_half_up(spark):
    """r11 ADVICE: a bare CAST(w AS INT) floor-truncates, so
    0 < w < 1 silently became 'never sampled'. Weights now round
    HALF-UP on both dialects: 0.6 -> 1 ticket (sampled), 0.4 -> 0
    tickets (excluded), 2.5 -> 3 tickets (== integer weight 3)."""
    from dagster_etl_spark.operators.sampling import (
        _ticket_expr,
        weighted_sample_topk,
    )
    from dagster_etl_spark.functions import xdialect as x

    df = spark.createDataFrame(
        [(1, 0.6), (2, 0.4), (3, 2.5)], "doc_id BIGINT, w DOUBLE"
    )
    got = weighted_sample_topk(df, "w", k=10, seed=7)
    ids = {r.doc_id for r in got.collect()}
    assert 1 in ids, "w=0.6 must round up to 1 ticket"
    assert 2 not in ids, "w=0.4 must round down to 0 tickets"
    # 2.5 rounds half-up to 3: identical ticket to an integer weight 3
    frac = df.filter("doc_id = 3").selectExpr(
        f"{_ticket_expr('doc_id', 'w', 7, x.SPARK)} AS t"
    ).head()[0]
    inte = spark.createDataFrame([(3, 3)], "doc_id BIGINT, w INT").selectExpr(
        f"{_ticket_expr('doc_id', 'w', 7, x.SPARK)} AS t"
    ).head()[0]
    assert frac == inte
