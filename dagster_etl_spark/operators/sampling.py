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
    every run, on every engine, at every scale. NULL-id rows hash to
    NULL and are always dropped (a NULL id has no stable identity to
    sample by)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
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
    range; identical SQL shape in both dialects. NULL ids get a NULL
    label explicitly — without the guard the NULL bucket comparison
    falls through every WHEN into the ELSE arm, silently dumping every
    null-id row into the LAST split (for train/val/test that is
    test-set contamination, the worst possible default)."""
    if not weights:
        raise ValueError("split weights must name at least one split")
    bucket = _bucket_expr(id_col, d, salt)
    clauses, lo = [f"WHEN {id_col} IS NULL THEN NULL"], 0
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


def _copies_expr(id_col: str, d: str, weight: float, salt: str) -> str:
    """Integer copy count per row realizing ``weight``: floor(weight)
    full copies + one more for the hash-selected fraction."""
    base = int(weight)
    cut = int(round((weight - base) * _BUCKETS))
    if cut == 0:
        return str(base)
    return f"({base} + (CASE WHEN {_bucket_expr(id_col, d, salt)} < {cut} THEN 1 ELSE 0 END))"


def weighted_mix(
    sources: dict[str, tuple[DataFrame, float]],
    id_col: str = "doc_id",
    salt: str = "mix:",
) -> DataFrame:
    """Deterministic corpus mixture: each source contributes its rows
    ``weight`` times in expectation — floor(weight) exact copies plus a
    hash-selected fractional copy (weight 2.5 -> every row twice, half
    the rows a third time; weight 0.3 -> ~30% of rows once). This is
    the pretraining data-mixing step (up-weight books, down-weight raw
    web) as a pure per-row projection: no shuffle, no RNG, identical
    output on every rerun and engine. The per-source salt decorrelates
    the fractional picks from each other and from hash_split."""
    if not sources:
        raise ValueError("weighted_mix requires at least one source")
    for name, (_, w) in sources.items():
        if w < 0:
            raise ValueError(f"mixture weight for {name!r} must be >= 0, got {w}")
    parts = []
    for name, (df, w) in sources.items():
        n = _copies_expr(id_col, x.SPARK, w, salt + name)
        parts.append(
            df.withColumn("source", F.lit(name))
            .withColumn("_n", F.expr(n))
            .filter(F.col("_n") >= 1)
            .withColumn("copy_idx", F.explode(F.expr("sequence(1, _n)")))
            .withColumn("copy_idx", F.col("copy_idx").cast("bigint"))
            .drop("_n")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def stratified_sample_expr(
    id_col: str, strata_col: str, rates: dict[str, float], d: str, salt: str = "strat:"
) -> str:
    """Boolean keep-predicate for per-stratum hash sampling: each
    stratum value gets its own retention rate (unlisted strata drop).
    Same determinism contract as hash_sample — a pure function of
    (id, stratum), no RNG, no shuffle."""
    bucket = _bucket_expr(id_col, d, salt)
    clauses = [
        # '' -> escaped quote: stratum values are arbitrary (str()-
        # coerced) and must not alter the predicate (same literal
        # syntax both engines)
        f"WHEN {strata_col} = '{str(v).replace(chr(39), chr(39) * 2)}' "
        f"THEN {bucket} < {int(round(r * _BUCKETS))}"
        for v, r in rates.items()
    ]
    return "CASE " + " ".join(clauses) + " ELSE FALSE END"


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str,
    id_col: str = "doc_id",
    salt: str = "strat:",
) -> DataFrame:
    """Deterministic per-stratum downsampling — the corpus-balancing
    step (e.g. cap web text at 10%, keep all books): rerun-, engine-
    and growth-stable like hash_sample, one per-row predicate."""
    return df.filter(
        F.expr(stratified_sample_expr(id_col, strata_col, rates, x.SPARK, salt))
    )


def epoch_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 0,
    num_shards: int = 64,
) -> DataFrame:
    """Deterministic global training order for one epoch: order key =
    md5-hash of ``seed:id``, shard = key mod ``num_shards``, position =
    rank within the shard. Training readers consume shards in shard-id
    order, rows in position order — the resulting permutation is
    ``ORDER BY (key % S, key)``, a pseudorandom order that differs per
    seed (epoch), is reproducible on any engine or cluster size, and
    needs NO global sort: the only exchange is the hash partition by
    shard, and each shard sorts independently (exactly the layout a
    100 TB corpus is written in — one output file tree per shard).

    ``num_shards`` should be >= the writer parallelism; per-shard sort
    memory is corpus_size / num_shards.
    """
    from pyspark.sql.window import Window

    key = x.h60(f"concat('{seed}:', CAST({id_col} AS STRING))", x.SPARK)
    w = Window.partitionBy("shard").orderBy("order_key", id_col)
    return (
        df.selectExpr(id_col, f"{key} AS order_key")
        .withColumn(
            "shard", F.pmod(F.col("order_key"), F.lit(num_shards)).cast("int")
        )
        .withColumn("pos", F.row_number().over(w).cast("long"))
    )


def epoch_shuffle_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    seed: int = 0,
    num_shards: int = 64,
) -> str:
    """DuckDB mirror of :func:`epoch_shuffle` (same md5 order key)."""
    key = x.h60(f"'{seed}:' || CAST({id_col} AS VARCHAR)", x.DUCK)
    return f"""
WITH k AS (SELECT {id_col}, {key} AS order_key FROM {table})
SELECT {id_col}, order_key,
       CAST(order_key % {num_shards} AS INT) AS shard,
       CAST(row_number() OVER (
         PARTITION BY order_key % {num_shards}
         ORDER BY order_key, {id_col}) AS BIGINT) AS pos
FROM k
"""


def _ticket_expr(id_col: str, weight_expr: str, seed: int, d: str) -> str:
    """Min over ``w`` deterministic ticket hashes — one expression per
    row, no shuffle. Weight 0 yields an empty ticket list -> NULL key
    (filtered out: a zero-weight row is never sampled).

    Weights are integer ticket counts by construction. Fractional
    weights are rounded HALF-UP (``FLOOR(w + 0.5)``, identical in both
    dialects — a bare CAST would floor-truncate in Spark, so 0 < w < 1
    would silently become "never sampled", and DuckDB's CAST rounds,
    so the engines would disagree). Rows rounding to 0 tickets are
    excluded; callers needing sub-unit probability resolution should
    pre-scale weights (e.g. ``weight * 100``). Cost bound: the ticket
    min materializes an O(w) array per row before reducing, so the MAX
    weight bounds per-row work/memory — keep weights small (quality
    tiers, not raw byte counts); w <= ~10^4 is cheap, w ~ 10^7 is not.
    """
    w_int = f"CAST(FLOOR(({weight_expr}) + 0.5) AS INT)"
    if d == x.SPARK:
        # sequence(1, 0) counts DOWN in Spark ([1, 0]) instead of being
        # empty — guard non-positive weights to NULL explicitly
        seq = f"sequence(1, {w_int})"
        body = x.h60(
            f"concat('{seed}:', CAST({id_col} AS STRING), ':', CAST(c AS STRING))",
            d,
        )
        return (
            f"CASE WHEN {w_int} < 1 THEN NULL "
            f"ELSE {x.xmin(x.xform(seq, 'c', body, d), d)} END"
        )
    seq = f"range(1, {w_int} + 1)"
    body = x.h60(
        f"('{seed}:' || CAST({id_col} AS VARCHAR) || ':' || CAST(c AS VARCHAR))",
        d,
    )
    return x.xmin(x.xform(seq, "c", body, d), d)


def weighted_sample_topk(
    df: DataFrame,
    weight_expr: str,
    k: int,
    id_col: str = "doc_id",
    seed: int = 0,
    group_col: str | None = None,
) -> DataFrame:
    """EXACT weighted sampling without replacement, reproducible on any
    engine — the quality-weighted corpus subsample every training-data
    pipeline needs ("sample 1M docs, high-quality docs 8x more often").

    Scheme: each row gets ``w`` integer lottery tickets (md5 of
    seed:id:c), its key is the MIN ticket, and the sample is the
    bottom-k keys. Exchangeability of the global ticket pool gives the
    exact sequential weighted-draw law — P(row first) = w_i / W, then
    renormalized without replacement — the same law as
    Efraimidis-Spirakis u^(1/w) keys, but in PURE INTEGER arithmetic:
    no pow/ln, so Spark and any oracle engine agree bit-for-bit (float
    transcendentals are not cross-engine reproducible at the last ulp;
    integer md5 is).

    Scale shape: the ticket min is a per-row projection (O(w) md5s, no
    shuffle); global top-k plans as TakeOrderedAndProject (per-partition
    heads, never a full sort); ``group_col`` switches to k-per-group
    via a window over the group partition. Returns the sampled rows
    with ``ticket`` and ``sample_rank`` (1 = first draw).
    """
    from pyspark.sql.window import Window

    key = _ticket_expr(id_col, weight_expr, seed, x.SPARK)
    keyed = df.selectExpr("*", f"{key} AS ticket").filter(
        F.col("ticket").isNotNull()
    )
    if group_col is None:
        w = Window.orderBy("ticket", id_col)
        # rank AFTER the limit: row_number over the k retained rows
        # only, not a global-window pass over the corpus
        top = keyed.orderBy("ticket", id_col).limit(k)
        return top.withColumn(
            "sample_rank", F.row_number().over(w).cast("long")
        )
    w = Window.partitionBy(group_col).orderBy("ticket", id_col)
    return (
        keyed.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= k)
    )


def weighted_sample_oracle_sql(
    weight_expr: str,
    k: int,
    table: str = "documents",
    id_col: str = "doc_id",
    seed: int = 0,
    group_col: str | None = None,
    select_cols: str = "*",
) -> str:
    """DuckDB mirror of :func:`weighted_sample_topk` (same tickets)."""
    key = _ticket_expr(id_col, weight_expr, seed, x.DUCK)
    if group_col is None:
        return f"""
WITH keyed AS (
  SELECT {select_cols}, {key} AS ticket FROM {table}
), top AS (
  SELECT * FROM keyed WHERE ticket IS NOT NULL
  ORDER BY ticket, {id_col} LIMIT {k}
)
SELECT *, CAST(row_number() OVER (ORDER BY ticket, {id_col}) AS BIGINT)
       AS sample_rank
FROM top
"""
    return f"""
WITH keyed AS (
  SELECT {select_cols}, {key} AS ticket FROM {table}
), ranked AS (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY {group_col} ORDER BY ticket, {id_col}) AS BIGINT)
    AS sample_rank
  FROM keyed WHERE ticket IS NOT NULL
)
SELECT * FROM ranked WHERE sample_rank <= {k}
"""


def token_budget_mixture(
    df: DataFrame,
    budgets: dict[str, int],
    token_col: str = "n_chars",
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Fill per-source TOKEN budgets deterministically — the mixture
    primitive pretraining actually uses ("10B tokens: 60% web, 30%
    code, 10% books" is a budget per source, not a row-sample rate):
    order each source's docs by a seeded hash (so the budget takes a
    pseudorandom prefix, not a biased head), take docs while the
    running token total is under budget, and keep the ONE document
    that crosses the line (budgets land mid-document; truncation is
    the downstream packer's job — dropping it instead would undershoot
    every budget by half a document on average).

    Scale shape: one hash exchange on the source key, per-source
    cumulative-sum window (each source sorts independently — no global
    sort), all integer arithmetic (md5 order key + exact token cumsum)
    so any engine reproduces the exact selection. Sources absent from
    ``budgets`` are excluded.

    Returns the selected rows + ``order_key``, ``cum_tokens`` (running
    total INCLUDING the row) and ``budget`` for auditability.
    """
    from pyspark.sql.window import Window

    key = x.h60(
        f"concat('mixb:{seed}:', CAST({id_col} AS STRING))", x.SPARK
    )
    budget_case = "CASE " + " ".join(
        f"WHEN {source_col} = '{s}' THEN CAST({b} AS BIGINT)"
        for s, b in sorted(budgets.items())
    ) + " ELSE NULL END"
    w = (
        Window.partitionBy(source_col)
        .orderBy("order_key", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    keyed = (
        df.selectExpr("*", f"{key} AS order_key", f"{budget_case} AS budget")
        .filter(F.col("budget").isNotNull())
        .withColumn(
            "cum_tokens", F.sum(F.col(token_col).cast("long")).over(w)
        )
    )
    # keep rows whose PREVIOUS cumulative total was under budget: the
    # crossing row stays, everything after it goes
    return keyed.filter(
        F.col("cum_tokens") - F.col(token_col) < F.col("budget")
    )


def token_budget_mixture_oracle_sql(
    budgets: dict[str, int],
    table: str = "documents",
    token_col: str = "n_chars",
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
    select_cols: str = "*",
) -> str:
    """DuckDB mirror of :func:`token_budget_mixture`."""
    key = x.h60(
        f"('mixb:{seed}:' || CAST({id_col} AS VARCHAR))", x.DUCK
    )
    budget_case = "CASE " + " ".join(
        f"WHEN {source_col} = '{s}' THEN CAST({b} AS BIGINT)"
        for s, b in sorted(budgets.items())
    ) + " ELSE NULL END"
    return f"""
WITH keyed AS (
  SELECT {select_cols}, {key} AS order_key, {budget_case} AS budget
  FROM {table}
), c AS (
  -- CAST the running sum: DuckDB SUM(BIGINT) yields HUGEINT, which
  -- pandas coerces to float64 and the dtype-kind gate rejects
  SELECT *, CAST(SUM(CAST({token_col} AS BIGINT)) OVER (
    PARTITION BY {source_col} ORDER BY order_key, {id_col}
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
  FROM keyed WHERE budget IS NOT NULL
)
SELECT * FROM c WHERE cum_tokens - {token_col} < budget
"""


def temperature_mixture(
    df: DataFrame,
    budget: int,
    token_col: str = "n_chars",
    source_col: str = "source",
) -> DataFrame:
    """Temperature-flattened mixture weights (alpha = 0.5): the
    standard multilingual/multi-source rebalancing rule — sampling
    weight proportional to (source token share)^alpha — which upweights
    small sources relative to proportional sampling (alpha=1) without
    the uniform extreme (alpha=0).

    alpha is FIXED at 0.5 because sqrt is the one fractional power
    IEEE 754 requires to be exactly rounded — pow(x, 0.25) etc. differ
    between libm implementations and would break the bit-exact oracle
    contract. Weights are INTEGER sqrt (CAST(FLOOR(SQRT(tokens)) AS
    BIGINT)): the double sqrt of an exact BIGINT is engine-identical,
    floor/cast are exact, and all downstream arithmetic (weight sums,
    budget allocation) stays in exact integers — shares are one
    exact-int division in double, the registry's avg contract. The
    integer truncation perturbs a source's weight by at most 1 part in
    isqrt(tokens) — noise at corpus scale. Valid for token totals
    < 2^52 per source (exact-double range for sqrt input) and
    budget * isqrt(total) < 2^63.

    Scale shape: ONE map-side-combinable hash aggregate on the source
    key (sources are few — the output is dimension-sized), then a
    broadcast one-row total cross-joined in-plan (no build-time jobs).

    Returns one row per source: (source, n_tokens, raw_share,
    temp_weight, temp_share, alloc_tokens) where alloc_tokens =
    budget * temp_weight DIV total_weight (exact integer).
    """
    per = df.groupBy(source_col).agg(
        F.sum(F.col(token_col).cast("long")).cast("long").alias("n_tokens")
    )
    w = per.selectExpr(
        source_col,
        "n_tokens",
        "CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS temp_weight",
    )
    tot = w.agg(
        F.sum("n_tokens").cast("long").alias("_tot_tokens"),
        F.sum("temp_weight").cast("long").alias("_tot_w"),
    )
    return w.crossJoin(F.broadcast(tot)).selectExpr(
        source_col,
        "n_tokens",
        "CAST(n_tokens AS DOUBLE) / CAST(_tot_tokens AS DOUBLE) AS raw_share",
        "temp_weight",
        "CAST(temp_weight AS DOUBLE) / CAST(_tot_w AS DOUBLE) AS temp_share",
        f"CAST(({budget} * temp_weight) DIV _tot_w AS BIGINT) AS alloc_tokens",
    )


def temperature_mixture_oracle_sql(
    budget: int,
    table: str = "documents",
    token_col: str = "n_chars",
    source_col: str = "source",
) -> str:
    """DuckDB mirror of :func:`temperature_mixture` (same isqrt
    weights, same exact-int divisions; DuckDB's ``//`` is Spark's
    ``DIV``)."""
    return f"""
WITH per AS (
  SELECT {source_col},
         CAST(SUM(CAST({token_col} AS BIGINT)) AS BIGINT) AS n_tokens
  FROM {table} GROUP BY {source_col}
), w AS (
  SELECT {source_col}, n_tokens,
         CAST(FLOOR(SQRT(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS temp_weight
  FROM per
), tot AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS _tot_tokens,
         CAST(SUM(temp_weight) AS BIGINT) AS _tot_w
  FROM w
)
SELECT {source_col}, n_tokens,
       CAST(n_tokens AS DOUBLE) / CAST(_tot_tokens AS DOUBLE) AS raw_share,
       temp_weight,
       CAST(temp_weight AS DOUBLE) / CAST(_tot_w AS DOUBLE) AS temp_share,
       CAST(({budget} * temp_weight) // _tot_w AS BIGINT) AS alloc_tokens
FROM w, tot
"""
