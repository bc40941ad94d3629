"""Text scrubbing operators for training-data pipelines: PII redaction
and benchmark decontamination.

Both are pure built-in expressions (regexp_replace / hash joins), so
they run JVM-side at full codegen speed — no UDFs in the hot path.

Regex note: patterns here are written in the common subset of Java
regex (Spark) and RE2-ish DuckDB regex — character classes, +, {m,n},
alternation — so the DuckDB oracles execute the identical substitution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dagster_etl_spark.functions import xdialect as x
from dagster_etl_spark.plans.layout import spread

# pattern -> replacement token, applied in order: specific before broad
# (SSNs would otherwise be swallowed by the phone pattern)
PII_RULES: tuple[tuple[str, str], ...] = (
    (r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    (r"https?://[^\s]+", "<URL>"),
    (r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    # each repeat adds one digit and at most TWO separator chars (") "
    # and " (" appear in formatted numbers), 7-15 digits total: an
    # unbounded separator class would collapse whole tables of
    # space-separated numbers into a single <PHONE> token
    (r"\+?\b[0-9]([()\-\s]{0,2}[0-9]){6,14}\b", "<PHONE>"),
)


def redact_expr(text_col: str, d: str, rules=PII_RULES) -> str:
    """Chained regexp_replace applying every rule (identical chain in
    both dialects; DuckDB needs the global 'g' flag)."""
    expr = text_col
    for pat, repl in rules:
        pat_sql = pat.replace("\\", "\\\\") if d == x.SPARK else pat
        if d == x.SPARK:
            expr = f"regexp_replace({expr}, '{pat_sql}', '{repl}')"
        else:
            expr = f"regexp_replace({expr}, '{pat_sql}', '{repl}', 'g')"
    return expr


def redact_pii(df: DataFrame, text_col: str = "text", out_col: str = "clean_text") -> DataFrame:
    return spread(df).withColumn(out_col, F.expr(redact_expr(text_col, x.SPARK)))


# -- decontamination -----------------------------------------------------------

def contaminated_ids(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
) -> DataFrame:
    """Classic 13-gram decontamination: a corpus doc is contaminated if
    it shares ANY n-gram with the benchmark set.

    Both sides reduce to distinct 60-bit n-gram hashes; the semi-join on
    hashes is the only shuffle, with the benchmark side broadcast when
    small (typical: benchmarks are tiny vs the corpus). Returns distinct
    contaminated ``id_col`` values.
    """
    def grams(df: DataFrame, keep_id: bool) -> DataFrame:
        sh = x.let(
            x.tokens(text_col, x.SPARK),
            "_t",
            x.shingles("_t", n, x.SPARK),
            x.SPARK,
        )
        hashed = f"{x.xform('_sh', 's', x.h60('s', x.SPARK), x.SPARK)}"
        cols = [id_col] if keep_id else []
        return (
            df.selectExpr(*cols, f"{sh} AS _sh")
            .selectExpr(*cols, f"explode({hashed}) AS gh")
        )

    corpus_grams = grams(spread(corpus), keep_id=True)
    bench_grams = F.broadcast(grams(benchmark, keep_id=False).distinct())
    return (
        corpus_grams.join(bench_grams, on="gh", how="left_semi")
        .select(id_col)
        .distinct()
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
) -> DataFrame:
    """Corpus minus contaminated docs (left_anti on the id set)."""
    bad = contaminated_ids(corpus, benchmark, text_col, id_col, n)
    return corpus.join(bad, on=id_col, how="left_anti")


def _grams(
    df: DataFrame, text_col: str, id_col: str | None, n: int, distinct: bool = True
) -> DataFrame:
    """60-bit n-gram hashes, optionally keyed by document — the shared
    front half of every decontamination variant. ``distinct=False``
    skips the dedup shuffle for membership-only consumers (the bloom
    probe), where repeated grams change nothing."""
    sh = x.let(
        x.tokens(text_col, x.SPARK), "_t", x.shingles("_t", n, x.SPARK), x.SPARK
    )
    hashed = f"{x.xform('_sh', 's', x.h60('s', x.SPARK), x.SPARK)}"
    cols = [id_col] if id_col else []
    out = df.selectExpr(*cols, f"{sh} AS _sh").selectExpr(
        *cols, f"explode({hashed}) AS gh"
    )
    return out.distinct() if distinct else out


def contamination_score(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
) -> DataFrame:
    """GRADED decontamination: instead of the binary any-shared-n-gram
    verdict (:func:`contaminated_ids`), score each corpus document by
    the fraction of its distinct n-grams that appear in the benchmark
    — the standard graded-overlap contamination report (the binary
    rule is this score thresholded at > 0). Docs with fewer than one
    full n-gram score 0 over 0 grams and are reported with ratio 0.

    Returns ``(id_col, n_grams, n_hit, overlap_ratio)`` — counts are
    exact BIGINTs; the ratio is one exact-int division in double
    (IEEE division is exactly rounded, so both engines agree
    bit-for-bit — same contract as every avg in the registry).

    Scale shape: benchmark grams broadcast (benchmarks are tiny vs a
    100 TB corpus); corpus grams never shuffle for the membership
    probe (broadcast hash join), then ONE hash aggregate on
    ``id_col``. The distinct-per-doc dedup rides the same aggregate
    (group by (doc, gh) folded into group by doc via countDistinct
    semantics below).
    """
    corpus_grams = _grams(spread(corpus), text_col, id_col, n)
    bench = F.broadcast(
        _grams(benchmark, text_col, None, n).withColumn("_hit", F.lit(1))
    )
    scored = (
        corpus_grams.join(bench, on="gh", how="left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_hit"),
        )
    )
    # docs too short for a single n-gram still get a row (ratio 0)
    all_docs = corpus.select(id_col)
    return (
        all_docs.join(scored, on=id_col, how="left")
        .selectExpr(
            id_col,
            "CAST(coalesce(n_grams, 0) AS BIGINT) AS n_grams",
            "CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit",
            "CASE WHEN coalesce(n_grams, 0) = 0 THEN CAST(0 AS DOUBLE) "
            "ELSE CAST(n_hit AS DOUBLE) / CAST(n_grams AS DOUBLE) END "
            "AS overlap_ratio",
        )
    )


def contamination_score_oracle_sql(
    corpus: str = "documents",
    benchmark_where: str = "doc_id % 17 = 0",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
) -> str:
    """DuckDB mirror of :func:`contamination_score` with the benchmark
    defined as a filtered slice of the same table (the fixture has no
    separate benchmark table; the registered query uses the same
    slice)."""
    toks = x.tokens(text_col, x.DUCK)
    sh = x.let(toks, "_t", x.shingles("_t", n, x.DUCK), x.DUCK)
    hashed = x.xform("_sh", "s", x.h60("s", x.DUCK), x.DUCK)
    return f"""
WITH cg AS (
  SELECT DISTINCT {id_col}, UNNEST({hashed}) AS gh
  FROM (SELECT {id_col}, {sh} AS _sh FROM {corpus})
), bg AS (
  SELECT DISTINCT gh FROM (
    SELECT UNNEST({hashed}) AS gh
    FROM (SELECT {sh} AS _sh FROM {corpus} WHERE {benchmark_where})
  )
), scored AS (
  SELECT cg.{id_col},
         COUNT(*) AS n_grams,
         COUNT(bg.gh) AS n_hit
  FROM cg LEFT JOIN bg USING (gh)
  GROUP BY cg.{id_col}
)
SELECT d.{id_col},
       CAST(COALESCE(s.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(s.n_hit, 0) AS BIGINT) AS n_hit,
       CASE WHEN COALESCE(s.n_grams, 0) = 0 THEN CAST(0 AS DOUBLE)
            ELSE CAST(s.n_hit AS DOUBLE) / CAST(s.n_grams AS DOUBLE) END
         AS overlap_ratio
FROM {corpus} d LEFT JOIN scored s USING ({id_col})
"""


_BLOOM_K = 2  # probe hashes per element


def _bloom_positions_expr(num_bits: int) -> list[str]:
    """K deterministic bit positions for a gram hash ``gh`` — two
    independent xxhash64 seeds, reduced mod num_bits (pmod keeps the
    sign out)."""
    return [
        f"pmod(xxhash64(gh, {seed}), CAST({num_bits} AS BIGINT))"
        for seed in range(1, _BLOOM_K + 1)
    ]


def _bloom_words(bench_grams: DataFrame, num_bits: int) -> DataFrame:
    """Build the filter as (word_idx BIGINT, bits BIGINT) — the set
    bit positions of every benchmark gram OR-folded into 64-bit words
    (``bit_or`` aggregate). num_bits/64 rows max — a few MB even at
    hundreds of millions of bits, broadcastable anywhere."""
    pos = ", ".join(_bloom_positions_expr(num_bits))
    return (
        bench_grams.selectExpr(f"explode(array({pos})) AS pos")
        .selectExpr(
            "CAST(pos DIV 64 AS BIGINT) AS word_idx",
            "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT)) AS mask",
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )


def _bloom_member(
    corpus_grams: DataFrame, words: DataFrame, num_bits: int, id_col: str
) -> DataFrame:
    """Rows of ``corpus_grams`` whose gram is a (possible) bloom
    member: K successive BROADCAST joins against the word table, one
    per probe position — the corpus side streams through unshuffled
    (no explode, no re-aggregation; each join only appends a word
    lookup), which is the entire point of the bloom path."""
    out = corpus_grams
    for i, pos in enumerate(_bloom_positions_expr(num_bits)):
        w = F.broadcast(
            words.select(
                F.col("word_idx").alias(f"_w{i}"), F.col("bits").alias(f"_bits{i}")
            )
        )
        out = (
            out.selectExpr(
                "*",
                f"CAST(({pos}) DIV 64 AS BIGINT) AS _w{i}",
                f"shiftleft(CAST(1 AS BIGINT), CAST(({pos}) % 64 AS INT)) AS _m{i}",
            )
            .join(w, on=f"_w{i}", how="left")
            .filter(
                F.col(f"_bits{i}").isNotNull()
                & (
                    F.col(f"_bits{i}").bitwiseAND(F.col(f"_m{i}"))
                    == F.col(f"_m{i}")
                )
            )
        )
    return out.select(id_col, "gh")


def bloom_contaminated_ids(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    num_bits: int = 4_000_000,
) -> DataFrame:
    """The PRODUCTION bloom path (no exact twin in the plan): distinct
    ids of corpus docs with any (possible) benchmark n-gram, via the
    broadcast word-table probe. Superset of
    :func:`contaminated_ids` — false positives over-remove < 1% of
    the corpus at the default sizing (asserted by the gate query);
    false negatives are structurally impossible. The corpus side pays
    ZERO shuffles for the probe (plan-pinned by
    test_bloom_probe_plan_has_no_corpus_shuffle); the only corpus
    exchange is the final doc-id distinct."""
    corpus_grams = _grams(spread(corpus), text_col, id_col, n, distinct=False)
    words = _bloom_words(_grams(benchmark, text_col, None, n), num_bits)
    return (
        _bloom_member(corpus_grams, words, num_bits, id_col)
        .select(id_col)
        .distinct()
    )


def bloom_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    num_bits: int = 4_000_000,
) -> DataFrame:
    """Corpus minus bloom-flagged docs — the 100 TB form of
    :func:`decontaminate`: the benchmark ships as a few MB of bloom
    words instead of the full distinct-gram relation."""
    bad = bloom_contaminated_ids(corpus, benchmark, text_col, id_col, n, num_bits)
    return corpus.join(bad, on=id_col, how="left_anti")


def bloom_decontaminate_gate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    num_bits: int = 4_000_000,
) -> DataFrame:
    """Bloom-filter decontamination, gated against the exact twin —
    the 100 TB shape of :func:`contaminated_ids`: the benchmark-gram
    set compresses ONCE into a bloom filter and ships to every
    executor, so the corpus-side membership probe is scan-local — the
    exact semi-join instead broadcasts the full distinct-gram hash
    relation, an order of magnitude more executor memory at
    benchmark-suite scale (100M grams ~ 800 MB relation vs a few MB
    of bloom bits). The filter is built with plain DataFrame ops —
    K=2 xxhash64 bit positions OR-folded into 64-bit words
    (``bit_or`` aggregate) — because this build's SQL registry
    exposes ``bloom_filter_agg`` but not ``might_contain``; the
    word-table form keeps the whole path in codegen and broadcasts
    identically. (Spark's runtime row-level bloom join —
    spark.sql.optimizer.runtime.bloomFilter.* — is the automatic
    sibling of this explicit operator.)

    False positives over-remove slightly (tunable via num_bits);
    false negatives are structurally impossible, so the exact-removed
    set is always a subset — which is precisely what this gate
    asserts, in-query, the same pattern as approx_distinct_gate:

    Returns ONE row ``(n_exact_removed, n_bloom_removed,
    superset_ok, fp_excess_ok)`` where superset_ok = every exactly-
    contaminated doc is bloom-removed, and fp_excess_ok = the bloom
    over-removal is < ceil(1% of the corpus) — integer ceiling, so a
    corpus of 150 docs tolerates 1 false positive (floor division
    demanded strictly zero below 200 docs, stricter than the
    documented bound; r12 ADVICE). The corpus-doc count feeds the
    bound as a one-row aggregate cross-joined into the plan — zero
    build-time Spark jobs (same principle that retired the r8 eager
    count() shapes). The DuckDB oracle computes ``n_exact_removed``
    and asserts the two booleans as literals — hash-green iff the
    bounds hold on the real run.
    """
    bloom_hit = bloom_contaminated_ids(
        corpus, benchmark, text_col, id_col, n, num_bits
    )
    exact_hit = contaminated_ids(corpus, benchmark, text_col, id_col, n)
    n_corpus = corpus.agg(
        F.countDistinct(id_col).cast("long").alias("_n_corpus")
    )
    bloom_c = bloom_hit.withColumn("_b", F.lit(1))
    exact_c = exact_hit.withColumn("_e", F.lit(1))
    joined = bloom_c.join(exact_c, on=id_col, how="full")
    counted = joined.agg(
        F.coalesce(F.sum("_e"), F.lit(0)).cast("long").alias("n_exact_removed"),
        F.coalesce(F.sum("_b"), F.lit(0)).cast("long").alias("n_bloom_removed"),
        # no exact-contaminated doc may escape the bloom
        (F.sum(F.when(F.col("_e").isNotNull() & F.col("_b").isNull(), 1)).isNull()).alias(
            "superset_ok"
        ),
        F.coalesce(
            F.sum(F.when(F.col("_b").isNotNull() & F.col("_e").isNull(), 1)),
            F.lit(0),
        )
        .cast("long")
        .alias("_fp_excess"),
    )
    return counted.crossJoin(F.broadcast(n_corpus)).selectExpr(
        "n_exact_removed",
        "n_bloom_removed",
        "superset_ok",
        # integer ceil: (n + 99) DIV 100; GREATEST keeps an empty
        # corpus from demanding fp_excess < 0
        "_fp_excess < GREATEST(CAST(1 AS BIGINT), (_n_corpus + 99) DIV 100)"
        " AS fp_excess_ok",
    )
