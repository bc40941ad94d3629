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
