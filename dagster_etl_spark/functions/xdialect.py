"""Cross-dialect (Spark SQL / DuckDB) expression builders.

The dedup / text-analysis / similarity operators must produce results
the driver can compare bit-for-bit against a DuckDB oracle. Hash-based
operators (MinHash, SimHash, fingerprints) are only comparable if both
engines compute the *same* hash — so everything is built on md5 (hex
output is identical everywhere) and a 60-bit integer prefix of it
(fits BIGINT in both engines), and the expression trees are generated
from one spec per operator with only dialect-level syntax differences.

Floating-point determinism: dot products and norms are emitted as
explicit left-associated term chains, so both engines execute the
identical IEEE operation sequence.
"""

from __future__ import annotations

SPARK = "spark"
DUCK = "duck"


def tokens(col: str, d: str) -> str:
    """Lower-cased whitespace tokenization. Empty tokens are filtered:
    both engines split '' into [''], which would otherwise produce a
    phantom token for empty/whitespace-only documents."""
    if d == SPARK:
        raw = f"split(trim(lower({col})), '\\\\s+')"
        return f"filter({raw}, t -> t != '')"
    raw = f"string_split_regex(trim(lower({col})), '\\s+')"
    return f"list_filter({raw}, t -> t != '')"


def h60(s: str, d: str) -> str:
    """Deterministic 60-bit hash of a string expr (md5 prefix)."""
    if d == SPARK:
        return f"CAST(conv(substr(md5({s}),1,15),16,10) AS BIGINT)"
    return f"(('0x'||substr(md5({s}),1,15)))::BIGINT"


def xform(arr: str, var: str, body: str, d: str) -> str:
    fn = "transform" if d == SPARK else "list_transform"
    return f"{fn}({arr}, {var} -> {body})"


def xfilter(arr: str, var: str, body: str, d: str) -> str:
    fn = "filter" if d == SPARK else "list_filter"
    return f"{fn}({arr}, {var} -> {body})"


def xsize(arr: str, d: str) -> str:
    return f"size({arr})" if d == SPARK else f"len({arr})"


def xmin(arr: str, d: str) -> str:
    return f"array_min({arr})" if d == SPARK else f"list_min({arr})"


def xmax(arr: str, d: str) -> str:
    return f"array_max({arr})" if d == SPARK else f"list_max({arr})"


def xsum_int(arr: str, d: str) -> str:
    """Exact integer sum of an int array -> BIGINT."""
    if d == SPARK:
        return f"aggregate({arr}, CAST(0 AS BIGINT), (acc, x) -> acc + x)"
    return f"CAST(list_sum({arr}) AS BIGINT)"


def idx(arr: str, i: int, d: str) -> str:
    """0-based element access (DuckDB lists are 1-based)."""
    return f"{arr}[{i}]" if d == SPARK else f"{arr}[{i + 1}]"


def idx_var(arr: str, ivar: str, d: str, offset: int = 0) -> str:
    """Element access with a 0-based loop variable ``ivar``."""
    off = f" + {offset}" if offset else ""
    if d == SPARK:
        return f"{arr}[{ivar}{off}]"
    return f"{arr}[{ivar}{off} + 1]"


def zero_range(n_expr: str, d: str) -> str:
    """Array [0, 1, ..., n-1] (guarded empty when n <= 0)."""
    if d == SPARK:
        return f"CASE WHEN {n_expr} > 0 THEN sequence(0, {n_expr} - 1) ELSE array() END"
    return f"CASE WHEN {n_expr} > 0 THEN range(0, {n_expr}) ELSE [] END"


def distinct(arr: str, d: str) -> str:
    return f"array_distinct({arr})" if d == SPARK else f"list_distinct({arr})"


def concat_arrays(a: str, b: str, d: str) -> str:
    return f"concat({a}, {b})" if d == SPARK else f"list_concat({a}, {b})"


def intersect(a: str, b: str, d: str) -> str:
    return f"array_intersect({a}, {b})" if d == SPARK else f"list_intersect({a}, {b})"


def let(bound: str, var: str, body: str, d: str) -> str:
    """Evaluate ``bound`` once per row, binding it to ``var`` inside
    ``body`` (single-element higher-order-function let).

    Catalyst's CollapseProject re-inlines staged projection columns into
    every downstream reference — a staged token array gets re-tokenized
    once per access, which turns O(tokens) ops into O(tokens × accesses)
    (measured 8× on the MinHash chain). Lambda arguments, by contrast,
    are materialized exactly once, in both Spark and DuckDB.
    """
    if d == SPARK:
        return f"transform(array({bound}), {var} -> {body})[0]"
    return f"list_transform([{bound}], {var} -> {body})[1]"


def shingles(tok: str, k: int, d: str) -> str:
    """Distinct k-word shingles of a token array (space-joined).

    ``tok`` MUST be a simple column reference to a pre-materialized
    token array, not an inline tokenize expression: this expression
    references ``tok`` 2 + k*size times, and engines do not reliably
    CSE inside array lambdas — an inlined tokenizer would re-split the
    text thousands of times per row.
    """
    n = f"({xsize(tok, d)} - {k - 1})"
    if d == SPARK:
        parts = ", ".join(idx_var(tok, "i", d, j) for j in range(k))
        body = f"concat_ws(' ', {parts})"
    else:
        body = " || ' ' || ".join(idx_var(tok, "i", d, j) for j in range(k))
    return distinct(xform(zero_range(n, d), "i", body, d), d)


def pos_shingle_hashes(tok: str, k: int, d: str) -> str:
    """Positional k-word shingle hashes (NON-distinct): element ``i``
    is ``h60`` of the space-joined shingle starting at token ``i``.
    Unlike :func:`shingles`, multiplicity and order are preserved —
    span-coverage arithmetic (duplicate_ngram_spans) needs the
    position of every occurrence, not the distinct set.

    Same materialization contract as :func:`shingles`: ``tok`` must be
    a pre-bound simple reference (use :func:`let`).
    """
    n = f"({xsize(tok, d)} - {k - 1})"
    if d == SPARK:
        parts = ", ".join(idx_var(tok, "i", d, j) for j in range(k))
        body = f"concat_ws(' ', {parts})"
    else:
        body = " || ' ' || ".join(idx_var(tok, "i", d, j) for j in range(k))
    return xform(zero_range(n, d), "i", h60(body, d), d)


def dot_chain(a: str, b: str, dim: int, d: str) -> str:
    """Explicit left-associated dot product over float arrays -> double."""
    terms = [
        f"CAST({idx(a, i, d)} AS DOUBLE) * CAST({idx(b, i, d)} AS DOUBLE)"
        for i in range(dim)
    ]
    return "(" + " + ".join(terms) + ")"


def dot_fold(a: str, b: str, d: str) -> str:
    """Dot product as a zip_with + left fold — same IEEE sequence as
    :func:`dot_chain` (left-associated, and ``0.0 + t0 == t0`` for all
    non-(-0.0) doubles), but O(1) expression-tree size so Spark's
    whole-stage codegen never hits the JVM 64KB method limit that the
    unrolled chain triggers at dim >= ~40 (janino fallback)."""
    if d == SPARK:
        return (
            f"aggregate(zip_with({a}, {b}, (p, q) -> "
            f"CAST(p AS DOUBLE) * CAST(q AS DOUBLE)), "
            f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
        )
    raise NotImplementedError("DuckDB oracles keep the explicit chain form")


def norm_fold(a: str, d: str) -> str:
    if d == SPARK:
        return (
            f"sqrt(aggregate(transform({a}, p -> "
            f"CAST(p AS DOUBLE) * CAST(p AS DOUBLE)), "
            f"CAST(0 AS DOUBLE), (acc, v) -> acc + v))"
        )
    raise NotImplementedError("DuckDB oracles keep the explicit chain form")


def norm_chain(a: str, dim: int, d: str) -> str:
    terms = [
        f"CAST({idx(a, i, d)} AS DOUBLE) * CAST({idx(a, i, d)} AS DOUBLE)"
        for i in range(dim)
    ]
    return "sqrt(" + " + ".join(terms) + ")"


def cosine(a: str, b: str, dim: int, d: str) -> str:
    """Cosine similarity. Spark uses fold form (codegen-friendly at any
    dim); DuckDB keeps the explicit chain (identical IEEE sequence).
    The denominator is nullif-guarded in both dialects: a zero-norm
    vector (padding row, failed encode — guaranteed to appear in a
    crawl-scale corpus) yields NULL cosine instead of aborting the job
    under ANSI mode with DIVIDE_BY_ZERO; NULLs sort after every real
    score in the desc top-k rank, so zero vectors simply never win."""
    if d == SPARK:
        return (
            f"({dot_fold(a, b, d)} / "
            f"nullif({norm_fold(a, d)} * {norm_fold(b, d)}, 0.0d))"
        )
    return (
        f"({dot_chain(a, b, dim, d)} / "
        f"nullif({norm_chain(a, dim, d)} * {norm_chain(b, dim, d)}, 0.0))"
    )


# -- int8 symmetric quantization (the 4x-memory ANN scale path) --------------


def _half_away(t: str, d: str) -> str:
    """Round-half-away-from-zero of a double expr -> BIGINT, in each
    engine's established idiom (Spark CAST truncates toward zero so the
    +/-0.5 shift reproduces it; DuckDB round() is half-away natively —
    the same pairing scaled_long/money oracles already rely on)."""
    if d == SPARK:
        return (
            f"CAST(CASE WHEN ({t}) >= 0.0 THEN ({t}) + 0.5 "
            f"ELSE ({t}) - 0.5 END AS BIGINT)"
        )
    return f"CAST(round({t}) AS BIGINT)"


def qscale(a: str, d: str) -> str:
    """Per-vector symmetric int8 scale: max|v| / 127 (epsilon-floored so
    zero vectors quantize to all-zero instead of dividing by zero)."""
    body = xform(a, "e", "abs(CAST(e AS DOUBLE))", d)
    mx = xmax(body, d)
    return f"(greatest({mx}, 1e-30) / 127.0)"


def quantize8(a: str, d: str) -> str:
    """Float array -> int8-range BIGINT array (q_i in [-127, 127])."""
    s = qscale(a, d)
    return xform(a, "e", _half_away(f"CAST(e AS DOUBLE) / {s}", d), d)


def qdot(a: str, b: str, d: str) -> str:
    """Exact integer dot product of two quantized arrays — BIGINT sums
    are order-independent, so no IEEE-sequencing care is needed."""
    if d == SPARK:
        return (
            f"aggregate(zip_with({a}, {b}, (p, q) -> p * q), "
            f"CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        )
    return (
        f"CAST(list_sum(list_transform(list_zip({a}, {b}), "
        f"z -> z[1] * z[2])) AS BIGINT)"
    )


def qcosine(a: str, b: str, d: str) -> str:
    """Cosine over int8-quantized vectors: integer dot and norms (exact)
    with ONE final double division — engine-identical by construction."""
    num = qdot(a, b, d)
    na = qdot(a, a, d)
    nb = qdot(b, b, d)
    zero = "0.0d" if d == SPARK else "0.0"
    return (
        f"(CAST({num} AS DOUBLE) / "
        f"nullif(sqrt(CAST({na} AS DOUBLE)) * sqrt(CAST({nb} AS DOUBLE)), {zero}))"
    )


def intdiv(num: str, den: str, d: str) -> str:
    """Integer division of non-negative BIGINTs (Spark DIV == DuckDB //)."""
    op = "DIV" if d == SPARK else "//"
    return f"(({num}) {op} ({den}))"


def blen(n: str, d: str) -> str:
    """Exact bit length of a positive BIGINT expr. ``bin()`` renders
    without leading zeros in BOTH engines (verified through BIGINT max),
    so length(bin(n)) == floor(log2(n)) + 1 for n >= 1 — a pure
    string/integer path with no floating point anywhere."""
    return f"length(bin(CAST({n} AS BIGINT)))"


def floor_log2_ratio(num: str, den: str, d: str) -> str:
    """EXACT ``floor(log2(num/den))`` for positive integer exprs, in
    pure integer arithmetic (engine-identical by construction, no
    float log anywhere — java.lang.Math.log and libm differ by ulps,
    which a floor() turns into off-by-one oracle mismatches).

    * num >= den: floor(log2 r) == floor(log2 floor(r)) (both sides
      sit in the same [2^k, 2^{k+1}) window because 2^k is an integer
      lower bound), and floor(log2 m) == blen(m) - 1.
    * num <  den: floor(log2 r) == -ceil(log2 (den/num)) (floor(-x)
      == -ceil(x)), and for s > 1, ceil(log2 s) == ceil(log2 ceil(s))
      (2^k is an integer upper bound), with ceil(log2 m) == blen(m-1)
      for integer m >= 2.

    This is the 1-bit-grain quantized log every log-scored operator
    (unigram surprisal, DSIR importance ratios) uses to stay inside
    the repo's integer-exact determinism contract.
    """
    m_ge = intdiv(num, den, d)
    m_lt = intdiv(f"({den}) + ({num}) - 1", num, d)
    return (
        f"(CASE WHEN ({num}) >= ({den}) THEN {blen(m_ge, d)} - 1 "
        f"ELSE -CAST({blen(f'{m_lt} - 1', d)} AS INT) END)"
    )
