"""Scrubbing tests: PII redaction on realistic strings (the fixture
corpus has no PII, so the registered query alone can't prove the
patterns) and decontamination behavior."""

from __future__ import annotations

from pyspark.sql import Row


def test_redact_pii_patterns(spark):
    from dagster_etl_spark.operators.scrub import redact_pii

    rows = [
        Row(doc_id=1, text="contact me at john.doe+spam@example.co.uk please"),
        Row(doc_id=2, text="call +1 (555) 123-4567 tomorrow"),
        Row(doc_id=3, text="see https://example.com/path?q=1 for details"),
        Row(doc_id=4, text="ssn is 123-45-6789 do not share"),
        Row(doc_id=5, text="nothing sensitive here at all"),
    ]
    out = {r.doc_id: r.clean_text for r in redact_pii(spark.createDataFrame(rows)).collect()}
    assert out[1] == "contact me at <EMAIL> please"
    assert out[2] == "call <PHONE> tomorrow"
    assert out[3] == "see <URL> for details"
    assert out[4] == "ssn is <SSN> do not share"
    assert out[5] == "nothing sensitive here at all"


def test_decontaminate_removes_overlapping_docs(spark):
    from dagster_etl_spark.operators.scrub import contaminated_ids, decontaminate

    base = "one two three four five six seven eight nine ten eleven twelve thirteen"
    rows = [
        Row(doc_id=1, text=f"prefix {base} suffix"),      # shares the 13-gram
        Row(doc_id=2, text=base),                          # the benchmark doc itself
        Row(doc_id=3, text="totally unrelated words that never collide with anything"),
        Row(doc_id=4, text="one two three short"),         # < 13 tokens of overlap
    ]
    corpus = spark.createDataFrame(rows)
    bench = spark.createDataFrame([Row(doc_id=99, text=base)])

    bad = sorted(r.doc_id for r in contaminated_ids(corpus, bench).collect())
    assert bad == [1, 2]
    kept = sorted(r.doc_id for r in decontaminate(corpus, bench).collect())
    assert kept == [3, 4]


def test_phone_redaction_is_bounded(spark):
    """The PHONE pattern must not collapse long runs of space-separated
    numbers (tables, year lists) into a single token: separators are
    limited to 2 chars per digit and 15 digits total per match."""
    from pyspark.sql import Row

    from dagster_etl_spark.operators.scrub import redact_pii

    long_run = " ".join(str(1000 + i) for i in range(12))  # 48 digits
    rows = [Row(doc_id=1, text=f"yearly totals: {long_run} end")]
    (out,) = redact_pii(spark.createDataFrame(rows)).collect()
    # the run may be partially redacted (phone-shaped windows) but must
    # not become one giant token: the tail of the run survives
    assert out.clean_text.endswith("end")
    assert len(out.clean_text.split("<PHONE>")) >= 3 or "<PHONE>" not in out.clean_text
    # short id sequences (< 7 digits) never match
    (out2,) = redact_pii(
        spark.createDataFrame([Row(doc_id=2, text="ref 12 34 56")])
    ).collect()
    assert out2.clean_text == "ref 12 34 56"


def test_contamination_score_grades_overlap(spark):
    """Graded decontamination: per-doc fraction of distinct 13-gram
    hashes shared with the benchmark. Pinned fixture: the benchmark
    doc scores 1.0, a doc sharing exactly one of its grams scores the
    right fraction, disjoint and too-short docs score 0 (with a row)."""
    from dagster_etl_spark.operators.scrub import (
        contaminated_ids,
        contamination_score,
    )

    base = "one two three four five six seven eight nine ten eleven twelve thirteen"
    rows = [
        Row(doc_id=1, text=f"prefix {base} suffix"),  # 3 grams, all hit
        Row(doc_id=2, text=base),                     # 1 gram, hit: ratio 1.0
        Row(doc_id=3, text="totally unrelated words that never collide "
                           "with anything else in this corpus at all ok"),
        Row(doc_id=4, text="one two three short"),    # < 13 tokens: 0 grams
    ]
    corpus = spark.createDataFrame(rows)
    bench = spark.createDataFrame([Row(doc_id=99, text=base)])
    got = {r.doc_id: r for r in contamination_score(corpus, bench).collect()}
    assert set(got) == {1, 2, 3, 4}, "every corpus doc must get a row"
    assert got[2].n_grams == 1 and got[2].n_hit == 1
    assert got[2].overlap_ratio == 1.0
    assert got[1].n_grams == 3 and got[1].n_hit == 1  # only the full base gram
    assert got[1].overlap_ratio == 1.0 / 3.0
    assert got[3].n_hit == 0 and got[3].overlap_ratio == 0.0
    assert got[4].n_grams == 0 and got[4].overlap_ratio == 0.0

    # consistency with the binary rule: score > 0 <=> contaminated
    binary = {r.doc_id for r in contaminated_ids(corpus, bench).collect()}
    graded = {d for d, r in got.items() if r.overlap_ratio > 0}
    assert graded == binary


def test_bloom_decontaminate_gate_bounds(spark):
    """The bloom path may over-remove (false positives) but NEVER
    under-remove; the gate's booleans assert both bounds in-query on
    the real fixture."""
    from dagster_etl_spark.operators.scrub import bloom_decontaminate_gate
    from dagster_etl_spark.sources.fixtures import load_table
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    bench = docs.filter("doc_id % 17 = 0")
    row = bloom_decontaminate_gate(docs, bench).collect()[0]
    assert row.superset_ok, "bloom filter produced a false NEGATIVE"
    assert row.fp_excess_ok, "bloom over-removal above the 1% bound"
    assert row.n_bloom_removed >= row.n_exact_removed
    assert row.n_exact_removed > 0, "fixture benchmark slice found nothing"


def test_bloom_probe_plan_has_no_corpus_shuffle(spark):
    """The bloom path's entire point: the corpus-gram membership probe
    must plan as broadcast joins only — zero hash-partitioning
    exchanges (the exact semi-join's broadcast relation is the full
    gram set; the bloom word table is a few MB regardless of benchmark
    size). Also: the bloom member set must contain every true member
    (no false negatives, structural)."""
    from dagster_etl_spark.operators.scrub import _bloom_member, _bloom_words, _grams
    from dagster_etl_spark.sources.bucketed import exchanges_in_plan
    from dagster_etl_spark.sources.fixtures import load_table
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    bench = docs.filter("doc_id % 17 = 0")
    corpus_grams = _grams(docs, "text", "doc_id", 13, distinct=False)
    bench_grams = _grams(bench, "text", None, 13)
    words = _bloom_words(bench_grams, 4_000_000)
    member = _bloom_member(corpus_grams, words, 4_000_000, "doc_id")
    # the word-table BUILD legitimately aggregates (bench side, inside
    # the broadcast subtree, duplicated once per probe join); the
    # corpus stream side must contribute ZERO additional exchanges
    w_ex = exchanges_in_plan(words)
    n_ex = exchanges_in_plan(member)
    from dagster_etl_spark.operators.scrub import _BLOOM_K

    assert n_ex <= _BLOOM_K * w_ex, (
        f"bloom probe shuffles the corpus grams: {n_ex} exchanges vs "
        f"{w_ex} per word build x {_BLOOM_K} probes"
    )
    plan = member._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, "probe fell back to a shuffle join"

    got = {(r.doc_id, r.gh) for r in member.collect()}
    truth = {
        (r.doc_id, r.gh)
        for r in corpus_grams.join(
            bench_grams.withColumnRenamed("gh", "gh").distinct(), on="gh", how="left_semi"
        ).collect()
    }
    assert truth <= got, "bloom produced a false negative"


def test_bloom_decontaminate_production_path(spark):
    """The bloom-ONLY path (no exact twin in the plan — the 100 TB
    shape): its removed-id set must be a superset of the exact rule's
    (no false negatives) and its survivors a subset of the exact
    survivors, with over-removal inside the gate's 1% ceiling."""
    from dagster_etl_spark.operators.scrub import (
        bloom_contaminated_ids,
        bloom_decontaminate,
        contaminated_ids,
    )
    from dagster_etl_spark.sources.fixtures import load_table
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    bench = docs.filter("doc_id % 17 = 0")
    bloom_ids = {r.doc_id for r in bloom_contaminated_ids(docs, bench).collect()}
    exact_ids = {r.doc_id for r in contaminated_ids(docs, bench).collect()}
    assert exact_ids, "fixture benchmark slice found nothing"
    assert exact_ids <= bloom_ids, "production bloom path under-removed"
    n_docs = docs.count()
    # same strict bound as the registered gate's fp_excess_ok flag
    # (scrub.py bloom_decontaminate_gate: _fp_excess < GREATEST(1,
    # integer-ceil(n/100))) — r13 ADVICE: the earlier "+ 1" slack could
    # stay green on a run where the gate itself flips false
    assert len(bloom_ids - exact_ids) < max(1, -(-n_docs // 100))

    survivors = {r.doc_id for r in bloom_decontaminate(docs, bench).collect()}
    assert survivors == {r.doc_id for r in docs.collect()} - bloom_ids
