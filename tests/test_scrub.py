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
