"""Regression for the r7 ADVICE finding: documents whose space-split
tokens contain an embedded newline must re-line identically on Spark
and the DuckDB oracle.  The 10-token re-lining in ``dedup_lines`` /
``curation_pipeline_v2`` joins lines with '\\n' and the operator
re-splits on '\\n'; before the fix a token like ``"e\\nf"`` fragmented
the Spark-side line into two fingerprint units while the oracle's
``lines`` CTE fingerprinted the 10-token line whole.  Both engines now
scrub newlines inside the re-lining expression, so the compare below is
exact (rows, columns, values) on a corpus the shared fixtures never
cover — one with newline-bearing tokens."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from dagster_etl_spark.registry import all_queries


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def _uniq(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i:02d}" for i in range(n))


@pytest.fixture()
def newline_sf_dir(tmp_path):
    # 11 words packed into 10 space-split tokens via one glued
    # "a\nb" token — at a DIFFERENT position per doc, so the two first
    # lines only match after the re-lining scrubs the newline.
    full = " ".join(f"common{i}" for i in range(11))
    d1_first = full.replace("common0 common1", "common0\ncommon1")
    d2_first = full.replace("common4 common5", "common4\ncommon5")
    texts = {
        1: d1_first + " " + _uniq("alpha", 40),
        2: d2_first + " " + _uniq("bravo", 40),
        3: _uniq("charlie", 40) + " midtok\nnewline " + _uniq("delta", 40),
        4: _uniq("echo", 45),
        5: _uniq("echo", 45),  # near-dup of 4 for the clustering stage
    }
    pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": list(texts.values()),
            "lang": ["en"] * len(texts),
            "source": [f"https://s{i}.example/x" for i in texts],
            "n_chars": [len(t) for t in texts.values()],
        }
    ).to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


@pytest.mark.parametrize("name", ["dedup_lines", "curation_pipeline_v2"])
def test_relining_matches_oracle_with_embedded_newlines(
    spark, newline_sf_dir, name
):
    spec = all_queries()[name]
    got = _normalize(spec.fn(spark, newline_sf_dir).toPandas())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{newline_sf_dir}/documents.parquet'"
    )
    want = _normalize(con.execute(spec.oracle).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) > 0  # the fixture must actually flow through


def test_dedup_lines_drops_newline_bearing_boilerplate(spark, newline_sf_dir):
    """The scrubbed re-lining must recognize doc 2's newline-bearing
    variant of the shared line as the SAME boilerplate fingerprint."""
    spec = all_queries()["dedup_lines"]
    out = {
        r["doc_id"]: r
        for r in spec.fn(spark, newline_sf_dir).collect()
    }
    assert out[1]["n_dropped"] == 1 and out[2]["n_dropped"] == 1
    assert "common0" not in out[1]["text"]
    assert "common4" not in out[2]["text"]
