"""File-format source tests: CSV/JSONL/ORC roundtrips under a declared
schema contract, and corrupt-record quarantine accounting."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def orders(spark):
    from dagster_etl_spark.sources.fixtures import load_table

    return load_table(spark, SF_SMALL, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"
    )


def _rows(df):
    return {
        (r.o_orderkey, r.o_custkey, r.o_orderpriority, round(r.o_totalprice, 2))
        for r in df.collect()
    }


def test_csv_json_orc_roundtrip(spark, orders, tmp_path):
    from dagster_etl_spark.sources.files import (
        read_csv,
        read_jsonl,
        read_orc,
        write_format,
    )

    expected = _rows(orders)
    schema = orders.schema

    write_format(orders, str(tmp_path / "csv"), "csv")
    assert _rows(read_csv(spark, str(tmp_path / "csv"), schema)) == expected

    write_format(orders, str(tmp_path / "json"), "json")
    assert _rows(read_jsonl(spark, str(tmp_path / "json"), schema)) == expected

    write_format(orders, str(tmp_path / "orc"), "orc")
    assert _rows(read_orc(spark, str(tmp_path / "orc"))) == expected


def test_read_with_rejects_quarantines_corrupt_lines(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from dagster_etl_spark.sources.files import read_with_rejects

    p = tmp_path / "feed.jsonl"
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        "this is not json at all\n"
        '{"id": 2, "name": "also ok"}\n'
        '{"id": broken\n'
    )
    schema = StructType(
        [StructField("id", LongType()), StructField("name", StringType())]
    )
    good, bad = read_with_rejects(spark, str(p), schema, fmt="json")
    assert {(r.id, r.name) for r in good.collect()} == {(1, "ok"), (2, "also ok")}
    rejects = [r._corrupt_record for r in bad.collect()]
    assert len(rejects) == 2
    assert "not json" in rejects[0] or "not json" in rejects[1]
