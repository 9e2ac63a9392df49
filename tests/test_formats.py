"""Tests for the non-parquet source formats (CSV/JSON, declared schemas)."""

import pyspark.sql.functions as F

from cassandra_ttl_remover_spark.sources.scan import (
    roundtrip_table,
    scan_csv,
    scan_json,
)

SF = "/root/testdata/sf0.001"


def test_csv_roundtrip_lossless(spark, documents, tmp_path):
    got = roundtrip_table(spark, SF, "documents", "csv", str(tmp_path / "c"))
    assert got.schema == documents.schema
    assert got.exceptAll(documents).count() == 0
    assert documents.exceptAll(got).count() == 0


def test_json_roundtrip_lossless(spark, documents, tmp_path):
    got = roundtrip_table(spark, SF, "documents", "json", str(tmp_path / "j"))
    assert got.exceptAll(documents).count() == 0
    assert documents.exceptAll(got).count() == 0


def test_csv_quoted_newlines_and_commas(spark, tmp_path):
    src = spark.createDataFrame(
        [(1, 'line one\nline two'), (2, 'a,b,"c"')], "id long, text string"
    )
    out = str(tmp_path / "tricky")
    src.write.option("header", "true").option("escape", '"').csv(out)
    got = scan_csv(spark, out, src.schema)
    assert {r.text for r in got.collect()} == {'line one\nline two', 'a,b,"c"'}


def test_json_declared_schema_prunes_and_types(spark, tmp_path):
    out = str(tmp_path / "js")
    spark.createDataFrame(
        [(1, "x", 99)], "id long, text string, extra long"
    ).write.json(out)
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("text", T.StringType())]
    )
    got = scan_json(spark, out, schema)
    assert got.columns == ["id", "text"]
    assert got.first().id == 1


def test_orc_roundtrip_with_timestamps(spark, events, tmp_path):
    # ORC carries timestamps natively — the roundtrip must preserve events.ts
    # to the microsecond, which CSV/JSON cannot promise
    got = roundtrip_table(spark, SF, "events", "orc", str(tmp_path / "o"))
    a = events.select("event_id", F.expr("unix_micros(cast(ts as timestamp))").alias("us"))
    b = got.select("event_id", F.expr("unix_micros(cast(ts as timestamp))").alias("us"))
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_merge_schema_unions_by_name(spark, documents, tmp_path):
    """Schema evolution on read: an old snapshot missing columns surfaces
    them as NULL under merge_schema; without it the scan sees only the
    first footer's columns."""
    from cassandra_ttl_remover_spark.sources.scan import scan

    root = tmp_path / "evo"
    documents.limit(10).select("doc_id", "text").write.parquet(str(root / "v1"))
    documents.filter("doc_id >= 10").limit(10) \
        .select("doc_id", "text", "lang").write.parquet(str(root / "v2"))
    m = scan(spark, str(root), merge_schema=True)
    assert set(m.columns) == {"doc_id", "text", "lang"}
    assert m.count() == 20
    assert m.filter("lang IS NULL").count() == 10
    assert m.filter("lang IS NOT NULL").count() == 10


def test_text_lines_roundtrip_lossless(spark, documents, tmp_path):
    from cassandra_ttl_remover_spark.sources.scan import text_lines_roundtrip

    got = text_lines_roundtrip(spark, SF, str(tmp_path / "t"))
    assert got.count() == documents.count()
    a = documents.select("doc_id", "text", "lang", "source", "n_chars")
    assert a.exceptAll(got.select(*a.columns)).count() == 0
    assert got.select(*a.columns).exceptAll(a).count() == 0
