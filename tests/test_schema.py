"""CQL DDL -> StructType (SURVEY.md §2.1 M1, §1.3)."""

import pytest
from pyspark.sql import types as T

from cassandra_ttl_remover_spark.schema import (
    CqlParseError,
    annotated_schema,
    cell_struct,
    cql_to_struct_type,
    parse_cql_create_table,
)

REF_CQL = (
    "CREATE TABLE test.test (id uuid, name text, surname text, PRIMARY KEY (id)) "
    "WITH default_time_to_live = 10"
)


def test_reference_table():
    # the reference's only test table (cassandra-3 .../cql/table.cql:1)
    t = parse_cql_create_table(REF_CQL)
    assert t.keyspace == "test" and t.name == "test"
    assert t.partition_keys == ["id"] and t.clustering_keys == []
    assert [f.name for f in t.schema.fields] == ["id", "name", "surname"]
    assert all(isinstance(f.dataType, T.StringType) for f in t.schema.fields)
    assert t.options["default_time_to_live"] == "10"


def test_composite_key_and_collections():
    t = parse_cql_create_table(
        "CREATE TABLE ks.t (pk1 uuid, pk2 int, ck timestamp, "
        "m map<text, frozen<list<int>>>, s set<text>, tup tuple<int, text>, "
        "PRIMARY KEY ((pk1, pk2), ck))"
    )
    assert t.partition_keys == ["pk1", "pk2"]
    assert t.clustering_keys == ["ck"]
    m = dict(zip([f.name for f in t.schema.fields], [f.dataType for f in t.schema.fields]))
    assert m["m"] == T.MapType(T.StringType(), T.ArrayType(T.IntegerType()))
    assert m["s"] == T.ArrayType(T.StringType())
    assert isinstance(m["tup"], T.StructType)
    assert isinstance(m["ck"], T.TimestampNTZType)


def test_type_universe():
    s = cql_to_struct_type(
        "CREATE TABLE t (a bigint PRIMARY KEY, b double, c boolean, d blob, "
        "e decimal, f counter, g inet, h date)"
    )
    types = {f.name: f.dataType for f in s.fields}
    assert types["a"] == T.LongType()
    assert types["d"] == T.BinaryType()
    assert types["f"] == T.LongType()  # counters are long cells


@pytest.mark.parametrize("bad", [
    "DROP TABLE x",
    "CREATE TABLE t (x unknown_type)",
    "",
    "CREATE TABLE t ()",
])
def test_rejects_bad_ddl(bad):
    with pytest.raises((CqlParseError, ValueError)):
        parse_cql_create_table(bad)


def test_annotated_schema_shape():
    t = parse_cql_create_table(REF_CQL)
    ann = annotated_schema(t)
    names = [f.name for f in ann.fields]
    assert names[:3] == ["id", "name", "surname"]
    assert {"pk_writetime", "pk_ttl", "pk_expires_at", "row_deletion_ts"} <= set(names)
    name_t = ann["name"].dataType
    assert name_t == cell_struct(T.StringType())
    assert {f.name for f in name_t.fields} == {
        "value", "writetime", "ttl", "expires_at", "deleted_ts"
    }


def test_scan_ignore_corrupt_quarantine(spark, tmp_path):
    """Corrupt-input quarantine (NoTTLReader.java:436-452 analog): with
    ignore_corrupt the job skips the bad file; without, it fails."""
    import pytest
    from cassandra_ttl_remover_spark import scan

    good = spark.range(0, 10).toDF("id")
    good.coalesce(1).write.parquet(str(tmp_path / "data"))
    (tmp_path / "data" / "part-corrupt.parquet").write_bytes(b"PAR1 this is not parquet")

    ok = scan(spark, str(tmp_path / "data"), ignore_corrupt=True)
    assert ok.count() == 10
    with pytest.raises(Exception):
        scan(spark, str(tmp_path / "data")).count()


def test_scan_quarantine_short_file_inference_fallback(spark, tmp_path):
    """A sub-footer-size file breaks Spark's schema inference even under
    ignoreCorruptFiles; scan's fallback pins the schema from the first
    readable footer."""
    from cassandra_ttl_remover_spark import scan

    spark.range(0, 5).toDF("id").coalesce(1).write.parquet(str(tmp_path / "d"))
    (tmp_path / "d" / "tiny.parquet").write_bytes(b"garbage")
    assert scan(spark, str(tmp_path / "d"), ignore_corrupt=True).count() == 5
