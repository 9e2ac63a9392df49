"""M2 schema-registry lookup (SURVEY.md §2.1): register + resolve + the
warn-and-skip contract for unknown keyspaces
(Cassandra2TTLRemover.java:58-61)."""

from cassandra_ttl_remover_spark import catalog
from tests.conftest import SF_DIR


def test_register_and_lookup(spark):
    names = catalog.register_tables(spark, SF_DIR, keyspace="ks")
    assert "ks_events" in names and "ks_lineitem" in names
    df = catalog.lookup(spark, "ks.events")
    assert df is not None and df.count() > 0
    sch = catalog.table_schema(spark, "ks.events")
    assert sch is not None and "event_id" in sch.fieldNames()


def test_unknown_table_warns_and_skips(spark, caplog):
    catalog.register_tables(spark, SF_DIR, keyspace="ks")
    with caplog.at_level("WARNING"):
        assert catalog.lookup(spark, "nope.nothing") is None
    assert any("unknown table" in r.message for r in caplog.records)


def test_missing_fixture_skipped(spark):
    names = catalog.register_tables(
        spark, "/root/testdata/does-not-exist", keyspace="gone"
    )
    assert names == []
