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


def test_secondary_index_resolves_through_parent(spark):
    """M2 index-table kind (NoTTLReader.java:266-284): the derived view
    resolves by its three-part Cassandra name, carries (idx_key,
    parent_key) from the parent, and an index point lookup's filter is
    PUSHED to the parent's parquet scan with the projection pruned to
    the two index columns — the 100 TB shape: the 'index build' never
    materializes anything."""
    import pyspark.sql.functions as F

    catalog.register_tables(spark, SF_DIR, keyspace="ks",
                            tables=["events"])
    name = catalog.register_index(spark, "ks", "events",
                                  "event_type", "user_id")
    assert name == "ks.events.idx_event_type"
    idx = catalog.lookup(spark, name)
    assert idx is not None and idx.columns == ["idx_key", "parent_key"]
    looked_up = idx.filter(F.col("idx_key") == "click")
    plan = looked_up._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "event_type" in plan
    want = (catalog.lookup(spark, "ks.events")
            .filter("event_type = 'click'").count())
    assert looked_up.count() == want > 0
    # schema-only resolution works on the derived kind too
    sch = catalog.table_schema(spark, name)
    assert sch is not None and sch.fieldNames() == ["idx_key", "parent_key"]


def test_secondary_index_warn_skip_contracts(spark, caplog):
    catalog.register_tables(spark, SF_DIR, keyspace="ks",
                            tables=["events"])
    with caplog.at_level("WARNING"):
        # undeclared index on a known parent
        assert catalog.lookup(spark, "ks.events.idx_props") is None
        # unknown parent
        assert catalog.register_index(spark, "ks", "nope",
                                      "event_type", "user_id") is None
        # known parent, nonexistent indexed column
        assert catalog.register_index(spark, "ks", "events",
                                      "no_such_col", "user_id") is None
    msgs = [r.message for r in caplog.records]
    assert any("unknown table" in m for m in msgs)
    assert any("no column" in m for m in msgs)


def test_missing_fixture_skipped(spark):
    names = catalog.register_tables(
        spark, "/root/testdata/does-not-exist", keyspace="gone"
    )
    assert names == []
