"""Schema-registry lookup (SURVEY.md §2.1 M2).

The reference's C2 path resolves table metadata from an on-disk schema
registry — `Schema.instance.loadFromDisk` then per-table lookup
(Cassandra2TTLRemover.java:42-52, NoTTLReader.java:266-284), warning and
skipping unknown keyspaces (Cassandra2TTLRemover.java:58-61). The Spark
analog is the session catalog: fixture tables register as temp views (on a
cluster: a metastore database), and lookups resolve `keyspace.table` names
with the same warn-and-skip contract for unknown names.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from cassandra_ttl_remover_spark.sources.scan import TABLES, scan_table

log = logging.getLogger(__name__)


def register_tables(spark: SparkSession, sf_dir: str,
                    keyspace: str = "fixtures",
                    tables: list[str] | None = None) -> list[str]:
    """Register the fixture tables as catalog views named
    ``<keyspace>_<table>`` (temp views cannot be database-qualified; the
    keyspace prefix keeps the reference's two-level naming). Returns the
    registered view names."""
    out = []
    for t in tables or TABLES:
        try:
            df = scan_table(spark, sf_dir, t)
        except Exception:  # missing fixture file — skip, like the reference
            log.warning("table %s.%s not found under %s — skipping", keyspace, t, sf_dir)
            continue
        name = f"{keyspace}_{t}"
        df.createOrReplaceTempView(name)
        out.append(name)
    return out


#: Cassandra's on-disk name separator for secondary-index tables: an index
#: SSTable's cfname is ``<parent>.<index>`` (Directories.
#: SECONDARY_INDEX_NAME_SEPARATOR), and the reader resolves its metadata
#: THROUGH the parent table (NoTTLReader.java:266-284: CFMetaData.
#: newIndexMetadata(parent, indexed column def) with a LocalPartitioner
#: over the indexed column's type). The catalog mirrors that two-level
#: resolution: an index is a DERIVED table kind, never registered from
#: data of its own.
SECONDARY_INDEX_NAME_SEPARATOR = "."


def register_index(spark: SparkSession, keyspace: str, parent: str,
                   column: str, parent_key: str) -> str | None:
    """Register a secondary-index table derived from ``parent`` — the M2
    analog of ``CFMetaData.newIndexMetadata`` (NoTTLReader.java:266-284):
    the index table's partition key is the indexed column's VALUE and its
    rows carry the parent's partition keys (Cassandra 2.x keeps one index
    entry per indexed cell — here one per parent row). Declared as a
    catalog view ``SELECT column AS idx_key, parent_key AS parent_key``,
    so at 100 TB the "index build" is a zero-shuffle projection Catalyst
    prunes to two columns, and index lookups are filters Catalyst pushes
    to the parent scan. Unknown parents (or parents missing the indexed
    column) warn and return None — the warn+skip contract
    (Cassandra2TTLRemover.java:58-61). Returns the index's qualified name
    ``keyspace.parent.idx_<column>`` on success."""
    pdf = lookup(spark, f"{keyspace}{SECONDARY_INDEX_NAME_SEPARATOR}{parent}")
    if pdf is None:
        return None
    missing = [c for c in (column, parent_key) if c not in pdf.columns]
    if missing:
        log.warning("parent %s.%s has no column(s) %s — skipping index",
                    keyspace, parent, missing)
        return None
    idx = f"idx_{column}"
    pdf.select(
        pdf[column].alias("idx_key"), pdf[parent_key].alias("parent_key")
    ).createOrReplaceTempView(f"{keyspace}_{parent}_{idx}")
    return SECONDARY_INDEX_NAME_SEPARATOR.join((keyspace, parent, idx))


def lookup(spark: SparkSession, qualified: str) -> DataFrame | None:
    """Resolve ``keyspace.table`` (or a bare view name) from the session
    catalog. Unknown names warn and return None — the reference's
    unknown-keyspace warn+skip contract (Cassandra2TTLRemover.java:58-61),
    so a multi-table job continues past missing tables instead of failing.

    Three-part names (``keyspace.parent.idx_<column>``) are secondary-index
    tables — the reference detects the separator in the cfname and resolves
    the metadata through the PARENT (NoTTLReader.java:266-284); here the
    derived view registered by :func:`register_index` resolves, and an
    index that was never declared on the parent warns and skips exactly
    like an unknown table (the reference path requires the parent to
    define the indexed column)."""
    name = qualified.replace(SECONDARY_INDEX_NAME_SEPARATOR, "_")
    if not spark.catalog.tableExists(name):
        log.warning("unknown table %r — skipping (M2 warn+skip contract)", qualified)
        return None
    return spark.table(name)


def table_schema(spark: SparkSession, qualified: str) -> T.StructType | None:
    """Schema-only lookup (the reference resolves CFMetaData without reading
    data); None for unknown tables."""
    df = lookup(spark, qualified)
    return df.schema if df is not None else None
