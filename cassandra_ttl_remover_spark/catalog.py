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


def lookup(spark: SparkSession, qualified: str) -> DataFrame | None:
    """Resolve ``keyspace.table`` (or a bare view name) from the session
    catalog. Unknown names warn and return None — the reference's
    unknown-keyspace warn+skip contract (Cassandra2TTLRemover.java:58-61),
    so a multi-table job continues past missing tables instead of failing."""
    name = qualified.replace(".", "_")
    if not spark.catalog.tableExists(name):
        log.warning("unknown table %r — skipping (M2 warn+skip contract)", qualified)
        return None
    return spark.table(name)


def table_schema(spark: SparkSession, qualified: str) -> T.StructType | None:
    """Schema-only lookup (the reference resolves CFMetaData without reading
    data); None for unknown tables."""
    df = lookup(spark, qualified)
    return df.schema if df is not None else None
