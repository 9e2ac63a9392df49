"""Liveness / TTL operators — the reference's core transform (SURVEY.md §1.2,
§2.1 T1/T2).

Reference semantics being reproduced:
  * expiring cell -> live cell, keeping value + write timestamp, dropping
    ttl/localExpirationTime — BufferCell.live(...) at
    Cassandra3TTLRemover.java:185,189; Cassandra4TTLRemover.java:171,175;
    Cassandra41TTLRemover.java:174,178; decode-time variant
    NoTTLColumnSerializer.java:33-39.
  * row-level (primary-key) liveness: timestamp kept, TTL -> NO_TTL —
    Cassandra3TTLRemover.java:174-176.
  * every tombstone kind preserved verbatim — cell deletions
    (NoTTLColumnSerializer.java:47-49, Cassandra2TTLRemover.java:136-137),
    row deletions (builder.addRowDeletion — Cassandra3TTLRemover.java:193),
    partition/range deletions handled in operators/tombstones.py.
  * "now" is a PARAMETER, never current_timestamp() — the reference uses
    FBUtilities.nowInSeconds() (Cassandra3TTLRemover.java:176); for oracle
    determinism we surface it explicitly (SURVEY.md §2.3.1).

Two surfaces:
  1. Flat convention (driver fixture `events` table): ttl/expires_at/
     writetime as sibling columns — what the DuckDB oracle can express.
  2. Nested cell structs (schema.cell_struct) — the full-fidelity model used
     by the e2e round-trip, including collection cells via transform()/
     transform_values() (CellPath analog, Cassandra3TTLRemover.java:180-186).

Everything here is a pure Catalyst projection/filter — no UDFs, no shuffle.
At 100 TB a strip is exactly one codegen'd scan->project->write pass, the
same shape as the reference's pipelined loop but distributed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql import types as T

#: Deterministic fixed "now" used by the declared queries (FIXTURES.md §2).
DEFAULT_NOW = 1706000000  # 2024-01-23T08:13:20Z — inside the events ts range


# ---------------------------------------------------------------------------
# Flat convention over the driver's `events` table
# ---------------------------------------------------------------------------

def annotate_events(events: DataFrame) -> DataFrame:
    """Synthesize the cell-metadata convention over the fixture `events`
    table (FIXTURES.md §2): writetime := epoch µs of ts; deterministic ttl
    (~70% of rows expiring, spread over 1..30 days); expires_at :=
    epoch_seconds(ts) + ttl.

    Deterministic + engine-portable: the same arithmetic is expressible in
    ANSI SQL for the DuckDB oracle. Pure projection (no shuffle).
    """
    wt = F.expr("unix_micros(cast(ts as timestamp))")
    ttl = F.when(
        F.col("event_id") % 10 < 7, (F.col("event_id") % 30 + 1) * 86400
    ).otherwise(F.lit(None).cast("long"))
    return (
        events.withColumn("writetime", wt)
        .withColumn("ttl", ttl.cast("long"))
        .withColumn(
            "expires_at",
            (F.expr("unix_micros(cast(ts as timestamp)) div 1000000") + F.col("ttl")).cast("long"),
        )
    )


#: SQL fragment mirroring annotate_events for the DuckDB oracle.
ANNOTATE_EVENTS_SQL = """
    SELECT e.*,
           epoch_us(ts) AS writetime,
           CASE WHEN event_id % 10 < 7 THEN (event_id % 30 + 1) * 86400 END AS ttl,
           epoch_us(ts) // 1000000
             + CASE WHEN event_id % 10 < 7 THEN (event_id % 30 + 1) * 86400 END AS expires_at
    FROM events e
"""


def live_view(df: DataFrame, now: int = DEFAULT_NOW) -> Column | DataFrame:
    """TTL-aware visibility filter: a row is live at ``now`` iff it has no
    expiry or its expiry is still in the future. This is the semantics the
    reference's round-trip test checks (SELECT after expiry returns 0 rows —
    Cassandra3TTLRemoverTest.java:136-138)."""
    return df.filter(F.col("expires_at").isNull() | (F.col("expires_at") > F.lit(now)))


def strip_ttl(df: DataFrame) -> DataFrame:
    """T1 on the flat convention: value + writetime survive; ttl/expires_at
    are cleared — after this, live_view returns every row at any ``now``
    (Cassandra3TTLRemoverTest.java:179-186)."""
    return df.withColumn("ttl", F.lit(None).cast("long")).withColumn(
        "expires_at", F.lit(None).cast("long")
    )


def cell_kind(df: DataFrame, value_col: str = "props") -> DataFrame:
    """T2 — tagged-union dispatch by cell kind (deserializeColumnBody mask
    switch, NoTTLColumnSerializer.java:24-51; atom dispatch
    NoTTLSerializer.java:23-36) as a CASE WHEN discriminator."""
    return df.withColumn(
        "kind",
        F.when(F.col("ttl").isNotNull(), F.lit("expiring"))
        .when(F.col(value_col).isNull(), F.lit("tombstone"))
        .otherwise(F.lit("live")),
    )


# ---------------------------------------------------------------------------
# Nested cell-struct model (full fidelity)
# ---------------------------------------------------------------------------

def _is_cell(dt: T.DataType) -> bool:
    return isinstance(dt, T.StructType) and {f.name for f in dt.fields} >= {
        "value",
        "writetime",
        "ttl",
        "expires_at",
    }


def _cell_cols(df: DataFrame) -> dict[str, T.DataType]:
    """Annotated value columns: cell structs, arrays of cells, maps of cells."""
    out: dict[str, T.DataType] = {}
    for f in df.schema.fields:
        dt = f.dataType
        if _is_cell(dt):
            out[f.name] = dt
        elif isinstance(dt, T.ArrayType) and _is_cell(dt.elementType):
            out[f.name] = dt
        elif isinstance(dt, T.MapType) and _is_cell(dt.valueType):
            out[f.name] = dt
    return out


def _strip_cell(c: Column) -> Column:
    """One cell: keep value/writetime/deleted_ts, null the liveness metadata
    (BufferCell.live — value + timestamp only). An absent (NULL) cell stays
    absent — F.struct over a NULL struct would otherwise materialize a
    non-NULL all-NULL cell that live_view_cells counts as surviving (bug
    found by tests/test_liveness_properties.py)."""
    return F.when(
        c.isNotNull(),
        F.struct(
            c["value"].alias("value"),
            c["writetime"].alias("writetime"),
            F.lit(None).cast("long").alias("ttl"),
            F.lit(None).cast("long").alias("expires_at"),
            c["deleted_ts"].alias("deleted_ts"),
        ),
    )


def strip_ttl_cells(df: DataFrame, now: int | None = None) -> DataFrame:
    """T1 full model: strip TTL from every cell, including collection cells
    via transform()/transform_values() (CellPath branch,
    Cassandra3TTLRemover.java:180-186); reset row-level liveness TTL keeping
    its timestamp (LivenessInfo.NO_TTL — Cassandra3TTLRemover.java:174-176);
    preserve cell/row tombstones untouched (§1.2).

    Pure nested projection; Catalyst fuses it into the scan. ``now`` is
    accepted for signature parity (the reference resets localDeletionTime to
    now; our model has no residual use for it after the strip).
    """
    for name, dt in _cell_cols(df).items():
        col = F.col(name)
        if isinstance(dt, T.ArrayType):
            df = df.withColumn(name, F.transform(col, _strip_cell))
        elif isinstance(dt, T.MapType):
            df = df.withColumn(name, F.transform_values(col, lambda _, v: _strip_cell(v)))
        else:
            df = df.withColumn(name, _strip_cell(col))
    if "pk_ttl" in df.columns:
        df = df.withColumn("pk_ttl", F.lit(None).cast("long"))
    if "pk_expires_at" in df.columns:
        df = df.withColumn("pk_expires_at", F.lit(None).cast("long"))
    return df


def _live_cell(c: Column, now: int, row_del: Column | None = None) -> Column:
    """Cell visibility at ``now``: not cell-deleted, not expired, and newer
    than any covering row tombstone (timestamp precedence — on equal
    timestamps the delete wins, Cassandra reconciliation). Returns the cell
    or NULL (an unreadable cell behaves like an absent one)."""
    alive = (
        c["deleted_ts"].isNull()
        & (c["expires_at"].isNull() | (c["expires_at"] > F.lit(now)))
    )
    if row_del is not None:
        alive = alive & (row_del.isNull() | (c["writetime"] > row_del))
    return F.when(alive, c)


def live_view_cells(df: DataFrame, now: int = DEFAULT_NOW) -> DataFrame:
    """Readable view of an annotated table at time ``now``:

      * cells that are deleted or expired read as NULL;
      * rows whose row tombstone dominates (deleted_ts >= every surviving
        cell writetime and >= pk liveness) disappear;
      * rows with no live primary-key liveness and no surviving cells
      	disappear (Cassandra row-liveness semantics).

    Implemented as projections + one filter — no shuffle, pushdown-friendly.
    """
    cells = _cell_cols(df)
    row_del = F.col("row_deletion_ts") if "row_deletion_ts" in df.columns else None
    for name, dt in cells.items():
        col = F.col(name)
        if isinstance(dt, T.ArrayType):
            df = df.withColumn(
                name, F.filter(col, lambda c: _live_cell(c, now, row_del).isNotNull())
            )
        elif isinstance(dt, T.MapType):
            df = df.withColumn(
                name,
                F.map_filter(col, lambda _, v: _live_cell(v, now, row_del).isNotNull()),
            )
        else:
            df = df.withColumn(name, _live_cell(col, now, row_del))

    # row-level liveness: pk liveness not expired...
    pk_live = F.lit(False)
    if "pk_writetime" in df.columns:
        pk_live = F.col("pk_writetime").isNotNull() & (
            F.col("pk_expires_at").isNull() | (F.col("pk_expires_at") > F.lit(now))
        )
        if "row_deletion_ts" in df.columns:
            pk_live = pk_live & (
                F.col("row_deletion_ts").isNull()
                | (F.col("row_deletion_ts") < F.col("pk_writetime"))
            )
    # ... or any cell survives the row tombstone
    any_cell = F.lit(False)
    for name, dt in cells.items():
        col = F.col(name)
        if isinstance(dt, T.ArrayType):
            has = F.size(col) > 0
            newest = F.array_max(F.transform(col, lambda c: c["writetime"]))
        elif isinstance(dt, T.MapType):
            vals = F.map_values(col)
            has = F.size(vals) > 0
            newest = F.array_max(F.transform(vals, lambda c: c["writetime"]))
        else:
            has = col.isNotNull()
            newest = col["writetime"]
        survives = has
        if "row_deletion_ts" in df.columns:
            survives = has & (
                F.col("row_deletion_ts").isNull()
                | (newest > F.col("row_deletion_ts"))
            )
        any_cell = any_cell | F.coalesce(survives, F.lit(False))
    return df.filter(pk_live | any_cell)
