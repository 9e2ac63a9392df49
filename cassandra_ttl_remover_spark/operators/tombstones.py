"""Tombstone operators (SURVEY.md §1.2, §2.1 T3/T4).

The reference preserves four tombstone granularities verbatim (cell, row,
range, partition — §1.2 table) and re-assembles range tombstones from paired
open/close bound markers inside the per-partition loop
(Cassandra3TTLRemover.java:124-136; Cassandra4TTLRemover.java:114-126;
Cassandra41TTLRemover.java:117-129). Unpaired bounds are dropped by the
``start != null && end != null`` guard — a documented reference quirk we
replicate (SURVEY.md §2.3.3).

Spark-first realization:
  * T3 marker pairing — a window ``lead()`` per partition key, not a stateful
    loop: each 'open' marker grabs the next marker; pairs where that next is
    a 'close' become intervals; everything else is dropped (exactly the
    reference's reset-on-emit semantics for alternating streams, and a
    deterministic superset rule for malformed ones).
  * T4 empty-partition passthrough — a union of two filtered branches
    (Cassandra3TTLRemover.java:107-111); Catalyst turns it into one pass.
  * range-tombstone application — an interval join (broadcast when the
    tombstone frame is small, which it virtually always is relative to data).

Scale: the window shuffles once on the partition key — same key as the data's
natural distribution, so at 100 TB this co-partitions with everything else
keyed by pk. The interval join broadcasts the (tiny) tombstone side.
"""

from __future__ import annotations

from typing import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.functions import broadcast


def pair_range_markers(
    markers: DataFrame,
    pk: str = "user_id",
    kind_col: str = "event_type",
    open_kind: str = "open",
    close_kind: str = "close",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """T3 — pair open/close bound markers into intervals via a window lead.

    Returns ``(pk, open_ts, close_ts)`` — one row per open marker whose
    *immediately following* marker (in clustering order) is a close.
    Unpaired bounds are dropped (SURVEY.md §2.3.3 guard,
    Cassandra3TTLRemover.java:132-134).
    """
    w = Window.partitionBy(pk).orderBy(*[F.col(c) for c in order_cols])
    m = markers.filter(F.col(kind_col).isin(open_kind, close_kind))
    m = m.withColumn("_next_kind", F.lead(kind_col).over(w)).withColumn(
        "_next_ts", F.lead(order_cols[0]).over(w)
    )
    return (
        m.filter((F.col(kind_col) == open_kind) & (F.col("_next_kind") == close_kind))
        .select(
            F.col(pk),
            F.col(order_cols[0]).alias("open_ts"),
            F.col("_next_ts").alias("close_ts"),
        )
    )


def route_empty_partitions(
    df: DataFrame,
    is_empty: F.Column,
    transform: Callable[[DataFrame], DataFrame],
) -> DataFrame:
    """T4 — conditional routing: rows/partitions matching ``is_empty`` bypass
    ``transform`` (the reference's `if (!partition.hasNext()) writer.append`
    passthrough — Cassandra3TTLRemover.java:107-111). Expressed as a union of
    two filtered branches; the common scan is shared.
    """
    passthrough = df.filter(is_empty)
    transformed = transform(df.filter(~is_empty))
    return passthrough.unionByName(transformed, allowMissingColumns=False)


def apply_range_tombstones(
    rows: DataFrame,
    tombstones: DataFrame,
    pk: str,
    clustering: str,
    writetime_col: str = "writetime",
) -> DataFrame:
    """Drop rows covered by a range tombstone: rows with
    ``pk matches AND start <= clustering <= end AND writetime <= deletion_ts``
    are invisible (partition deletion = one row with an unbounded range —
    NoTTLSSTableIdentityIterator.java:54,79-88).

    Tombstone frame schema: ``(pk, start, end, deletion_ts)``; NULL start/end
    = unbounded. The tombstone side is broadcast — deletions are tiny next to
    data, so this is a map-side anti join (no shuffle of the 100 TB side).
    """
    t = tombstones.select(
        F.col(pk).alias("_t_pk"),
        F.col("start").alias("_t_start"),
        F.col("end").alias("_t_end"),
        F.col("deletion_ts").alias("_t_del"),
    )
    cond = (
        (rows[pk] == F.col("_t_pk"))
        & (F.col("_t_start").isNull() | (rows[clustering] >= F.col("_t_start")))
        & (F.col("_t_end").isNull() | (rows[clustering] <= F.col("_t_end")))
        & (rows[writetime_col] <= F.col("_t_del"))
    )
    return rows.join(broadcast(t), on=cond, how="left_anti")
