"""As-of (point-in-time) join — a custom operator Spark SQL lacks natively
(the brief's canonical example): for every left row, attach the latest right
row with ``right.ts <= left.ts`` per key.

Spark-first realization (the scalable shape, NOT a range cross-join):
union both sides into one frame, one hash shuffle on the key, one
per-partition sort by (ts, side), then a running ``last(value,
ignorenulls=True)`` window carries each right value forward to the left
rows that follow it. Cost: one shuffle + one sort — identical asymptotics
to a sort-merge join, versus the O(candidates²) of an interval cross-join.
Right side must be unique per (key, ts) for deterministic results
(pre-aggregate if not).

The semantics are exactly DuckDB's ``ASOF LEFT JOIN ... ON l.key = r.key
AND l.ts >= r.ts`` — which is the oracle used to verify it.

NULL caveat: a right row whose value column is genuinely NULL is
indistinguishable from "no row yet" to the ignorenulls carry; emit a
sentinel or pre-coalesce if NULL right values are meaningful.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(left: DataFrame, right: DataFrame, key: str,
              ts: str, value_cols: list[str] | None = None) -> DataFrame:
    """Left as-of join: every column of ``left`` plus, for each of
    ``value_cols`` from ``right``, the value of the latest right row with
    ``right.ts <= left.ts`` for the same key (NULL if none yet).

    Both sides must carry ``key`` and ``ts`` (same names/types);
    ``value_cols`` defaults to right's non-key, non-ts columns.
    """
    value_cols = value_cols or [c for c in right.columns if c not in (key, ts)]
    overlap = set(value_cols) & set(left.columns)
    if overlap:
        raise ValueError(f"value_cols collide with left columns: {sorted(overlap)}")

    l = left.withColumn("_side", F.lit(1))
    for c in value_cols:
        l = l.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
    r = right.select(key, ts, *value_cols).withColumn("_side", F.lit(0))
    for c in left.columns:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))

    u = l.unionByName(r.select(*l.columns))
    # right rows (side 0) sort before left rows at equal ts -> "<=" semantics
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in value_cols:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return u.filter(F.col("_side") == 1).drop("_side")
