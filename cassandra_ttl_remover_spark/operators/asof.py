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

Skew caveat: the window partitions by key only, so one key's ENTIRE
history (both sides) lands in a single task — inherent to per-key time
ordering, same as sessionization. If a single key's history outgrows task
memory at 100 TB, pre-split by coarse time bucket (windowed asof per
bucket, carry the last value of bucket N into N+1 as a seed row) before
this operator; for merely-uneven keys AQE's skew handling does not apply
to window exchanges, so size shuffle partitions for the largest key.
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

    Skew: the carry-forward window partitions by ``key`` ONLY, so one key's
    entire merged history serializes into a single task, and AQE skew
    handling does not split window exchanges. For a key whose history
    outgrows a task, pre-split by coarse time bucket and seed each bucket
    with the previous bucket's last right row (module docstring, Skew
    caveat) — the operator itself stays single-window by design.
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


def range_join(points: DataFrame, intervals: DataFrame, x_col: str,
               lo_col: str, hi_col: str, *, bin_width: int | None = None,
               broadcast_intervals: bool = True) -> DataFrame:
    """Interval/range join — the brief's other canonical custom operator:
    every point row joined to every interval row with
    ``lo_col <= x_col <= hi_col``.

    Two physical strategies:

    * ``bin_width=None`` (small interval side): plain theta-join; with
      ``broadcast_intervals`` the interval side broadcasts, so Spark runs a
      BroadcastNestedLoopJoin — each point scans the in-memory interval list,
      no shuffle of the point side. Right when intervals fit in memory.
    * ``bin_width=W`` (the 100 TB path): both sides are mapped onto integer
      bins of width W — a point to ``x div W``, an interval to EVERY bin in
      ``[lo div W, hi div W]`` (exploded) — turning the theta-join into an
      EQUI-join on the bin id (hash-partitioned, AQE-skew-splittable), with
      the exact between-predicate applied to bin-collocated candidates.
      Truncating division is monotonic (negatives included), so a matching
      point's bin always lies within its interval's bin range: no misses,
      no duplicates (each pair meets in exactly the point's bin). Choose W
      near the median interval width: cost per interval is
      O(width/W + 1) bin replicas vs candidate precision of ~W.

    Both sides may carry extra columns; all are preserved.
    """
    between = (F.col(x_col) >= F.col(lo_col)) & (F.col(x_col) <= F.col(hi_col))
    if bin_width is None:
        iv = F.broadcast(intervals) if broadcast_intervals else intervals
        return points.join(iv, between)
    pts = points.withColumn("_rj_bin", F.expr(f"`{x_col}` div {bin_width}"))
    iv = intervals.withColumn(
        "_rj_bin",
        F.explode(
            F.expr(f"sequence(`{lo_col}` div {bin_width}, `{hi_col}` div {bin_width})")
        ),
    )
    return pts.join(iv, "_rj_bin").filter(between).drop("_rj_bin")
