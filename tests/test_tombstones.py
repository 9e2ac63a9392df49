"""T3 marker pairing + T4 routing + range-tombstone application
(SURVEY.md §1.2, §2.1 T3/T4, §2.3.3)."""

import pyspark.sql.functions as F

from cassandra_ttl_remover_spark.operators.tombstones import (
    apply_range_tombstones,
    pair_range_markers,
    route_empty_partitions,
)


def _markers(spark, rows):
    return spark.createDataFrame(rows, "user_id int, ts int, event_id int, event_type string")


def test_pairing_alternating(spark):
    m = _markers(spark, [(1, 10, 1, "open"), (1, 20, 2, "close"),
                         (1, 30, 3, "open"), (1, 40, 4, "close")])
    got = [(r.user_id, r.open_ts, r.close_ts) for r in
           pair_range_markers(m).orderBy("open_ts").collect()]
    assert got == [(1, 10, 20), (1, 30, 40)]


def test_unpaired_bounds_dropped(spark):
    # §2.3.3: markers without a partner are silently lost (reference quirk)
    m = _markers(spark, [(1, 10, 1, "open"),                       # trailing open
                         (2, 5, 2, "close"),                       # leading close
                         (3, 1, 3, "open"), (3, 2, 4, "open"), (3, 3, 5, "close")])
    got = [(r.user_id, r.open_ts, r.close_ts) for r in
           pair_range_markers(m).orderBy("user_id").collect()]
    assert got == [(3, 2, 3)]


def test_non_marker_kinds_ignored(spark):
    m = _markers(spark, [(1, 10, 1, "open"), (1, 15, 2, "noise"), (1, 20, 3, "close")])
    # 'noise' is filtered before pairing, so open still meets close
    got = [(r.open_ts, r.close_ts) for r in pair_range_markers(m).collect()]
    assert got == [(10, 20)]


def test_route_empty_partitions(spark):
    df = spark.createDataFrame(
        [(1, 0, "keep"), (2, 5, "xform"), (3, 0, "keep2")], "pk int, n int, tag string"
    )
    out = route_empty_partitions(
        df, F.col("n") == 0, lambda d: d.withColumn("tag", F.upper("tag"))
    )
    got = {r.pk: r.tag for r in out.collect()}
    # empty partitions pass through untouched; others transformed
    assert got == {1: "keep", 2: "XFORM", 3: "keep2"}


def test_range_tombstone_timestamp_precedence(spark):
    rows = spark.createDataFrame(
        [(1, 5, 100), (1, 15, 100), (1, 15, 300), (2, 15, 100)],
        "pk int, ck int, writetime long",
    )
    ts = spark.createDataFrame([(1, 10, 20, 200)], "pk int, start int, end int, deletion_ts long")
    vis = sorted((r.pk, r.ck, r.writetime) for r in
                 apply_range_tombstones(rows, ts, "pk", "ck").collect())
    # (1,15,100) covered & older -> gone; (1,15,300) newer -> survives
    assert vis == [(1, 5, 100), (1, 15, 300), (2, 15, 100)]


def test_partition_deletion_unbounded_range(spark):
    rows = spark.createDataFrame([(1, 5, 100), (1, 99, 100), (2, 5, 100)],
                                 "pk int, ck int, writetime long")
    # NULL start/end = whole-partition tombstone (NoTTLSSTableIdentityIterator.java:54)
    ts = spark.createDataFrame([(1, None, None, 200)],
                               "pk int, start int, end int, deletion_ts long")
    vis = sorted((r.pk, r.ck) for r in apply_range_tombstones(rows, ts, "pk", "ck").collect())
    assert vis == [(2, 5)]
