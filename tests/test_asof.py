"""As-of join (operators/asof.py): <= tie semantics, carry-forward, no-match
NULLs — checked against hand-computed expectations."""

import pytest

from cassandra_ttl_remover_spark.operators.asof import asof_join


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [(1, 100, 5), (1, 100, 10), (1, 100, 20), (1, 100, 25),
         (2, 200, 7), (3, 300, 50)],
        "id bigint, user bigint, ts bigint",
    ).selectExpr("monotonically_increasing_id() as rid", "user as k", "ts")
    left = spark.createDataFrame(
        [(0, 1, 5), (1, 1, 10), (2, 1, 20), (3, 1, 25), (4, 2, 7), (5, 3, 50)],
        "rid bigint, k bigint, ts bigint",
    )
    right = spark.createDataFrame(
        [(1, 10, 100), (1, 21, 210), (2, 8, 800)],
        "k bigint, ts bigint, v bigint",
    )
    got = {r.rid: r.v for r in asof_join(left, right, key="k", ts="ts").collect()}
    assert got == {
        0: None,   # before any right row
        1: 100,    # equal ts -> right row counts (<=)
        2: 100,    # carried forward past ts=10
        3: 210,    # newer right row at 21 wins
        4: None,   # right row at ts=8 is after left ts=7
        5: None,   # key with no right rows at all
    }


def test_asof_rejects_column_collision(spark):
    left = spark.createDataFrame([(1, 1, 1)], "k bigint, ts bigint, v bigint")
    right = spark.createDataFrame([(1, 1, 2)], "k bigint, ts bigint, v bigint")
    with pytest.raises(ValueError):
        asof_join(left, right, key="k", ts="ts")


def test_range_join_bucketed_equals_naive(spark, events):
    from cassandra_ttl_remover_spark.operators.asof import range_join
    from cassandra_ttl_remover_spark.plans import formatted_plan

    iv = spark.createDataFrame(
        [(k, k * 10, k * 10 + 14) for k in range(25)],
        "ikey long, lo long, hi long",
    )
    pts = events.select("event_id", "user_id")
    naive = range_join(pts, iv, "user_id", "lo", "hi")
    binned = range_join(pts, iv, "user_id", "lo", "hi", bin_width=16)
    a = {(r.event_id, r.ikey) for r in naive.collect()}
    b = {(r.event_id, r.ikey) for r in binned.collect()}
    assert a == b and a, "bucketed strategy must find exactly the naive pairs"
    # the bucketed path must be an equi-join, not a nested loop
    assert "BroadcastNestedLoopJoin" not in formatted_plan(binned)


def test_range_join_negative_domain(spark):
    from cassandra_ttl_remover_spark.operators.asof import range_join

    pts = spark.createDataFrame([(i, x) for i, x in enumerate(range(-25, 26, 5))],
                                "pid long, x long")
    iv = spark.createDataFrame([(0, -22, -8), (1, -3, 4), (2, 7, 40)],
                               "ikey long, lo long, hi long")
    naive = {(r.pid, r.ikey) for r in
             range_join(pts, iv, "x", "lo", "hi").collect()}
    binned = {(r.pid, r.ikey) for r in
              range_join(pts, iv, "x", "lo", "hi", bin_width=10).collect()}
    assert naive == binned and naive
