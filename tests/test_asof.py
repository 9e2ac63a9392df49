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
