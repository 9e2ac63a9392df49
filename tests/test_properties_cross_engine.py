"""Property-based cross-engine checks (hypothesis): the portable primitives
the oracles depend on must agree between Spark and DuckDB on RANDOM inputs,
not just the fixture values the declared queries happen to touch."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cassandra_ttl_remover_spark.operators.lookups import (
    PORTABLE_TOKEN_EXPR,
    murmur3_hash_oracle_expr,
    portable_token_oracle_expr,
)

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)

_SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(st.lists(I64, min_size=1, max_size=64, unique=True))
@_SETTINGS
def test_murmur3_oracle_matches_spark_hash_on_random_longs(spark, xs):
    sdf = spark.createDataFrame([(v,) for v in xs], "x long")
    expected = {r.x: r.h for r in sdf.select("x", F.hash("x").alias("h")).collect()}
    con = duckdb.connect()
    e = murmur3_hash_oracle_expr("x")
    # route through HUGEINT: the BIGINT literal -2^63 overflows before the
    # unary minus applies
    vals = ", ".join(f"(({v})::HUGEINT::BIGINT)" for v in xs)
    for x, hu in con.sql(f"SELECT x, {e} FROM (VALUES {vals}) t(x)").fetchall():
        h = hu - (1 << 32) if hu >= (1 << 31) else hu
        assert h == expected[x]


@given(st.lists(I64, min_size=1, max_size=64, unique=True))
@_SETTINGS
def test_portable_token_matches_oracle_on_random_longs(spark, xs):
    sdf = spark.createDataFrame([(v,) for v in xs], "x long")
    tok = F.expr(PORTABLE_TOKEN_EXPR.format(col="x"))
    expected = {r.x: r.t for r in sdf.select("x", tok.alias("t")).collect()}
    con = duckdb.connect()
    e = portable_token_oracle_expr("x")
    vals = ", ".join(f"(({v})::HUGEINT::BIGINT)" for v in xs)
    for x, t in con.sql(f"SELECT x, {e} FROM (VALUES {vals}) t(x)").fetchall():
        assert t == expected[x], f"portable token diverged for {x}"


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-1000, max_value=1000),
            st.integers(min_value=0, max_value=50),
        ),
        min_size=1,
        max_size=12,
    ),
    st.lists(st.integers(min_value=-1100, max_value=1100), min_size=1, max_size=60,
             unique=True),
    st.sampled_from([1, 3, 7, 16, 100]),
)
@_SETTINGS
def test_range_join_binned_equals_naive_on_random_intervals(spark, ivs, xs, w):
    from cassandra_ttl_remover_spark.operators.asof import range_join

    iv = spark.createDataFrame(
        [(i, lo, lo + width) for i, (lo, width) in enumerate(ivs)],
        "ikey long, lo long, hi long",
    )
    pts = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "pid long, x long")
    naive = {(r.pid, r.ikey) for r in range_join(pts, iv, "x", "lo", "hi").collect()}
    binned = {
        (r.pid, r.ikey)
        for r in range_join(pts, iv, "x", "lo", "hi", bin_width=w).collect()
    }
    assert naive == binned
