"""S3-S6 lookups + physical-plan checks: pushdown must actually reach the
parquet scan (the Spark analog of 'the seek happened' —
NoTTLReader.java:1502-1665)."""

import pyspark.sql.functions as F

from cassandra_ttl_remover_spark import scan_table
from cassandra_ttl_remover_spark.operators.lookups import (
    first_key_beyond,
    named_columns,
    point_lookup,
    range_scan,
    token_filter,
)
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_point_lookup_filter_pushdown(spark):
    li = scan_table(spark, SF_DIR, "lineitem")
    df = point_lookup(li, "l_orderkey", 1)
    plan = _plan(df)
    assert "PushedFilters" in plan and "l_orderkey" in plan
    rows = df.collect()
    assert all(r.l_orderkey == 1 for r in rows)


def test_projection_pruning_reaches_scan(spark):
    # lineitem: not session-cached, so the plan bottoms out at the file scan
    li = scan_table(spark, SF_DIR, "lineitem")
    df = li.select("l_orderkey", "l_returnflag")
    plan = _plan(df)
    # ReadSchema must contain only the projected columns (+ nothing else)
    rs = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in rs and "l_returnflag" in rs
    assert "l_extendedprice" not in rs and "l_partkey" not in rs


def test_range_scan_pushdown_and_bounds(spark):
    li = scan_table(spark, SF_DIR, "lineitem")
    df = range_scan(li, "l_orderkey", 3, 7)
    assert "GreaterThanOrEqual(l_orderkey,3)" in _plan(df)
    assert df.filter((F.col("l_orderkey") < 3) | (F.col("l_orderkey") > 7)).count() == 0


def test_first_key_beyond_is_take_ordered(spark):
    od = scan_table(spark, SF_DIR, "orders")
    df = first_key_beyond(od, "o_orderkey", 10)
    # top-k must be TakeOrdered (per-partition heap), not a global Sort+Limit
    assert "TakeOrderedAndProject" in _plan(df)
    r = df.collect()
    assert len(r) == 1 and r[0].o_orderkey == 11


def test_named_columns(spark):
    ev = scan_table(spark, SF_DIR, "events")
    out = named_columns(ev, "event_id", 3, ["event_type", "value"])
    assert out.columns == ["event_id", "event_type", "value"]
    assert out.count() == 1


def test_token_filter_partitions_complement(spark):
    ev = scan_table(spark, SF_DIR, "events")
    n = ev.count()
    lo = token_filter(ev, "event_id", 0, 1 << 30).count()
    hi = token_filter(ev, "event_id", (1 << 30) + 1, (1 << 31) - 1).count()
    assert lo + hi == n, "token ranges must partition the keyspace"
    # wrap-around range == complement
    wrap = token_filter(ev, "event_id", (1 << 30) + 1, 1 << 30).count()
    assert wrap == n


def test_whole_stage_codegen_in_strip(spark):
    from cassandra_ttl_remover_spark import annotate_events, strip_ttl
    ev = scan_table(spark, SF_DIR, "events")
    plan = _plan(strip_ttl(annotate_events(ev)))
    assert "*(" in plan, "strip must stay in whole-stage codegen (no UDF)"
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_portable_token_filter_partitions_space(spark, events):
    """The portable-token spans [0,m] and (m,max] must partition the table,
    and wrap-around must select the complement."""
    from cassandra_ttl_remover_spark.operators.lookups import portable_token_filter

    mid, top = 1 << 59, (1 << 60) - 1
    lo = portable_token_filter(events, "event_id", 0, mid).count()
    hi = portable_token_filter(events, "event_id", mid + 1, top).count()
    assert lo + hi == events.count()
    wrap = portable_token_filter(events, "event_id", mid + 1, mid).count()
    assert wrap == events.count(), "full wrap-around selects everything"


def test_salted_join_identical_to_plain(spark, events):
    """salted_join == plain join row-for-row (1:N dim), any n_salts."""
    from cassandra_ttl_remover_spark.plans import salted_join

    dim = spark.createDataFrame(
        [("view", 1), ("click", 2), ("purchase", 3), ("refund", 4)],
        "event_type string, w long")
    ev = events.limit(500)
    plain = ev.join(dim, "event_type")
    salted = salted_join(ev, dim, "event_type", n_salts=5)
    assert salted.count() == plain.count()
    assert salted.select(*sorted(plain.columns)).exceptAll(
        plain.select(*sorted(plain.columns))).isEmpty()


def test_salted_join_spreads_hot_key(spark):
    """The join key actually includes the salt: the dim side carries
    n_salts replicas per key in the joined plan's build side."""
    from cassandra_ttl_remover_spark.plans import salted_join

    fact = spark.createDataFrame([(1, "hot")] * 100 + [(2, "cold")],
                                 "id long, k string")
    dim = spark.createDataFrame([("hot", 10), ("cold", 20)], "k string, v long")
    out = salted_join(fact, dim, "k", n_salts=4)
    assert out.count() == 101
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan


def test_incremental_agg_merge_equals_recompute(spark, events):
    from cassandra_ttl_remover_spark.plans import incremental_agg_merge

    ev = events.select("event_type", "event_id")
    aggs = {"n": ("count", "event_id"), "mx": ("max", "event_id")}
    base = ev.filter("event_id % 5 != 0")
    delta = ev.filter("event_id % 5 = 0")
    base_agg = base.groupBy("event_type").agg(
        F.count("event_id").alias("n"), F.max("event_id").alias("mx"))
    merged = incremental_agg_merge(base_agg, delta, ["event_type"], aggs)
    full = ev.groupBy("event_type").agg(
        F.count("event_id").alias("n"), F.max("event_id").alias("mx"))
    assert {tuple(r) for r in merged.collect()} == \
           {tuple(r) for r in full.collect()}


def test_incremental_agg_merge_rejects_non_algebraic(spark, events):
    import pytest

    from cassandra_ttl_remover_spark.plans import incremental_agg_merge

    with pytest.raises(ValueError):
        incremental_agg_merge(events, events, ["event_type"],
                              {"a": ("avg", "value")})
