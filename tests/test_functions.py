"""Arrow-vectorized UDAF boundary: exactness and partitioning-independence."""

import pyspark.sql.functions as F
import pytest

from cassandra_ttl_remover_spark.functions import weighted_mean_cents


@pytest.fixture(scope="module")
def lineitem(spark):
    # unpersist on module teardown: Spark caches by logical plan, so a
    # leaked cache would hijack every later scan_table("lineitem") and
    # break the pushdown/pruning plan assertions in other modules
    from cassandra_ttl_remover_spark import scan_table
    from tests.conftest import SF_DIR
    df = scan_table(spark, SF_DIR, "lineitem").cache()
    yield df
    df.unpersist()


def test_weighted_mean_matches_sql_aggregate(spark, lineitem):
    """The pandas UDAF equals the pure-JVM integer-cents expression."""
    got = {r.l_returnflag: r.wmean
           for r in weighted_mean_cents(
               lineitem, "l_returnflag", "l_extendedprice", "l_quantity"
           ).collect()}
    want = {r.l_returnflag: r.wmean for r in (
        lineitem.groupBy("l_returnflag")
        .agg((
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")
                  * F.round("l_quantity").cast("long")).cast("double")
            / F.sum(F.round("l_quantity").cast("long")) / 100.0
        ).alias("wmean"))
        .collect())}
    assert got == want


def test_weighted_mean_partitioning_independent(spark, lineitem):
    a = weighted_mean_cents(lineitem, "l_returnflag",
                            "l_extendedprice", "l_quantity").collect()
    b = weighted_mean_cents(lineitem.repartition(13), "l_returnflag",
                            "l_extendedprice", "l_quantity").collect()
    assert {(r.l_returnflag, r.wmean) for r in a} == \
           {(r.l_returnflag, r.wmean) for r in b}
