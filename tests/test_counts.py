"""A1/A2/A3 count & sketch operators (SURVEY.md §2.1)."""

import pytest
from cassandra_ttl_remover_spark.operators.counts import (
    approximate_key_count,
    count_keys,
    estimate_merge_gain,
)


def test_exact_vs_approx(events):
    exact = count_keys(events, "user_id")
    approx = approximate_key_count(events, "user_id")
    assert exact > 0
    assert abs(approx - exact) <= max(1, 0.02 * exact)


@pytest.mark.slow  # seal-gate tier (heavy equality/e2e sweep)
def test_merge_gain_disjoint_vs_identical(spark):
    a = spark.range(0, 1000).withColumnRenamed("id", "k")
    b = spark.range(1000, 2000).withColumnRenamed("id", "k")
    disjoint = estimate_merge_gain([a, b], "k")
    identical = estimate_merge_gain([a, a], "k")
    # no overlap -> ~1.0 ; full overlap -> ~0.5 (NoTTLReader.java:221-250)
    assert disjoint > 0.95
    assert abs(identical - 0.5) < 0.02


def test_merge_gain_empty_sources(spark):
    e = spark.range(0).withColumnRenamed("id", "k")
    assert estimate_merge_gain([e, e], "k") == 1.0


def test_estimate_intersection_inclusion_exclusion(spark, events):
    """HLL inclusion-exclusion lands near the exact intersection."""
    import pyspark.sql.functions as F

    from cassandra_ttl_remover_spark.operators.counts import estimate_intersection

    a = events.filter(F.col("user_id") % 2 == 0)
    b = events.filter(F.col("user_id") % 3 == 0)
    row = estimate_intersection(a, b, "user_id").first()
    exact = a.select("user_id").intersect(b.select("user_id")).count()
    union = a.select("user_id").union(b.select("user_id")).distinct().count()
    assert abs(row.est_intersection - exact) <= 0.15 * union + 5
    assert row.est_union >= max(row.est_small, row.est_large) * 0.9


def test_estimate_intersection_empty_side_is_zero(spark, events):
    """An empty side must yield est_intersection ~ 0, not ~ |other|."""
    import pyspark.sql.functions as F

    from cassandra_ttl_remover_spark.operators.counts import estimate_intersection

    row = estimate_intersection(events.filter(F.lit(False)), events, "user_id").first()
    assert row.est_small == 0
    assert row.est_intersection == 0
    assert row.est_union == row.est_large


def test_approximate_keys_for_range(spark, events):
    """Per-range HLL: estimate within rsd of the exact distinct; predicate
    pushes to the scan (filter-then-estimate)."""
    from cassandra_ttl_remover_spark.operators.counts import (
        approximate_keys_for_range,
    )

    approx = approximate_keys_for_range(events, "user_id", 5, 20)
    exact = (
        events.filter("user_id BETWEEN 5 AND 20")
        .select("user_id").distinct().count()
    )
    assert abs(approx - exact) <= max(2, 0.05 * exact)


def test_estimate_difference_identities(spark):
    """Sketch difference: disjoint sets -> ~|A|; A ⊆ B -> clamped >= 0;
    empty B -> difference == union estimate."""
    from cassandra_ttl_remover_spark.operators.counts import (
        estimate_difference,
    )

    a = spark.range(0, 1000).withColumnRenamed("id", "k")
    b = spark.range(2000, 2500).withColumnRenamed("id", "k")
    r = estimate_difference(a, b, "k").first()
    assert abs(r.est_difference - 1000) <= 0.1 * 1500
    # subset: A within B -> true difference 0, estimate clamped small
    r2 = estimate_difference(
        spark.range(0, 200).withColumnRenamed("id", "k"),
        spark.range(0, 1000).withColumnRenamed("id", "k"),
        "k",
    ).first()
    assert 0 <= r2.est_difference <= 0.1 * 1000 + 5
    # empty subtrahend: difference == union == est(A)
    r3 = estimate_difference(
        a, spark.createDataFrame([], "k long"), "k"
    ).first()
    assert r3.est_b == 0 and r3.est_difference == r3.est_union


def test_countmin_certificate_and_collision_behavior(spark):
    """A tiny width forces collisions: colliding tokens must OVERestimate
    (cell absorbs both counts) while the guarantee est >= true holds for
    every probe; a generous width recovers exact counts."""
    from cassandra_ttl_remover_spark.operators.counts import countmin_estimates

    rows = [(i, ("alpha " * 5 + "beta " * 3 + "gamma").strip())
            for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    tight = {r.token: r for r in
             countmin_estimates(df, depth=2, width=2, top=3).collect()}
    assert set(tight) == {"alpha", "beta", "gamma"}
    assert all(r.is_overestimate for r in tight.values())
    assert tight["alpha"].true_count == 30
    wide = {r.token: r for r in
            countmin_estimates(df, depth=4, width=4096, top=3).collect()}
    # at width >> vocab, every estimate should be exact
    assert all(r.cms_est == r.true_count for r in wide.values())


def test_countmin_join_size_certificate(spark):
    """Skewed key frequencies: exact |A join B| = sum f_A(k)*f_B(k); the
    CMS inner product must bound it from above, and a wide sketch must
    recover it exactly (no collisions)."""
    from cassandra_ttl_remover_spark.operators.counts import (
        countmin_join_size,
    )

    a = spark.createDataFrame(
        [(k,) for k in [1] * 10 + [2] * 3 + [3] * 1 + [9] * 5], "k long"
    )
    b = spark.createDataFrame(
        [(k,) for k in [1] * 2 + [2] * 4 + [4] * 7], "k long"
    )
    exact = 10 * 2 + 3 * 4  # keys 1 and 2 overlap
    wide = countmin_join_size(a, "k", b, "k", depth=4, width=4096).collect()[0]
    assert wide.exact_join_size == exact
    assert wide.cms_join_est == exact          # collision-free at this width
    tight = countmin_join_size(a, "k", b, "k", depth=2, width=2).collect()[0]
    assert tight.exact_join_size == exact
    assert tight.is_overestimate               # collisions only inflate


def test_frequent_pairs_apriori_prune(spark):
    """Items below singleton support never reach the pair stage, even if
    one pair of them co-occurs often enough via a shared basket."""
    from cassandra_ttl_remover_spark.operators.counts import frequent_pairs

    rows = []
    for b in range(10):
        rows += [(b, "milk"), (b, "bread")]       # both frequent
    rows += [(100, "rare1"), (100, "rare2")]      # infrequent singles
    df = spark.createDataFrame(rows, "b long, i string")
    got = {(r.item_a, r.item_b): r.support
           for r in frequent_pairs(df, "b", "i", min_support=5).collect()}
    assert got == {("bread", "milk"): 10}


def test_frequent_pairs_basket_cap(spark):
    """A degenerate basket above max_basket contributes no pairs, even
    when its items are individually frequent."""
    from cassandra_ttl_remover_spark.operators.counts import frequent_pairs

    rows = []
    # 20 items, each individually frequent (5 singleton baskets apiece)
    for k in range(20):
        rows += [(100 + 10 * k + j, f"i{k:02d}") for j in range(5)]
    # ...and all 20 together in ONE promiscuous basket
    rows += [(1, f"i{k:02d}") for k in range(20)]
    # a normal frequent pair for contrast
    rows += [(b, "a") for b in range(2, 9)] + [(b, "c") for b in range(2, 9)]
    df = spark.createDataFrame(rows, "b long, i string")
    capped = {(r.item_a, r.item_b)
              for r in frequent_pairs(df, "b", "i", min_support=5,
                                      max_basket=10).collect()}
    assert capped == {("a", "c")}
    uncapped = frequent_pairs(df, "b", "i", min_support=1,
                              max_basket=1000).collect()
    assert any(r.item_a.startswith("i") for r in uncapped)


def test_bloom_fpr_certificate_sane(spark, documents):
    from cassandra_ttl_remover_spark.operators.counts import (
        bloom_fpr_certificate,
    )

    r = bloom_fpr_certificate(documents, num_bits=1 << 16, k=5).collect()[0]
    assert r.n_inserted > 0 and r.n_probes > 0
    assert 0 <= r.n_fp <= r.n_probes
    assert r.n_bits_set <= min(1 << 16, 5 * r.n_inserted)
    # with m=65536 bits and a few thousand inserts, fpr must be small
    assert r.fpr_ok


def test_bloom_fpr_shrinks_with_more_bits(spark, documents):
    """More bits -> monotonically no-worse FPR (probabilistic in general,
    deterministic here since the hash positions are fixed)."""
    from cassandra_ttl_remover_spark.operators.counts import (
        bloom_fpr_certificate,
    )

    small = bloom_fpr_certificate(documents, num_bits=1 << 10,
                                  k=3).collect()[0]
    big = bloom_fpr_certificate(documents, num_bits=1 << 18,
                                k=3).collect()[0]
    assert big.n_fp <= small.n_fp
