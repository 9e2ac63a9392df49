"""Entity resolution: blocking, rational-Jaccard matching, closure."""

import pyspark.sql.functions as F

from cassandra_ttl_remover_spark.operators.er import resolve_entities


def test_resolve_entities_manual(spark):
    """Two near-identical records share rare tokens and fuse; transitive
    chain a~b~c lands in one entity; the unrelated record stays alone."""
    df = spark.createDataFrame(
        [(1, "acme corp portland oregon supplies"),
         (2, "acme corp portland oregon supply"),
         (3, "acme corp portland oregon"),
         (4, "zebra llc miami florida")],
        "doc_id long, text string")
    rows = {r.doc_id: (r.entity_id, r.cluster_size, r.is_canon)
            for r in resolve_entities(df, threshold=(1, 2)).collect()}
    assert rows[1][0] == rows[2][0] == rows[3][0] == 1
    assert rows[1] == (1, 3, True)
    assert rows[2] == (1, 3, False)
    assert rows[4] == (4, 1, True)


def test_resolve_entities_blocking_is_not_all_pairs(spark):
    """Records that do NOT share their rarest token are never compared:
    identical Jaccard but disjoint blocks -> separate entities."""
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
        "doc_id long, text string")
    rows = {r.doc_id: r.entity_id
            for r in resolve_entities(df, threshold=(0, 1)).collect()}
    # threshold (0,1) accepts ANY candidate pair with inter>0, yet the two
    # records share no token so no block, no pair
    assert rows == {1: 1, 2: 2}


def test_resolve_entities_block_df_cap(spark):
    """A block keyed by a too-common token is dropped (re-block zone)."""
    rows_in = [(i, "common filler words here") for i in range(1, 6)]
    df = spark.createDataFrame(rows_in, "doc_id long, text string")
    out = {r.doc_id: r.cluster_size
           for r in resolve_entities(df, threshold=(1, 2),
                                     max_block_df=4).collect()}
    # all 5 docs identical, but every token has df=5 > cap -> no blocks
    assert all(v == 1 for v in out.values())
    out2 = {r.doc_id: r.cluster_size
            for r in resolve_entities(df, threshold=(1, 2),
                                      max_block_df=5).collect()}
    assert all(v == 5 for v in out2.values())


def test_resolve_entities_no_cartesian(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d"), (3, "x y z")],
        "doc_id long, text string")
    plan = resolve_entities(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_edit_distance_pairs_manual(spark):
    from cassandra_ttl_remover_spark.operators.er import edit_distance_pairs

    df = spark.createDataFrame(
        [(1, "uniqueword alpha beta gamma"),
         (2, "uniqueword alpha beta gamna"),   # 1 substitution
         (3, "uniqueword totally different content here entirely")],
        "doc_id long, text string")
    rows = {(r.id_a, r.id_b): r.dist
            for r in edit_distance_pairs(df, max_dist=5).collect()}
    assert rows == {(1, 2): 1}  # doc3 shares the block but is too far


def test_edit_distance_length_band_prefilter(spark):
    """Pairs outside the length band never reach the DP."""
    from cassandra_ttl_remover_spark.operators.er import edit_distance_pairs

    df = spark.createDataFrame(
        [(1, "rarekey short"),
         (2, "rarekey " + "verylongpadding " * 20)],
        "doc_id long, text string")
    assert edit_distance_pairs(df, max_dist=5).collect() == []
