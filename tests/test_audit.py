import pyspark.sql.functions as F

from cassandra_ttl_remover_spark.operators.audit import diff_frames, profile_table


def test_diff_frames_classifies(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "k long, v string, w long",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (4, None, 40), (5, "e", 50)],
        "k long, v string, w long",
    )
    out = {r.k: r.change for r in diff_frames(old, new, ["k"]).collect()}
    # 1 unchanged (omitted), 2 changed, 3 removed, 4 NULL==NULL unchanged, 5 added
    assert out == {2: "changed", 3: "removed", 5: "added"}


def test_diff_frames_single_join(spark, events):
    old = events.select("user_id", "event_id", "value")
    new = old.withColumn("value", F.col("value") + 1)
    d = diff_frames(old, new, ["user_id", "event_id"])
    assert d.filter(F.col("change") != "changed").count() == 0
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") == 1


def test_profile_table_single_pass(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "x"), (None, "y")], "a long, b string"
    )
    rows = {r.col_name: r for r in profile_table(df).collect()}
    assert rows["a"].n_rows == 4 and rows["a"].n_nulls == 1 and rows["a"].n_distinct == 3
    assert rows["b"].n_nulls == 1 and rows["b"].n_distinct == 2


def test_table_digest_detects_divergence_and_ignores_order(spark):
    from cassandra_ttl_remover_spark.operators.audit import table_digest

    rows = [(i, i % 7, f"t{i % 3}") for i in range(200)]
    a = spark.createDataFrame(rows, "id long, k long, tag string")
    # same content, different row order and partitioning
    b = spark.createDataFrame(list(reversed(rows)), "id long, k long, tag string").repartition(7)
    da = {(r.bucket): (r.n_rows, r.digest)
          for r in table_digest(a, ["id", "k", "tag"], "k", 8).collect()}
    db = {(r.bucket): (r.n_rows, r.digest)
          for r in table_digest(b, ["id", "k", "tag"], "k", 8).collect()}
    assert da == db
    # one flipped row diverges exactly one bucket, same row counts
    rows2 = list(rows)
    rows2[17] = (17, 17 % 7, "CHANGED")
    c = spark.createDataFrame(rows2, "id long, k long, tag string")
    dc = {(r.bucket): (r.n_rows, r.digest)
          for r in table_digest(c, ["id", "k", "tag"], "k", 8).collect()}
    diff = [bkt for bkt in da if da[bkt] != dc[bkt]]
    assert diff == [(17 % 7) % 8]
    assert all(da[bkt][0] == dc[bkt][0] for bkt in da)  # counts agree


def test_table_digest_negative_keys_match_oracle(spark, tmp_path):
    # DuckDB's % follows the dividend's sign while Spark pmod is always
    # non-negative — the oracle SQL must mirror pmod so NEGATIVE bucket
    # keys land both engines in the same bucket
    import duckdb

    from cassandra_ttl_remover_spark.operators.audit import (
        table_digest,
        table_digest_oracle_sql,
    )
    from tests.oracle_parity import compare

    rows = [(i, (-1) ** i * (i % 11), f"t{i % 3}") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, k long, tag string")
    p = str(tmp_path / "neg.parquet")
    df.coalesce(1).write.parquet(p)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW negtab AS SELECT * FROM read_parquet('{p}/*.parquet')")
    ok, msg = compare(
        table_digest(df, ["id", "k", "tag"], "k", 8),
        table_digest_oracle_sql(["id", "k", "tag"], "k", 8, table="negtab"),
        con,
    )
    assert ok, msg


def test_group_outliers_exact_hand_case(spark):
    from cassandra_ttl_remover_spark.operators.audit import group_outliers

    # group 'a': nine 1.0s and one 100.0 -> the 100 is way past 2 sigma;
    # group 'b': uniform values -> zero outliers
    rows = [("a", 1.0)] * 9 + [("a", 100.0)] + [("b", float(v)) for v in range(5)]
    df = spark.createDataFrame(rows, "g string, value double")
    out = {r.g: r for r in group_outliers(df, "value", "g", z=2).collect()}
    assert out["a"].n_rows == 10 and out["a"].n_outliers == 1
    assert out["b"].n_rows == 5 and out["b"].n_outliers == 0
    assert abs(out["a"].mean_q - 10.9e6) < 1e-6


def test_referential_integrity_detects_orphans(spark):
    from cassandra_ttl_remover_spark.operators.audit import referential_integrity

    child = spark.createDataFrame([(1,), (2,), (2,), (9,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    row = referential_integrity(child, parent, "fk", "pk").first()
    assert (row.n_child, row.n_orphans, row.ok) == (4, 1, False)
    row2 = referential_integrity(child.filter("fk != 9"), parent, "fk", "pk").first()
    assert (row2.n_child, row2.n_orphans, row2.ok) == (3, 0, True)


def test_distribution_drift_chi_square(spark):
    """Hand-checked chi-square terms, including a category absent from one
    side (expected=0 -> NULL term; new-only category still reported)."""
    from cassandra_ttl_remover_spark.operators.audit import distribution_drift

    old = spark.createDataFrame([("a",)] * 8 + [("b",)] * 2, "c string")
    new = spark.createDataFrame([("a",)] * 5 + [("b",)] * 4 + [("x",)], "c string")
    rows = {r.category: r for r in distribution_drift(old, new, "c").collect()}
    assert set(rows) == {"a", "b", "x"}
    # expected_a = 8 * 10/10 = 8; term = (5-8)^2/8
    assert rows["a"].expected == 8.0 and rows["a"].chi2_term == 9 / 8
    assert rows["b"].expected == 2.0 and rows["b"].chi2_term == 4 / 2
    assert rows["x"].n_old == 0 and rows["x"].chi2_term is None


def test_distribution_drift_identical_is_zero(spark, events):
    from cassandra_ttl_remover_spark.operators.audit import distribution_drift

    import pyspark.sql.functions as F

    r = distribution_drift(events, events, "event_type")
    assert r.agg(F.sum("chi2_term")).first()[0] == 0.0


def test_distribution_drift_empty_old_snapshot(spark):
    """ta = 0 would be 0/0: both expected and chi2_term must be NULL (not
    NaN) so the engines agree on the degenerate input."""
    from cassandra_ttl_remover_spark.operators.audit import distribution_drift

    old = spark.createDataFrame([], "c string")
    new = spark.createDataFrame([("a",), ("b",)], "c string")
    rows = {r.category: r for r in distribution_drift(old, new, "c").collect()}
    assert set(rows) == {"a", "b"}
    for r in rows.values():
        assert r.expected is None and r.chi2_term is None


def _ks_num(xs, ys):
    """Pure-Python exact KS numerator replica: max |cA(x)*nB - cB(x)*nA|
    over the merged support."""
    na, nb = len(xs), len(ys)
    best = 0
    for t in sorted(set(xs) | set(ys)):
        ca = sum(1 for x in xs if x <= t)
        cb = sum(1 for y in ys if y <= t)
        best = max(best, abs(ca * nb - cb * na))
    return best


def test_ks_drift_matches_replica_with_ties_and_nulls(spark):
    from cassandra_ttl_remover_spark.operators.audit import ks_drift

    xs = [1, 1, 2, 5, 5, 5, 9]
    ys = [2, 2, 3, 5, 10, 10]
    a = spark.createDataFrame([(v,) for v in xs] + [(None,)], "v bigint")
    b = spark.createDataFrame([(v,) for v in ys], "v bigint")
    r = ks_drift(a, b, "v").first()
    assert (r.n_a, r.n_b) == (len(xs), len(ys))
    assert r.d_num == _ks_num(xs, ys)
    # D in [0,1] by construction
    assert 0 <= r.d_num <= r.n_a * r.n_b


def test_ks_drift_identical_samples_is_zero(spark, events):
    from cassandra_ttl_remover_spark.operators.audit import ks_drift

    r = ks_drift(events, events, "event_id").first()
    assert r.d_num == 0 and r.n_a == r.n_b


def test_ks_drift_disjoint_supports_is_max(spark):
    from cassandra_ttl_remover_spark.operators.audit import ks_drift

    a = spark.createDataFrame([(v,) for v in (1, 2, 3)], "v bigint")
    b = spark.createDataFrame([(v,) for v in (10, 11)], "v bigint")
    r = ks_drift(a, b, "v").first()
    assert r.d_num == r.n_a * r.n_b  # D == 1


def test_cascade_delete_audit_manual(spark):
    from cassandra_ttl_remover_spark.operators.audit import (
        cascade_delete_audit,
    )

    customer = spark.createDataFrame(
        [(1, 3), (2, 3), (3, 5)], "c_custkey long, c_nationkey long")
    orders = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], "o_orderkey long, o_custkey long")
    lineitem = spark.createDataFrame(
        [(10, 1), (10, 2), (12, 1)], "l_orderkey long, l_linenumber long")
    got = {r.table_name: (r.n_total, r.n_deleted, r.n_surviving)
           for r in cascade_delete_audit(
               customer, orders, lineitem, nation_key=3).collect()}
    assert got == {"customer": (3, 2, 1),
                   "orders": (3, 2, 1),
                   "lineitem": (3, 2, 1)}


def test_source_overlap_matrix_manual(spark):
    """Two sources sharing exactly one 3-gram; third source disjoint."""
    from cassandra_ttl_remover_spark.operators.audit import (
        source_overlap_matrix,
    )

    df = spark.createDataFrame(
        [(1, "the quick brown fox", "a"),
         (2, "a quick brown fox runs", "b"),
         (3, "zeta eta theta", "c")],
        "doc_id long, text string, source string")
    rows = {(r.src_a, r.src_b): (r.shared, r.n_a, r.n_b, r.jaccard)
            for r in source_overlap_matrix(df).collect()}
    # a: {the quick brown, quick brown fox}; b: {a quick brown,
    # quick brown fox, brown fox runs} -> share exactly 1
    assert rows[("a", "b")] == (1, 2, 3, 1 / 4)
    assert ("a", "c") not in rows and ("b", "c") not in rows


def test_key_skew_report_manual(spark):
    from cassandra_ttl_remover_spark.operators.audit import key_skew_report

    rows = ([("a",)] * 10 + [("b",)] * 5 + [("c",)] * 3 + [("d",)] * 1
            + [("e",)] * 1)
    df = spark.createDataFrame(rows, "k string")
    r = key_skew_report(df, "k", quantiles=(50, 90), top_k=2).collect()[0]
    assert (r.n_rows, r.n_keys, r.max_cnt) == (20, 5, 10)
    # counts asc = [1,1,3,5,10]; p50 rank = (5-1)*50//100+1 = 3 -> 3
    # p90 rank = (5-1)*90//100+1 = 4 -> 5
    assert (r.p50_cnt, r.p90_cnt) == (3, 5)
    assert r.top_keys == "a:10,b:5"


def test_join_advisor_rules(spark):
    from cassandra_ttl_remover_spark.operators.audit import (
        join_strategy_advisor,
    )

    fact = spark.createDataFrame(
        [(i, "hot" if i % 10 else f"k{i}") for i in range(1000)],
        "id long, k string")
    small_dim = spark.createDataFrame([("hot",), ("k0",)], "k string")
    # tiny dim -> broadcast regardless of skew
    r = join_strategy_advisor(fact, small_dim, "k",
                              broadcast_rows=10).collect()[0]
    assert r.recommendation == "broadcast"
    # big dim + hot key -> salt
    big_dim = spark.range(1000).select(F.col("id").cast("string").alias("k"))
    r = join_strategy_advisor(fact, big_dim, "k", broadcast_rows=10,
                              skew_ratio=20).collect()[0]
    # 900 of 1000 rows on 'hot', ~101 keys: max*keys=900*101 > 20*1000
    assert r.recommendation == "salt"
    # uniform fact -> shuffle
    uni = spark.range(1000).select(
        F.col("id"), F.col("id").cast("string").alias("k"))
    r = join_strategy_advisor(uni, big_dim, "k", broadcast_rows=10,
                              skew_ratio=20).collect()[0]
    assert r.recommendation == "shuffle"


def test_k_anonymity_report(spark):
    from cassandra_ttl_remover_spark.operators.audit import (
        k_anonymity_report,
    )

    df = spark.createDataFrame(
        [("en", "a")] * 5 + [("en", "b")] * 2 + [("de", "a")] * 1,
        "lang string, source string")
    viol = {(r.lang, r.source): r.n_rows
            for r in k_anonymity_report(df, ["lang", "source"],
                                        k=5).collect()}
    assert viol == {("en", "b"): 2, ("de", "a"): 1}
    assert k_anonymity_report(df, ["lang", "source"], k=1).collect() == []


def test_corpus_card_values(spark):
    from cassandra_ttl_remover_spark.operators.audit import corpus_card

    df = spark.createDataFrame(
        [(1, "one two", "en"), (2, "one two", "en"), (3, "drei", "de")],
        "doc_id long, text string, lang string")
    card = {r.metric: r.value for r in corpus_card(df).collect()}
    assert card["n_docs"] == 3 and card["n_tokens"] == 5
    assert card["lang:en"] == 2 and card["lang:de"] == 1
    assert card["n_exact_dup_rows"] == 1  # one extra copy of "one two"
    assert card["min_chars"] == 4 and card["max_chars"] == 7
