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


def test_run_length_udtf_hand_examples(spark):
    from cassandra_ttl_remover_spark.functions.udtfs import RunLengthSegments

    spark.udtf.register("t_run_lengths", RunLengthSegments)
    df = spark.createDataFrame(
        [(1, "a a a b a"), (2, ""), (3, "x"), (4, "z  z   q")],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("_t_rl_docs")
    got = [
        (r.doc_id, r.pos, r.token, r.run_len)
        for r in spark.sql(
            "SELECT d.doc_id, r.* FROM _t_rl_docs d,"
            " LATERAL t_run_lengths(d.text) r ORDER BY d.doc_id, r.pos"
        ).collect()
    ]
    assert got == [
        (1, 1, "a", 3), (1, 4, "b", 1), (1, 5, "a", 1),
        (3, 1, "x", 1),
        (4, 1, "z", 2), (4, 3, "q", 1),
    ]  # doc 2 (empty) emits no rows; multi-spaces collapse


def test_linear_fit_matches_numpy(spark, documents):
    """Cramer-rule OLS must agree with numpy's lstsq on the same
    integer feature matrix (rtol generous: numpy solves in floats)."""
    import numpy as np

    from cassandra_ttl_remover_spark.operators.ml import linear_fit

    docs = documents.limit(200)
    row = linear_fit(docs).collect()[0]
    pdf = docs.selectExpr(
        "cast(length(text) as bigint) as x1",
        "cast(size(filter(split(text, ' '), w -> w <> '')) as bigint) as x2",
        "cast(length(text) - length(replace(text, 'e', '')) as bigint) as y",
    ).toPandas()
    A = np.column_stack([np.ones(len(pdf)), pdf.x1, pdf.x2])
    beta, *_ = np.linalg.lstsq(A, pdf.y.to_numpy(), rcond=None)
    assert row.n == len(pdf)
    assert abs(row.b0 - beta[0]) < 1e-6 * max(1.0, abs(beta[0]))
    assert abs(row.b1 - beta[1]) < 1e-6 * max(1.0, abs(beta[1]))
    assert abs(row.b2 - beta[2]) < 1e-6 * max(1.0, abs(beta[2]))
    assert int(row.det) != 0


def test_ridge_shrinks_toward_zero(spark, documents):
    from cassandra_ttl_remover_spark.operators.ml import linear_fit, ridge_fit

    docs = documents.limit(200)
    o = linear_fit(docs).collect()[0]
    big = ridge_fit(docs, lam=10**9).collect()[0]
    # huge penalty drives slopes toward 0 (intercept stays free)
    assert abs(big.b1) < abs(o.b1) and abs(big.b2) < abs(o.b2)
    assert abs(big.b1) < 1e-3 and abs(big.b2) < 1e-3


def test_residual_outliers_exactness(spark, documents):
    """r_scaled / det must equal the float residual of the fitted model."""
    from cassandra_ttl_remover_spark.operators.ml import (
        linear_fit, ols_residual_outliers,
    )

    docs = documents.limit(200)
    fit = linear_fit(docs).collect()[0]
    for r in ols_residual_outliers(docs, k=5).collect():
        resid = float(r.y) - (fit.b0 + fit.b1 * r.x1 + fit.b2 * r.x2)
        assert abs(float(r.r_scaled) / float(fit.det) - resid) < 1e-6


def test_grouped_fit_matches_per_group_linear_fit(spark, documents):
    """grouped_fit(lang) row-for-row equals linear_fit run on each
    lang slice separately."""
    from cassandra_ttl_remover_spark.operators.ml import grouped_fit, linear_fit

    docs = documents.limit(300)
    got = {r.lang: (r.n, r.b0, r.b1, r.b2)
           for r in grouped_fit(docs).collect()}
    for lang in got:
        solo = linear_fit(docs.filter(F.col("lang") == lang)).collect()[0]
        assert got[lang] == (solo.n, solo.b0, solo.b1, solo.b2)


def test_grouped_fit_singular_group_yields_null(spark):
    """A group whose docs are all identical has a singular normal matrix:
    coefficients must be NULL, not an error."""
    from cassandra_ttl_remover_spark.operators.ml import grouped_fit

    df = spark.createDataFrame(
        [(1, "same text here", "x"), (2, "same text here", "x"),
         (3, "one two", "y"), (4, "three four five six", "y"),
         (5, "a b c d e f g", "y")],
        "doc_id long, text string, lang string")
    rows = {r.lang: r for r in grouped_fit(df).collect()}
    assert int(rows["x"].det) == 0 and rows["x"].b1 is None
    assert int(rows["y"].det) != 0 or rows["y"].b1 is None


def test_chi2_contingency_manual(spark):
    """Hand-checked 2x2: token 'pos' in 2/2 positive docs and 0/2
    negative docs -> chi2 = N = 4 (perfect association)."""
    from cassandra_ttl_remover_spark.operators.ml import chi2_top_tokens

    df = spark.createDataFrame(
        [(1, "pos alpha", "en"), (2, "pos beta", "en"),
         (3, "neg alpha", "de"), (4, "neg beta", "de")],
        "doc_id long, text string, lang string")
    rows = {r.token: r for r in
            chi2_top_tokens(df, positive="en", k=10, min_df=1).collect()}
    assert float(rows["pos"].chi2) == 4.0
    assert float(rows["neg"].chi2) == 4.0
    assert float(rows["alpha"].chi2) == 0.0  # present in one of each class


def test_ttest_matches_scipy_free_reference(spark, documents):
    """t from the rational construction equals the classic pooled-t
    computed in floats from the same data."""
    import math

    from cassandra_ttl_remover_spark.operators.ml import ttest_two_group

    docs = documents.limit(250)
    row = ttest_two_group(docs, positive="en").collect()[0]
    lens = [(len(r.text), r.lang == "en")
            for r in docs.select("text", "lang").collect()]
    g1 = [x for x, p in lens if p]
    g2 = [x for x, p in lens if not p]
    n1, n2 = len(g1), len(g2)
    m1, m2 = sum(g1) / n1, sum(g2) / n2
    ss1 = sum((x - m1) ** 2 for x in g1)
    ss2 = sum((x - m2) ** 2 for x in g2)
    sp2 = (ss1 + ss2) / (n1 + n2 - 2)
    want = (m1 - m2) / math.sqrt(sp2 * (1 / n1 + 1 / n2))
    assert (row.n1, row.n2) == (n1, n2)
    assert abs(row.t - want) < 1e-9 * max(1.0, abs(want))


def test_chi2_symmetric_under_class_complement(spark, documents):
    """chi2 of a 2x2 table is invariant under swapping the positive
    class with its complement (here: en vs the union of the rest
    expressed through any single other label as positive would differ,
    but complementing pos<->neg must not)."""
    from cassandra_ttl_remover_spark.operators.ml import chi2_top_tokens

    docs = documents.limit(200).withColumn(
        "flipped",
        F.when(F.col("lang") == "en", F.lit("neg")).otherwise(F.lit("pos")),
    )
    a = {r.token: float(r.chi2) for r in chi2_top_tokens(
        docs, positive="en", k=1000, min_df=2).collect()}
    b = {r.token: float(r.chi2) for r in chi2_top_tokens(
        docs, positive="pos", label_col="flipped",
        k=1000, min_df=2).collect()}
    assert a == b


def test_grouped_fit_permutation_invariant(spark, documents):
    """The exact fit cannot depend on partitioning or row order."""
    from cassandra_ttl_remover_spark.operators.ml import grouped_fit

    docs = documents.limit(200)
    a = {(r.lang): (str(r.det), r.b1) for r in grouped_fit(docs).collect()}
    shuffled = docs.repartition(7).sortWithinPartitions(F.rand(42))
    b = {(r.lang): (str(r.det), r.b1)
         for r in grouped_fit(shuffled).collect()}
    assert a == b


def test_autocorr_matches_numpy(spark, events):
    """acf_num/acf_den equals the float lag-1 ACF computed directly."""
    import numpy as np

    from __spark_entry__ import queries

    # build the same daily series
    pdf = (events.groupBy(F.expr("cast(cast(ts as date) as string)")
                          .alias("day"))
           .agg(F.count("*").alias("x")).orderBy("day").toPandas())
    x = pdf["x"].to_numpy(dtype=np.float64)
    m = x.mean()
    want = float(((x[:-1] - m) * (x[1:] - m)).sum()
                 / ((x - m) ** 2).sum())
    from tests.conftest import SF_DIR
    got = queries()["q_ml7_autocorr"](events.sparkSession, SF_DIR).collect()[0]
    assert abs(float(got.acf1) - want) < 1e-9
    assert got.n_days == len(x)


def test_cusum_closed_form_equals_recurrence(spark):
    """The prefix-sum / running-min closed form must equal the textbook
    sequential recurrence max(0, S + (x - k)) on a hand series with a
    genuine upward shift."""
    from cassandra_ttl_remover_spark.operators.ml import cusum_drift

    xs = [10, 9, 11, 10, 30, 35, 8, 40, 41, 42]
    k, h = 12, 20
    df = spark.createDataFrame(
        [(f"d{i:02d}", x) for i, x in enumerate(xs)], "day string, x long")
    got = [(r.cusum, r.alarm)
           for r in cusum_drift(df, k=k, h=h).orderBy("day").collect()]
    s, want = 0, []
    for x in xs:
        s = max(0, s + (x - k))
        want.append((s, s > h))
    assert got == want


def test_mannwhitney_matches_textbook_reference(spark, documents):
    """U and tie-corrected z from the integer doubled-midrank
    construction equal a float midrank computation over the same data
    (the classic scipy-style formulation, recomputed here with stdlib
    floats so the test carries its own reference)."""
    import math
    from collections import Counter

    from cassandra_ttl_remover_spark.operators.ml import mannwhitney_u

    docs = documents.limit(250)
    row = mannwhitney_u(docs, positive="en").collect()[0]
    lens = [(len(r.text), r.lang == "en")
            for r in docs.select("text", "lang").collect()]
    xs = sorted(x for x, _ in lens)
    counts = Counter(xs)
    # midrank of value v = (#less) + (t+1)/2
    less = {}
    run = 0
    for v in sorted(counts):
        less[v] = run
        run += counts[v]
    r1 = sum(less[x] + (counts[x] + 1) / 2 for x, p in lens if p)
    n1 = sum(1 for _, p in lens if p)
    n2 = len(lens) - n1
    u1 = r1 - n1 * (n1 + 1) / 2
    nn = n1 + n2
    tie = sum(t ** 3 - t for t in counts.values())
    var = n1 * n2 / 12 * ((nn + 1) - tie / (nn * (nn - 1)))
    want_z = (u1 - n1 * n2 / 2) / math.sqrt(var)
    assert (row.n1, row.n2) == (n1, n2)
    assert int(row.u1_x2) == int(2 * u1)
    assert abs(row.z - want_z) < 1e-9 * max(1.0, abs(want_z))


def test_mannwhitney_degenerate_all_tied(spark):
    """Every observation identical: U1 = n1*n2/2 exactly (all midranks
    equal) and the tie term drives the variance to zero -> z = 0."""
    from cassandra_ttl_remover_spark.operators.ml import mannwhitney_u

    df = spark.createDataFrame(
        [("a" * 7, "en" if i % 3 == 0 else "fr") for i in range(30)],
        "text string, lang string",
    )
    row = mannwhitney_u(df, positive="en").collect()[0]
    assert int(row.u1_x2) == row.n1 * row.n2
    assert row.z == 0.0


def test_theil_sen_kendall_textbook_reference(spark):
    """Median pairwise slope and tau-b recomputed with stdlib floats on
    a small series with one wild outlier day: Theil-Sen must shrug the
    outlier off (stay near the true slope 3) while the OLS slope
    doesn't; tau matches the pair-count formula."""
    import math
    from statistics import median

    from cassandra_ttl_remover_spark.operators.ml import theil_sen_kendall

    xs = [3 * t + (1000 if t == 7 else 0) for t in range(1, 13)]
    df = spark.createDataFrame(
        [(f"2026-01-{t:02d}", x) for t, x in zip(range(1, 13), xs)],
        "day string, x long",
    )
    row = theil_sen_kendall(df).collect()[0]
    n = len(xs)
    slopes = sorted(
        (xs[j] - xs[i]) / (j - i)
        for i in range(n) for j in range(i + 1, n)
    )
    want_ts = median(slopes)
    got_ts = int(row.ts_num) / int(row.ts_den)
    assert abs(got_ts - want_ts) < 1e-12
    assert abs(row.theil_sen - want_ts) < 1e-12
    assert abs(got_ts - 3.0) < 1.0  # outlier-immune
    s = sum(
        (xs[j] > xs[i]) - (xs[j] < xs[i])
        for i in range(n) for j in range(i + 1, n)
    )
    n0 = n * (n - 1) // 2
    n2 = sum(
        xs[i] == xs[j] for i in range(n) for j in range(i + 1, n)
    )
    assert row.kendall_s == s and row.n_pairs == n0
    assert abs(row.kendall_tau - s / math.sqrt(n0 * (n0 - n2))) < 1e-12


def test_theil_sen_even_pair_count_averages_middles(spark):
    """4 points -> 6 pairs (even): the emitted unreduced fraction is the
    exact average of the two middle slopes."""
    from statistics import median

    from cassandra_ttl_remover_spark.operators.ml import theil_sen_kendall

    xs = [1, 5, 2, 9]
    df = spark.createDataFrame(
        [(f"2026-02-{t:02d}", x) for t, x in zip(range(1, 5), xs)],
        "day string, x long",
    )
    row = theil_sen_kendall(df).collect()[0]
    slopes = sorted(
        (xs[j] - xs[i]) / (j - i)
        for i in range(4) for j in range(i + 1, 4)
    )
    assert abs(int(row.ts_num) / int(row.ts_den) - median(slopes)) < 1e-12


def test_mannwhitney_ignores_null_text(spark):
    """NULL texts are excluded on both engines (Spark windows sort
    NULLS FIRST, DuckDB NULLS LAST — ranking them would shift every
    prefix sum differently per engine)."""
    from cassandra_ttl_remover_spark.operators.ml import mannwhitney_u

    base = [("aaa", "en"), ("bbbb", "fr"), ("cc", "en"), ("ddddd", "fr")]
    df = spark.createDataFrame(base, "text string, lang string")
    with_null = spark.createDataFrame(
        base + [(None, "en"), (None, "fr")], "text string, lang string"
    )
    assert (mannwhitney_u(df).collect()[0]
            == mannwhitney_u(with_null).collect()[0])
