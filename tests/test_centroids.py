"""Tests for group centroids and nearest-centroid assignment."""

import pyspark.sql.functions as F

from cassandra_ttl_remover_spark.operators import similarity


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_group_centroids_hand_computed(spark):
    df = _emb(spark, [
        (1, [1.0, 0.0], 0),
        (2, [0.0, 1.0], 0),
        (3, [2.0, 2.0], 1),
    ])
    out = {(r.label, r.dim): r for r in similarity.group_centroids(df).collect()}
    assert out[(0, 1)].sum_q == 1_000_000 and out[(0, 1)].n_vectors == 2
    assert out[(0, 1)].mean_q == 500_000.0
    assert out[(1, 1)].sum_q == 2_000_000 and out[(1, 2)].sum_q == 2_000_000


def test_assign_nearest_centroid_separated_clusters(spark):
    # two orthogonal clusters: every vector must re-assign to its own label
    rows = [(i, [1.0 + 0.01 * i, 0.0], 0) for i in range(5)]
    rows += [(10 + i, [0.0, 1.0 + 0.01 * i], 1) for i in range(5)]
    out = similarity.assign_nearest_centroid(_emb(spark, rows)).collect()
    assert len(out) == 10
    assert all(r.is_match for r in out)


def test_assign_nearest_centroid_flags_outlier(spark):
    # vec 99 is labelled 0 but sits on cluster 1: is_match must be False
    rows = [(i, [1.0, 0.0], 0) for i in range(4)]
    rows += [(10 + i, [0.0, 1.0], 1) for i in range(4)]
    rows += [(99, [0.0, 1.0], 0)]
    out = {r.vec_id: r for r in
           similarity.assign_nearest_centroid(_emb(spark, rows)).collect()}
    assert out[99].assigned == 1 and not out[99].is_match
    assert out[0].assigned == 0 and out[0].is_match


def test_assign_centroid_join_is_broadcast(spark, embeddings):
    plan = (
        similarity.assign_nearest_centroid(embeddings)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Broadcast" in plan
    # the scoring side must never sort-merge against the centroid table
    assert "SortMergeJoin" not in plan


def test_kmeans_recovers_clusters_from_noisy_start(spark):
    # two tight orthogonal clusters, but a THIRD of the labels are wrong;
    # two Lloyd iterations must converge to the true geometry
    rows = [(i, [1.0 + 0.01 * (i % 3), 0.0], 0 if i % 3 else 1) for i in range(9)]
    rows += [(100 + i, [0.0, 1.0 + 0.01 * (i % 3)], 1 if i % 3 else 0)
             for i in range(9)]
    out = {r.vec_id: r.cluster
           for r in similarity.kmeans_labels(_emb(spark, rows), iters=3).collect()}
    left = {out[i] for i in range(9)}
    right = {out[100 + i] for i in range(9)}
    assert len(left) == 1 and len(right) == 1 and left != right


def test_kmeans_zero_iters_is_input_labels(spark, embeddings):
    out = similarity.kmeans_labels(embeddings, iters=0)
    orig = embeddings.select(
        "vec_id", F.col("label").cast("long").alias("cluster")
    )
    assert out.exceptAll(orig).count() == 0


def test_centroid_similarity_matrix_matches_numpy(spark, embeddings):
    import numpy as np

    from cassandra_ttl_remover_spark.operators.similarity import (
        centroid_similarity_matrix,
    )

    emb = embeddings.limit(300)
    pdf = emb.toPandas()
    cents = {}
    for lab, grp in pdf.groupby("label"):
        x = np.stack(grp["embedding"].to_numpy()).astype(np.float64) * 1e6
        # Spark round() is half-away-from-zero, not banker's rint
        q = np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))
        cents[lab] = q.sum(axis=0)
    got = {(r.label_a, r.label_b): float(r.cos)
           for r in centroid_similarity_matrix(emb).collect()}
    for (a, b), cos in got.items():
        va, vb = cents[a], cents[b]
        want = float(va @ vb) / np.sqrt(float(va @ va) * float(vb @ vb))
        assert abs(cos - want) < 1e-9
    labs = sorted(cents)
    assert len(got) == len(labs) * (len(labs) - 1) // 2


def test_cosine_histogram_matches_numpy(spark, embeddings):
    import math

    import numpy as np

    from cassandra_ttl_remover_spark.operators.similarity import (
        cosine_histogram,
    )

    got = {r.bin: r.n_pairs
           for r in cosine_histogram(embeddings, sample_ids=60,
                                     bins=10).collect()}
    pdf = embeddings.filter("vec_id < 60").orderBy("vec_id").toPandas()
    x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64) * 1e6
    q = np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))
    want = {}
    for i in range(len(q)):
        for j in range(i + 1, len(q)):
            cos = float(q[i] @ q[j]) / math.sqrt(
                float(q[i] @ q[i]) * float(q[j] @ q[j]))
            b = min(int(math.floor((cos + 1.0) / 2.0 * 10)), 9)
            want[b] = want.get(b, 0) + 1
    assert got == want
    assert sum(got.values()) == 60 * 59 // 2


def test_int8_quantization_report_matches_numpy(spark, embeddings):
    """Per-dim bounds and 8-bit round-trip error equal a direct numpy
    recomputation with the same half-away-from-zero rounding."""
    import numpy as np

    from cassandra_ttl_remover_spark.operators.similarity import (
        int8_quantization_report,
    )

    emb = embeddings.limit(200)
    pdf = emb.toPandas()
    x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64) * 1e6
    xq = np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(np.int64)
    mn, mx = xq.min(axis=0), xq.max(axis=0)
    rng = (mx - mn).astype(np.float64)
    safe = np.where(rng == 0, 1.0, rng)

    def half_away(v):
        return np.where(v >= 0, np.floor(v + 0.5), np.ceil(v - 0.5))

    q8 = np.where(rng == 0, 0.0,
                  half_away((xq - mn).astype(np.float64) * 255.0 / safe))
    deq = np.where(rng == 0, mn,
                   mn + half_away(q8 * rng / 255.0)).astype(np.int64)
    err = np.abs(xq - deq)
    got = {r.dim: r for r in int8_quantization_report(emb).collect()}
    assert len(got) == x.shape[1]
    for d in range(x.shape[1]):
        r = got[d + 1]
        assert (r.mn_q, r.mx_q, r.n) == (mn[d], mx[d], x.shape[0]), d
        assert r.sum_abs_err == int(err[:, d].sum()), d
        assert r.max_abs_err == int(err[:, d].max()), d
        # and the codes genuinely fit in uint8
        assert 0 <= q8[:, d].max() <= 255
