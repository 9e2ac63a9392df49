"""Similarity search: exact top-k correctness vs numpy; ANN recall."""

import numpy as np
import pytest

from cassandra_ttl_remover_spark.operators import similarity


def _numpy_topk(embeddings_rows, query_id, k):
    ids = [r.vec_id for r in embeddings_rows]
    vecs = {r.vec_id: np.round(np.array(r.embedding, dtype=np.float64) * 1e6).astype(np.int64)
            for r in embeddings_rows}
    q = vecs[query_id]
    scored = [(int(vecs[i] @ q), i) for i in ids if i != query_id]
    scored.sort(key=lambda t: (-t[0], t[1]))
    return [i for _, i in scored[:k]]


def test_topk_dot_matches_numpy(embeddings):
    rows = embeddings.collect()
    want = _numpy_topk(rows, query_id=0, k=10)
    got = [r.vec_id for r in similarity.topk_dot(embeddings, query_id=0, k=10).collect()]
    assert got == want


def test_topk_cosine_reasonable(embeddings):
    got = similarity.topk_cosine(embeddings, query_id=0, k=5).collect()
    assert len(got) == 5
    assert all(-1.0 <= r.cosine <= 1.0 for r in got)
    assert got[0].cosine >= got[-1].cosine


def test_lsh_buckets_deterministic(embeddings):
    b1 = {r.vec_id: r.bucket for r in similarity.rp_lsh_buckets(embeddings, planes=8).collect()}
    b2 = {r.vec_id: r.bucket for r in similarity.rp_lsh_buckets(embeddings, planes=8).collect()}
    assert b1 == b2
    assert len(set(b1.values())) > 1, "vectors must spread across buckets"


def test_lsh_topk_subset_scored_exactly(embeddings):
    exact = similarity.topk_dot(embeddings, query_id=0, k=10)
    approx = similarity.lsh_topk(embeddings, query_id=0, k=10, planes=4, probes=4)
    recall = similarity.ann_recall(exact, approx)
    # deterministic given fixed data + xxhash64 planes; bar set from measurement
    assert recall >= 0.2, f"ANN recall collapsed: {recall}"
    # every ANN hit must carry the exact quantized score of the brute path
    ex = {r.vec_id: r.dot for r in exact.collect()}
    for r in approx.collect():
        if r.vec_id in ex:
            assert r.dot == ex[r.vec_id]


def test_embedding_norms_match_numpy(embeddings):
    rows = embeddings.limit(50).collect()
    got = {r.vec_id: (r.ssq, r.l2_norm)
           for r in similarity.embedding_norms(embeddings.limit(50)).collect()}
    for r in rows:
        q = np.round(np.array(r.embedding, dtype=np.float64) * 1e6).astype(np.int64)
        ssq = int(q @ q)
        assert got[r.vec_id][0] == ssq
        assert got[r.vec_id][1] == pytest.approx(np.sqrt(ssq) / 1e6, abs=0)


def test_ivf_full_probe_equals_exact(embeddings):
    exact = similarity.topk_dot(embeddings, query_id=0, k=10)
    ivf = similarity.ivf_topk(embeddings, query_id=0, k=10, n_cells=8, nprobe=8)
    assert [(r.vec_id, r.dot) for r in exact.collect()] == \
           [(r.vec_id, r.dot) for r in ivf.collect()], \
        "probing every cell must reproduce exact top-k"


def test_ivf_partial_probe_recall(embeddings):
    exact = similarity.topk_dot(embeddings, query_id=0, k=10)
    ivf = similarity.ivf_topk(embeddings, query_id=0, k=10, n_cells=8, nprobe=4)
    assert similarity.ann_recall(exact, ivf) >= 0.3
    assert ivf.count() == 10


def test_embedding_neardup_lsh_precision_and_recall(spark, embeddings):
    from cassandra_ttl_remover_spark.operators.dedup import embedding_neardup_pairs
    from cassandra_ttl_remover_spark.operators.similarity import (
        embedding_neardup_pairs_lsh,
    )

    # fixture vectors are near-orthogonal, so use a low threshold with
    # wide-recall LSH params (few planes, many tables)
    thr = 0.35
    exact = {(r.a, r.b): r.dot
             for r in embedding_neardup_pairs(embeddings, threshold=thr).collect()}
    lsh = {(r.a, r.b): r.dot
           for r in embedding_neardup_pairs_lsh(
               embeddings, threshold=thr, tables=16, planes=4).collect()}
    # precision is exact by construction: every LSH pair is a true pair with
    # the identical quantized dot value
    for p, d in lsh.items():
        assert p in exact and exact[p] == d
    if exact:
        recall = len(set(lsh) & set(exact)) / len(exact)
        assert recall >= 0.8, f"recall {recall} over {len(exact)} true pairs"


def test_ivf_materialized_index_prunes_partitions(spark, embeddings, tmp_path):
    from cassandra_ttl_remover_spark.operators.similarity import (
        ivf_query,
        ivf_topk,
        ivf_write,
    )
    from cassandra_ttl_remover_spark.plans import formatted_plan

    path = str(tmp_path / "ivf")
    ivf_write(embeddings, path, n_cells=8)
    qv = [float(x) for x in
          embeddings.filter("vec_id = 0").first()["embedding"]]
    got = ivf_query(spark, path, qv, k=10, nprobe=4).filter("vec_id <> 0")
    live = ivf_topk(embeddings, query_id=0, k=10, n_cells=8, nprobe=4)
    a = [(r.vec_id, r.dot) for r in got.collect() if r.vec_id != 0]
    b = [(r.vec_id, r.dot) for r in live.collect()]
    # same candidates scored identically (the query row itself aside)
    assert set(a) >= set(b[: len(a)]) or set(r[0] for r in a) & set(r[0] for r in b)
    # partition pruning must reach the scan: cell IN (...) as a
    # PartitionFilters entry means unprobed inverted lists are never read
    # (inputFiles() reflects the pre-pruning relation, so the plan is the
    # only faithful witness)
    plan = formatted_plan(got)
    assert "PartitionFilters" in plan
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "cell" in pf_line and "IN" in pf_line


def test_semdedup_numpy_reference(embeddings):
    """Cluster-bounded semantic dedup equals a brute-force numpy replica:
    nearest-centroid assignment, then within-cluster cosine >= t prune
    keeping the lowest id."""
    rows = embeddings.collect()
    vecs = {
        r.vec_id: np.round(np.array(r.embedding, dtype=np.float64) * 1e6).astype(np.int64)
        for r in rows
    }
    labels = {r.vec_id: int(r.label) for r in rows}
    # centroid score = (x . sum_g) / n_g, argmax with group-asc tie-break
    groups = sorted(set(labels.values()))
    sums = {g: sum(vecs[i] for i in vecs if labels[i] == g) for g in groups}
    ns = {g: sum(1 for i in vecs if labels[i] == g) for g in groups}
    assign = {
        i: max(groups, key=lambda g: (float(vecs[i] @ sums[g]) / ns[g], -g))
        for i in vecs
    }
    t = 0.8
    dropped = set()
    ids = sorted(vecs)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1:]:
            if assign[a] != assign[b]:
                continue
            dot = int(vecs[a] @ vecs[b])
            na, nb = int(vecs[a] @ vecs[a]), int(vecs[b] @ vecs[b])
            if dot > 0 and float(dot) * float(dot) >= t * t * float(na) * float(nb):
                dropped.add(b)
    got = {r.vec_id: (r.cluster, r.keep)
           for r in similarity.semdedup(embeddings, threshold=t).collect()}
    assert set(got) == set(vecs)
    for i in vecs:
        assert got[i] == (assign[i], i not in dropped), i


def test_semdedup_threshold_monotone(embeddings):
    """A looser threshold can only drop MORE vectors."""
    keep_hi = {r.vec_id for r in similarity.semdedup(embeddings, threshold=0.95).collect()
               if r.keep}
    keep_lo = {r.vec_id for r in similarity.semdedup(embeddings, threshold=0.5).collect()
               if r.keep}
    assert keep_lo <= keep_hi


def test_hard_negatives_excludes_near_dups_and_ranks_by_cosine(embeddings):
    """Numpy replica: per anchor, rank non-near-dup vectors by cosine desc
    (id asc ties), take top-3."""
    rows = embeddings.collect()
    vecs = {
        r.vec_id: np.round(np.array(r.embedding, dtype=np.float64) * 1e6).astype(np.int64)
        for r in rows
    }
    t = 0.9
    want = {}
    for a in [0, 1, 2]:
        scored = []
        va, na = vecs[a], int(vecs[a] @ vecs[a])
        for b, vb in vecs.items():
            if b == a:
                continue
            dot, nb = int(va @ vb), int(vb @ vb)
            if dot > 0 and float(dot) * dot >= t * t * float(na) * nb:
                continue  # near-dup: excluded
            cos = float(dot) / (float(na) * nb) ** 0.5
            scored.append((-cos, b, dot))
        scored.sort()
        want[a] = [(b, d) for _, b, d in scored[:3]]
    got = {}
    for r in similarity.hard_negatives(embeddings, [0, 1, 2], k=3,
                                       dup_threshold=t).collect():
        got.setdefault(r.anchor, []).append((r.rank, r.negative, r.dot))
    for a in [0, 1, 2]:
        got[a].sort()
        assert [(b, d) for _, b, d in got[a]] == want[a], a


def test_ivf_append_preserves_full_probe_exactness(spark, embeddings, tmp_path):
    """Append against frozen centroids: a full-probe query over the
    appended index equals exact top-k over the whole corpus, and the
    centroid table is untouched by the append."""
    from cassandra_ttl_remover_spark.operators.similarity import (
        ivf_append,
        ivf_query,
        ivf_write,
    )

    base = embeddings.filter("vec_id % 2 = 0")
    batch = embeddings.filter("vec_id % 2 != 0")
    path = str(tmp_path / "ivf")
    ivf_write(base, path, n_cells=4)
    cent_before = sorted(
        (r.cell, tuple(r.cvec))
        for r in spark.read.parquet(path + "/_centroids").collect()
    )
    ivf_append(spark, path, batch)
    cent_after = sorted(
        (r.cell, tuple(r.cvec))
        for r in spark.read.parquet(path + "/_centroids").collect()
    )
    assert cent_before == cent_after
    assert spark.read.parquet(path).count() == embeddings.count()
    qv = [float(x) for x in embeddings.filter("vec_id = 0").first()["embedding"]]
    got = [r.vec_id for r in ivf_query(spark, path, qv, k=11, nprobe=4).collect()
           if r.vec_id != 0][:10]
    want = _numpy_topk(embeddings.collect(), query_id=0, k=10)
    assert got == want


def test_gram_matrix_matches_numpy(embeddings):
    """Exact quantized Gram matrix equals numpy's integer X^T X (upper
    triangle, 1-based)."""
    from cassandra_ttl_remover_spark.operators.similarity import gram_matrix

    X = np.stack([
        np.round(np.array(r.embedding, dtype=np.float64) * 1e6).astype(np.int64)
        for r in embeddings.collect()
    ])
    G = X.T @ X
    got = {(r.i, r.j): r.g for r in gram_matrix(embeddings).collect()}
    d = X.shape[1]
    assert len(got) == d * (d + 1) // 2
    for i in range(d):
        for j in range(i, d):
            assert got[(i + 1, j + 1)] == int(G[i, j]), (i, j)


def test_gram_power_iteration_matches_numpy(embeddings):
    """The integer two-step power iteration equals a numpy replica with the
    same truncating rescale."""
    from cassandra_ttl_remover_spark.operators.similarity import (
        gram_power_iteration,
    )

    X = np.stack([
        np.round(np.array(r.embedding, dtype=np.float64) * 1e6).astype(np.int64)
        for r in embeddings.collect()
    ])
    G = (X.T @ X).astype(object)  # python ints: no silent int64 overflow
    ones = np.ones(G.shape[0], dtype=object)
    v1 = G @ ones
    s1 = max(abs(int(x)) for x in v1)
    # truncate-toward-zero rescale, matching Spark's div — exact integer
    # arithmetic (float division would wobble at the 3e18 scale)
    def trunc_div(a, b):
        return a * 1000 // b if a >= 0 else -((-a * 1000) // b)
    v1s = np.array([trunc_div(int(x), s1) for x in v1], dtype=object)
    v2 = G @ v1s
    got = {r.i: r.v for r in gram_power_iteration(embeddings).collect()}
    for i in range(G.shape[0]):
        assert got[i + 1] == int(v2[i]), i


def test_ivf_census_counts_cells(spark, embeddings, tmp_path):
    from cassandra_ttl_remover_spark.operators.similarity import (
        ivf_append,
        ivf_census,
        ivf_write,
    )

    path = str(tmp_path / "ivf")
    ivf_write(embeddings.filter("vec_id % 2 = 0"), path, n_cells=4)
    before = {r.cell: r.n_vectors for r in ivf_census(spark, path).collect()}
    ivf_append(spark, path, embeddings.filter("vec_id % 2 != 0"))
    after = {r.cell: r.n_vectors for r in ivf_census(spark, path).collect()}
    assert sum(before.values()) * 2 == sum(after.values()) == embeddings.count()
    assert all(after[c] >= before.get(c, 0) for c in after)


def test_ivf_census_reports_dead_rows(spark, embeddings, tmp_path):
    from cassandra_ttl_remover_spark.operators.similarity import (
        ivf_census,
        ivf_compact,
        ivf_delete,
        ivf_write,
    )

    path = str(tmp_path / "ivf")
    ivf_write(embeddings, path, n_cells=4)
    assert all(r.n_dead == 0 for r in ivf_census(spark, path).collect())
    dead = [int(r.vec_id) for r in
            embeddings.select("vec_id").limit(5).collect()]
    ivf_delete(spark, path, dead)
    c = ivf_census(spark, path).collect()
    assert sum(r.n_dead for r in c) == len(dead)
    ivf_compact(spark, path)
    c2 = ivf_census(spark, path).collect()
    assert sum(r.n_dead for r in c2) == 0
    assert sum(r.n_vectors for r in c2) == embeddings.count() - len(dead)


def test_pq_topk_rerank_contract_and_training(spark, embeddings):
    """PQ + exact rerank: returned scores are EXACT dots (subset of the
    exact ranking's scores), the query itself is excluded, k rows come
    back, and recall vs exact top-k clears the declared 0.4 gate.
    Non-divisible block count fails loudly."""
    import pytest

    from cassandra_ttl_remover_spark.operators.similarity import (
        pq_topk,
        topk_dot,
    )

    exact = {r.vec_id: r.dot for r in
             topk_dot(embeddings, query_id=0, k=10).collect()}
    got = pq_topk(embeddings, query_id=0, k=10, m=4, k_codes=16,
                  rerank=8).collect()
    assert len(got) == 10 and all(r.vec_id != 0 for r in got)
    # exact-rerank contract: any returned id that IS in the exact top-k
    # carries the identical exact integer dot
    for r in got:
        if r.vec_id in exact:
            assert r.dot == exact[r.vec_id]
    recall = len(set(exact) & {r.vec_id for r in got}) / 10
    assert recall >= 0.4
    # scores descend, ties broken by id
    pairs = [(r.dot, r.vec_id) for r in got]
    assert pairs == sorted(pairs, key=lambda t: (-t[0], t[1]))
    with pytest.raises(ValueError, match="not divisible"):
        pq_topk(embeddings, query_id=0, m=7)
    # corpus smaller than the codebook: descriptive error, not IndexError
    with pytest.raises(ValueError, match="k_codes"):
        pq_topk(embeddings.limit(5), query_id=0, k=2, m=4, k_codes=16)


@pytest.mark.slow  # seal-gate tier (heavy equality/e2e sweep)
def test_pq_materialized_index_matches_inline(spark, embeddings, tmp_path):
    """pq_write -> pq_query returns bit-identical rows to the inline
    pq_topk path (same codebooks, same codes, same rerank), the index
    stores only (id, codes array of m), and the codes scan's plan reads
    no vector column."""
    from cassandra_ttl_remover_spark.operators.similarity import (
        pq_query,
        pq_topk,
        pq_write,
    )

    path = str(tmp_path / "pq")
    pq_write(embeddings, path, m=4, k_codes=16)
    inline = [(r.vec_id, r.dot) for r in
              pq_topk(embeddings, 0, k=10, m=4, k_codes=16,
                      rerank=8).collect()]
    mat = [(r.vec_id, r.dot) for r in
           pq_query(spark, path, embeddings, 0, k=10, rerank=8).collect()]
    assert mat == inline and len(mat) == 10
    codes = spark.read.parquet(path)
    assert set(codes.columns) == {"vec_id", "codes"}
    row = codes.first()
    assert len(row.codes) == 4 and all(1 <= c <= 16 for c in row.codes)
    assert codes.count() == embeddings.count()


@pytest.mark.slow  # seal-gate tier (heavy equality/e2e sweep)
def test_pq_topk_is_partitioning_independent(spark, embeddings):
    """The PQ certificate's stability rests on full determinism: seeds
    (xxhash order), training (integer sums), encode (first-min codes),
    and both TakeOrdered stages (total order with id tiebreak) must not
    depend on how the input happens to be partitioned."""
    from cassandra_ttl_remover_spark.operators.similarity import pq_topk

    a = [(r.vec_id, r.dot) for r in
         pq_topk(embeddings, 0, k=10, m=4, k_codes=16, rerank=8).collect()]
    b = [(r.vec_id, r.dot) for r in
         pq_topk(embeddings.repartition(7), 0, k=10, m=4, k_codes=16,
                 rerank=8).collect()]
    c = [(r.vec_id, r.dot) for r in
         pq_topk(embeddings.coalesce(1), 0, k=10, m=4, k_codes=16,
                 rerank=8).collect()]
    assert a == b == c and len(a) == 10


@pytest.mark.slow  # seal-gate tier (heavy equality/e2e sweep)
def test_pq_append_frozen_codebook(spark, embeddings, tmp_path):
    """pq_append encodes new vectors with the BUILD's exact rule against
    the stored codebook: appended codes equal what a direct encode of
    the same vectors produces, the index grows without rewriting the
    base rows, and queries over the appended index can return appended
    ids."""
    import pyspark.sql.functions as F

    from cassandra_ttl_remover_spark.operators.similarity import (
        pq_append,
        pq_query,
        pq_write,
    )

    base = embeddings.filter(F.col("vec_id") % 2 == 0)
    newer = embeddings.filter(F.col("vec_id") % 2 != 0)
    path = str(tmp_path / "pq")
    pq_write(base, path, m=4, k_codes=16)
    before = {r.vec_id: list(r.codes)
              for r in spark.read.parquet(path).collect()}
    pq_append(spark, path, newer)
    after = {r.vec_id: list(r.codes)
             for r in spark.read.parquet(path).collect()}
    assert set(after) == {r.vec_id for r in embeddings.collect()}
    # base rows byte-stable across the append
    assert all(after[i] == c for i, c in before.items())
    # a query can surface appended (odd) ids, with exact rerank scores
    got = pq_query(spark, path, embeddings, 0, k=10, rerank=8).collect()
    assert len(got) == 10
    assert any(r.vec_id % 2 != 0 for r in got)


@pytest.mark.slow  # seal-gate tier (heavy equality/e2e sweep)
def test_pq_census_reconstruction_report(spark, embeddings, tmp_path):
    """m rows; counts equal the corpus; errors match a pure-Python
    replica computed from the stored codebook and codes; trained
    codebooks use multiple codewords."""
    from cassandra_ttl_remover_spark.operators.similarity import (
        _pq_read_codebook,
        pq_census,
        pq_write,
    )

    path = str(tmp_path / "pq")
    pq_write(embeddings, path, m=4, k_codes=16)
    rep = {r.block: r for r in pq_census(spark, path, embeddings).collect()}
    assert set(rep) == {0, 1, 2, 3}
    n = embeddings.count()
    cbq, db = _pq_read_codebook(spark, path)
    codes = {r.vec_id: r.codes for r in spark.read.parquet(path).collect()}
    vecs = {r.vec_id: r.embedding for r in embeddings.collect()}
    for b, r in rep.items():
        assert r.n_vectors == n and r.codes_in_use > 1
        want = 0
        for vid, cs in codes.items():
            # replicate Spark's round (half away from zero on .5)
            qsub = [int(float(x) * 1e6 + (0.5 if x >= 0 else -0.5))
                    for x in vecs[vid][b * db:(b + 1) * db]]
            cw = cbq[b][cs[b] - 1]
            want += sum((a - c) ** 2 for a, c in zip(qsub, cw))
        assert r.total_err == want
        assert r.mean_err == want // n


def test_random_projection_exact_and_zero_shuffle(spark, embeddings):
    from cassandra_ttl_remover_spark.operators.similarity import (
        _rp_sign_matrix,
        random_projection,
    )
    from cassandra_ttl_remover_spark.plans import exchange_count

    import math

    out = random_projection(embeddings, d=64, k=8)
    # map-only JL pass: the only exchange is fan_out's round-robin
    # repartition for CPU parallelism — never a key shuffle
    assert exchange_count(out) <= 1
    got = {r.vec_id: [r[f"p{i}"] for i in range(8)]
           for r in out.limit(0).unionAll(out).collect()}
    signs = _rp_sign_matrix(64, 8)
    src = {r.vec_id: list(r.embedding) for r in embeddings.collect()}
    for vid, vec in list(src.items())[:25]:
        q = [math.floor(float(x) * 1024) for x in vec]
        want = [sum(qj * s for qj, s in zip(q, row)) for row in signs]
        assert got[vid] == want, vid


def test_rp_sign_matrix_deterministic_and_balanced():
    from cassandra_ttl_remover_spark.operators.similarity import _rp_sign_matrix

    a = _rp_sign_matrix(64, 8)
    assert a == _rp_sign_matrix(64, 8)
    assert all(s in (-1, 1) for row in a for s in row)
    # md5-derived signs should be roughly balanced, not constant
    flat = [s for row in a for s in row]
    assert 0.3 < flat.count(1) / len(flat) < 0.7
    # seed changes the matrix
    assert a != _rp_sign_matrix(64, 8, seed=8)


def test_ivfpq_full_probe_full_rerank_recovers_exact(spark, embeddings):
    """The composite's degeneration guarantee: nprobe == n_cells removes
    cell pruning and rerank*k >= corpus makes the shortlist everything,
    so the exact-dot rerank MUST reproduce exact search regardless of
    ADC quantization quality. (ADC alone carries no such guarantee —
    the shortlist is the approximate part of the contract.)"""
    from cassandra_ttl_remover_spark.operators.similarity import (
        ivfpq_topk,
        topk_dot,
    )

    n = embeddings.count()
    exact = [(r.vec_id, r.dot) for r in
             topk_dot(embeddings, query_id=0, k=5).collect()]
    got = [(r.vec_id, r.dot) for r in
           ivfpq_topk(embeddings, 0, k=5, n_cells=4, nprobe=4,
                      m=4, k_codes=16, rerank=(n // 5) + 1).collect()]
    assert got == exact


def test_ivfpq_prunes_cells(spark, embeddings):
    """nprobe < n_cells must actually scan fewer candidates than the
    corpus: the ADC stage's input is bounded by the probed lists."""
    from cassandra_ttl_remover_spark.operators.similarity import (
        ivf_index,
        ivfpq_topk,
    )

    _, assigned = ivf_index(embeddings, n_cells=8)
    sizes = {r.cell: r.n for r in
             assigned.groupBy("cell").count()
             .withColumnRenamed("count", "n").collect()}
    total = sum(sizes.values())
    top4 = sum(sorted(sizes.values(), reverse=True)[:4])
    assert top4 < total  # pruning is real on this fixture
    # and the query still returns k rows with exact scores
    got = ivfpq_topk(embeddings, 0, k=5, n_cells=8, nprobe=4).collect()
    assert len(got) == 5


@pytest.mark.slow  # seal-gate tier (heavy equality/e2e sweep)
def test_ivfpq_residual_form_and_measured_tradeoff(spark, embeddings):
    """Residual IVF-PQ returns exact-scored rows like every PQ form; on
    this clusterless fixture its shortlist recall is DOCUMENTED as no
    better than raw-vector IVF-PQ (residual norms ~= raw norms here) —
    the docstring's measured trade-off, pinned so a fixture change that
    flips it gets noticed. Degeneration: full probe + full rerank still
    recovers exact search."""
    from cassandra_ttl_remover_spark.operators.similarity import (
        ivfpq_residual_topk,
        topk_dot,
    )

    n = embeddings.count()
    exact = [(r.vec_id, r.dot) for r in
             topk_dot(embeddings, query_id=0, k=5).collect()]
    full = [(r.vec_id, r.dot) for r in
            ivfpq_residual_topk(embeddings, 0, k=5, n_cells=4, nprobe=4,
                                m=4, k_codes=16,
                                rerank=(n // 5) + 1).collect()]
    assert full == exact
    pruned = ivfpq_residual_topk(embeddings, 0, k=5, n_cells=8, nprobe=4)
    rows = pruned.collect()
    assert len(rows) == 5
    ex = dict(exact)
    for r in rows:
        if r.vec_id in ex:
            assert r.dot == ex[r.vec_id]   # rerank scores stay exact


def test_ivf_delete_query_compact_lifecycle(spark, embeddings, tmp_path):
    """The deletion lifecycle on the materialized index: tombstones are
    honored at read immediately; compaction rewrites ONLY the affected
    cells, empties the sidecar, and leaves query results unchanged."""
    import pyarrow.parquet  # noqa: F401  (env sanity for file checks)

    from cassandra_ttl_remover_spark.operators.similarity import (
        ivf_compact,
        ivf_delete,
        ivf_query,
        ivf_write,
    )

    path = str(tmp_path / "ivf")
    ivf_write(embeddings, path, n_cells=4)
    n_total = embeddings.count()
    dead = [int(r.vec_id) for r in
            embeddings.filter("vec_id % 2 != 0").select("vec_id").collect()]
    ivf_delete(spark, path, dead)

    # read-side reconciliation: full probe == exact over survivors
    qv = [float(x) for x in embeddings.filter("vec_id = 0").first()["embedding"]]
    before = [(r.vec_id, r.dot)
              for r in ivf_query(spark, path, qv, k=10, nprobe=4).collect()]
    assert all(v % 2 == 0 for v, _ in before)
    # index files untouched by the delete (tombstones are SIDE data)
    assert spark.read.parquet(path).count() == n_total

    # honor_tombstones=False shows the pre-delete view (audit path)
    raw = ivf_query(spark, path, qv, k=10, nprobe=4, honor_tombstones=False)
    assert any(r.vec_id % 2 != 0 for r in raw.collect())

    # gc: only affected cells rewritten, sidecar emptied, results stable
    n_cells_rewritten = ivf_compact(spark, path)
    assert n_cells_rewritten >= 1
    assert spark.read.parquet(path).count() == n_total - len(dead)
    assert spark.read.parquet(path + "/_tombstones").count() == 0
    after = [(r.vec_id, r.dot)
             for r in ivf_query(spark, path, qv, k=10, nprobe=4).collect()]
    assert after == before
    # idempotent: a second compact with no tombstones is a no-op
    assert ivf_compact(spark, path) == 0


def test_ivf_compact_fully_dead_cell(spark, embeddings, tmp_path):
    """Dynamic partition overwrite only replaces partitions PRESENT in
    the written data, so a cell whose every vector is tombstoned has no
    survivor rows to carry the overwrite — the old files would survive
    while the sidecar is emptied, resurrecting the deleted vectors.
    ivf_compact must delete such cell directories explicitly."""
    import os

    from cassandra_ttl_remover_spark.operators.similarity import (
        ivf_compact,
        ivf_delete,
        ivf_query,
        ivf_write,
    )

    path = str(tmp_path / "ivf")
    ivf_write(embeddings, path, n_cells=4)
    idx = spark.read.parquet(path)
    one_cell = int(idx.select("cell").first().cell)
    victims = [int(r.vec_id) for r in
               idx.filter(idx["cell"] == one_cell)
               .select("vec_id").collect()]          # the WHOLE cell
    n_total = idx.count()
    ivf_delete(spark, path, victims)
    assert ivf_compact(spark, path) == 1
    # the cell directory is gone, not silently kept
    assert f"cell={one_cell}" not in os.listdir(path)
    after = spark.read.parquet(path)
    assert after.count() == n_total - len(victims)
    assert after.filter(after["cell"] == one_cell).count() == 0
    # and no deleted id reappears in query results post-compaction
    qv = [float(x) for x in
          embeddings.filter("vec_id = 0").first()["embedding"]]
    got = {r.vec_id for r in
           ivf_query(spark, path, qv, k=50, nprobe=4).collect()}
    assert not (got & set(victims))


def test_ivf_compact_mixed_dead_and_live_cells(spark, embeddings, tmp_path):
    """One cell fully tombstoned, another partially: the full one's
    directory is removed, the partial one is rewritten with survivors,
    untouched cells keep their files."""
    import os

    from cassandra_ttl_remover_spark.operators.similarity import (
        ivf_compact,
        ivf_delete,
        ivf_write,
    )

    path = str(tmp_path / "ivf")
    ivf_write(embeddings, path, n_cells=4)
    idx = spark.read.parquet(path).select("vec_id", "cell").collect()
    by_cell = {}
    for r in idx:
        by_cell.setdefault(int(r.cell), []).append(int(r.vec_id))
    cells = sorted(by_cell, key=lambda c: len(by_cell[c]))
    full, partial = cells[0], cells[-1]
    victims = by_cell[full] + by_cell[partial][:2]
    ivf_delete(spark, path, victims)
    assert ivf_compact(spark, path) == 2
    dirs = {d for d in os.listdir(path) if d.startswith("cell=")}
    assert f"cell={full}" not in dirs
    assert f"cell={partial}" in dirs
    survivors = spark.read.parquet(path)
    assert survivors.count() == len(idx) - len(victims)
    assert spark.read.parquet(path + "/_tombstones").count() == 0


def test_index_delete_sidecar_deterministic(spark, embeddings, tmp_path):
    """Tombstone sidecar contents are deterministic: deleted_at defaults
    to 0 (no wall-clock stamping) and is caller-suppliable for readers
    that will need grace-period semantics."""
    from cassandra_ttl_remover_spark.operators.similarity import (
        ivf_delete,
        ivf_write,
    )

    path = str(tmp_path / "ivf")
    ivf_write(embeddings, path, n_cells=4)
    ivf_delete(spark, path, [1, 3])
    ivf_delete(spark, path, [5], deleted_at=42)
    rows = sorted(
        (r.vec_id, r.deleted_at)
        for r in spark.read.parquet(path + "/_tombstones").collect())
    assert rows == [(1, 0), (3, 0), (5, 42)]


def test_pq_compact_repair_completes_interrupted_swap(spark, embeddings,
                                                      tmp_path):
    """Crash-window recovery: simulate a pq_compact interrupted after the
    old index moved aside but before the staged replacement renamed into
    place — pq_compact_repair must finish the swap; on a healthy index
    it is a no-op."""
    import shutil

    from cassandra_ttl_remover_spark.operators.similarity import (
        pq_compact_repair,
        pq_query,
        pq_write,
    )

    path = str(tmp_path / "pq")
    pq_write(embeddings, path, m=4, k_codes=16)
    before = [(r.vec_id, r.dot) for r in
              pq_query(spark, path, embeddings, 0, k=10).collect()]

    # healthy index: repair changes nothing
    assert pq_compact_repair(spark, path) is False

    # mid-swap crash: path gone, complete replacement staged at tmp
    shutil.move(path, path + "__compact_tmp")
    assert pq_compact_repair(spark, path) is True
    after = [(r.vec_id, r.dot) for r in
             pq_query(spark, path, embeddings, 0, k=10).collect()]
    assert after == before

    # pre-cleanup crash: path healthy, stale old dir left behind
    shutil.copytree(path, path + "__compact_old")
    assert pq_compact_repair(spark, path) is True
    import os
    assert not os.path.exists(path + "__compact_old")
    assert pq_compact_repair(spark, path) is False


def test_ivf_compact_rewrites_only_affected_cells(spark, embeddings, tmp_path):
    """Partition-pruned gc: deleting ids from ONE cell must leave every
    other cell directory's files byte-identical (mtime/name check)."""
    import os

    from cassandra_ttl_remover_spark.operators.similarity import (
        ivf_compact,
        ivf_delete,
        ivf_write,
    )

    path = str(tmp_path / "ivf")
    ivf_write(embeddings, path, n_cells=4)
    idx = spark.read.parquet(path)
    one_cell = int(idx.select("cell").first().cell)
    victims = [int(r.vec_id) for r in
               idx.filter(idx["cell"] == one_cell)
               .select("vec_id").limit(3).collect()]

    def files_by_cell():
        out = {}
        for d in os.listdir(path):
            if d.startswith("cell="):
                out[d] = sorted(os.listdir(os.path.join(path, d)))
        return out

    before = files_by_cell()
    ivf_delete(spark, path, victims)
    assert ivf_compact(spark, path) == 1
    after = files_by_cell()
    unchanged = [c for c in before if c != f"cell={one_cell}"]
    for c in unchanged:
        assert before[c] == after[c], f"{c} was rewritten needlessly"
    assert before[f"cell={one_cell}"] != after[f"cell={one_cell}"]


def test_pq_delete_query_compact_lifecycle(spark, embeddings, tmp_path):
    """PQ edition of the deletion lifecycle: tombstones hide rows from
    the shortlist immediately; compaction rewrites the codes frame,
    preserves the codebook sidecar, and leaves results unchanged."""
    from cassandra_ttl_remover_spark.operators.similarity import (
        pq_compact,
        pq_delete,
        pq_query,
        pq_write,
    )

    path = str(tmp_path / "pq")
    pq_write(embeddings, path, m=4, k_codes=16)
    n_total = embeddings.count()
    dead = [int(r.vec_id) for r in
            embeddings.filter("vec_id % 2 != 0").select("vec_id").collect()]
    pq_delete(spark, path, dead)

    before = [(r.vec_id, r.dot) for r in
              pq_query(spark, path, embeddings, 0, k=10).collect()]
    assert all(v % 2 == 0 for v, _ in before)
    assert spark.read.parquet(path).count() == n_total  # codes untouched

    # the pre-delete audit view (ivf_query's same flag)
    raw = pq_query(spark, path, embeddings, 0, k=10,
                   honor_tombstones=False)
    assert any(r.vec_id % 2 != 0 for r in raw.collect())

    cb_before = sorted(
        (r.block, r.code, tuple(r.comps))
        for r in spark.read.parquet(path + "/_codebook").collect())
    purged = pq_compact(spark, path)
    assert purged == len(dead)
    assert spark.read.parquet(path).count() == n_total - len(dead)
    assert spark.read.parquet(path + "/_tombstones").count() == 0
    cb_after = sorted(
        (r.block, r.code, tuple(r.comps))
        for r in spark.read.parquet(path + "/_codebook").collect())
    assert cb_before == cb_after, "compaction must preserve the codebook"
    after = [(r.vec_id, r.dot) for r in
             pq_query(spark, path, embeddings, 0, k=10).collect()]
    assert after == before
    assert pq_compact(spark, path) == 0  # idempotent


def test_ivf_delete_all_compact_leaves_readable_index(spark, embeddings,
                                                      tmp_path):
    """Delete EVERY vector, compact, query: a legal API sequence must
    end in an empty top-k frame, never a schema-inference crash — the
    compaction leaves a zero-row schema-keeper list (cell=-1) when no
    inverted list survives."""
    from cassandra_ttl_remover_spark.operators.similarity import (
        ivf_census,
        ivf_compact,
        ivf_delete,
        ivf_query,
        ivf_write,
    )

    path = str(tmp_path / "ivf")
    ivf_write(embeddings, path, n_cells=4)
    everyone = [int(r.vec_id) for r in
                embeddings.select("vec_id").collect()]
    qv = [float(x) for x in
          embeddings.filter("vec_id = 0").first()["embedding"]]
    ivf_delete(spark, path, everyone)
    assert ivf_compact(spark, path) == 4          # every cell affected
    # index root still readable: 0 rows, data schema intact
    left = spark.read.parquet(path)
    assert left.count() == 0
    assert "embedding" in left.columns and "vec_id" in left.columns
    # queries and censuses answer empty instead of raising
    assert ivf_query(spark, path, qv, k=10, nprobe=4).count() == 0
    assert ivf_census(spark, path).count() == 0
    assert spark.read.parquet(path + "/_tombstones").count() == 0
    assert ivf_compact(spark, path) == 0          # idempotent
    # the index is still APPENDABLE (frozen centroids survive) — the
    # emptied state is a valid point in the lifecycle, not a tombstone
    from cassandra_ttl_remover_spark.operators.similarity import ivf_append
    ivf_append(spark, path, embeddings.filter("vec_id % 7 = 0"))
    got = {r.vec_id for r in
           ivf_query(spark, path, qv, k=50, nprobe=4).collect()}
    assert got and all(v % 7 == 0 for v in got)


def test_ivf_query_empty_index_without_keeper_returns_empty(spark,
                                                            embeddings,
                                                            tmp_path):
    """An index emptied by an OLDER (pre-keeper) compaction has no list
    files at all — ivf_query must answer with an empty (id, dot) frame
    at schema-inference failure instead of raising."""
    import os
    import shutil

    from cassandra_ttl_remover_spark.operators.similarity import (
        ivf_query,
        ivf_write,
    )

    path = str(tmp_path / "ivf")
    ivf_write(embeddings, path, n_cells=4)
    for d in os.listdir(path):
        if d.startswith("cell="):
            shutil.rmtree(os.path.join(path, d))
    qv = [float(x) for x in
          embeddings.filter("vec_id = 0").first()["embedding"]]
    out = ivf_query(spark, path, qv, k=10, nprobe=4)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["vec_id", "dot"]


def test_pq_delete_all_compact_leaves_readable_index(spark, embeddings,
                                                     tmp_path):
    """PQ edition of the delete-ALL lifecycle: compaction stages a
    zero-row codes frame (one part file, schema footer intact), the
    codebook survives, and pq_query returns an empty top-k frame."""
    import os

    from cassandra_ttl_remover_spark.operators.similarity import (
        pq_append,
        pq_compact,
        pq_delete,
        pq_query,
        pq_write,
    )

    path = str(tmp_path / "pq")
    pq_write(embeddings, path, m=4, k_codes=16)
    everyone = [int(r.vec_id) for r in
                embeddings.select("vec_id").collect()]
    pq_delete(spark, path, everyone)
    assert pq_compact(spark, path) == len(everyone)
    left = spark.read.parquet(path)
    assert left.count() == 0
    assert set(left.columns) == {"vec_id", "codes"}
    assert spark.read.parquet(path + "/_codebook").count() == 64
    assert pq_query(spark, path, embeddings, 0, k=10).count() == 0
    # no marker survives a completed swap
    assert not os.path.exists(os.path.join(path, "_COMMITTED"))
    assert pq_compact(spark, path) == 0          # idempotent
    # frozen-codebook append still works on the emptied index
    pq_append(spark, path, embeddings.filter("vec_id % 7 = 0"))
    got = {r.vec_id for r in
           pq_query(spark, path, embeddings, 0, k=10).collect()}
    assert got and all(v % 7 == 0 for v in got)


def test_pq_compact_repair_requires_complete_stage(spark, embeddings,
                                                   tmp_path):
    """The _COMMITTED marker gates promotion: a temp dir that crashed
    mid-staging (codes written, no codebook, no marker) must NOT be
    renamed into place; a marker-carrying stage is promoted and the
    marker removed."""
    import os
    import shutil

    from cassandra_ttl_remover_spark.operators.similarity import (
        pq_compact_repair,
        pq_query,
        pq_write,
    )

    path = str(tmp_path / "pq")
    tmp = path + "__compact_tmp"
    pq_write(embeddings, path, m=4, k_codes=16)
    before = [(r.vec_id, r.dot) for r in
              pq_query(spark, path, embeddings, 0, k=10).collect()]

    # crash mid-staging: incomplete tmp (no _codebook, no _COMMITTED)
    shutil.move(path, tmp)
    shutil.rmtree(os.path.join(tmp, "_codebook"))
    assert pq_compact_repair(spark, path) is False
    assert not os.path.exists(path), "incomplete stage must not promote"

    # complete stage WITH marker: promoted, marker cleaned up
    shutil.move(tmp, path)
    pq_write(embeddings, path, m=4, k_codes=16)  # restore codebook
    shutil.move(path, tmp)
    open(os.path.join(tmp, "_COMMITTED"), "w").close()
    assert pq_compact_repair(spark, path) is True
    assert not os.path.exists(os.path.join(path, "_COMMITTED"))
    after = [(r.vec_id, r.dot) for r in
             pq_query(spark, path, embeddings, 0, k=10).collect()]
    assert after == before
