"""Engine-free property check of the logistic-regression ORACLE: a pure-
Python spec model of the quantized GD loop (md5 bucketing, integer
fast-sigmoid residuals, truncating division) run against the DuckDB
oracle SQL over random corpora. Spark == oracle is already certified by
the parity gate at two SFs; this closes the remaining leg (oracle ==
spec) the way test_compaction_properties does for the merge oracle —
hammering tie, sign, empty-doc, and unseen-token edges hypothesis finds
faster than fixtures do.
"""

import hashlib

import pytest

pytest.importorskip("hypothesis")
duckdb = pytest.importorskip("duckdb")

from hypothesis import given, settings, strategies as st  # noqa: E402

from cassandra_ttl_remover_spark.operators import classify as C  # noqa: E402

DIM = 16
ITERS = 2


def _bucket(tok: str, dim: int) -> int:
    # the DSIR 3-nibble construction (curate._dsir_bucket_*)
    h = hashlib.md5(tok.encode("utf-8")).hexdigest()
    return (int(h[0], 16) * 256 + int(h[1], 16) * 16 + int(h[2], 16)) % dim


def _tdiv(a: int, b: int) -> int:
    # truncating division — Spark `div` / DuckDB `//` semantics
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _spec_logreg(docs: list[tuple[int, str, bool]], dim: int,
                 iters: int) -> dict[int, int]:
    """The module docstring's update rule, straight-line Python."""
    feats: dict[int, dict[int, int]] = {}
    ys: dict[int, int] = {}
    for did, text, y in docs:
        toks = [w for w in text.split(" ") if w != ""]
        if not toks:
            continue
        dl = len(toks)
        tf: dict[int, int] = {}
        for t in toks:
            b = _bucket(t, dim)
            tf[b] = tf.get(b, 0) + 1
        x = {b: _tdiv(n * C.LR_Q, dl) for b, n in tf.items()}
        x[-1] = C.LR_Q
        feats[did] = x
        ys[did] = 1 if y else 0
    if not feats:
        return {}
    n = len(feats)
    D = C.LR_S * C.LR_Q
    w = {b: 0 for x in feats.values() for b in x}
    for _ in range(iters):
        grad = {b: 0 for b in w}
        for did, x in feats.items():
            m = sum(w[b] * xq for b, xq in x.items())
            rq = _tdiv(((2 * ys[did] - 1) * (D + abs(m)) - m) * C.LR_R,
                       2 * (D + abs(m)))
            for b, xq in x.items():
                grad[b] += rq * xq
        w = {b: wv + _tdiv(C.LR_ETA * C.LR_S * grad[b],
                           n * C.LR_R * C.LR_Q)
             for b, wv in w.items()}
    return w


# small alphabet forces bucket collisions; '' and multi-space force the
# empty-token edge; repeated tokens force tf > 1
_token = st.sampled_from(["a", "b", "c", "dd", "e e", "", "zz", "q"])
_doc = st.lists(_token, min_size=0, max_size=8).map(" ".join)
_corpus = st.lists(
    st.tuples(st.booleans(), _doc), min_size=1, max_size=12
).map(lambda rows: [(i, t, y) for i, (y, t) in enumerate(rows)])


@settings(max_examples=60, deadline=None)
@given(_corpus)
def test_logreg_oracle_matches_spec_model(corpus):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR, "
                "lang VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?, ?)",
        [(i, t, "en" if y else "fr") for i, t, y in corpus],
    )
    sql = C.logreg_train_oracle_sql("lang = 'en'", dim=DIM, iters=ITERS)
    got = dict(con.execute(sql).fetchall())
    want = _spec_logreg(corpus, DIM, ITERS)
    assert got == want, f"oracle != spec for corpus {corpus}"
