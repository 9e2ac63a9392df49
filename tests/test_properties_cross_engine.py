"""Property-based cross-engine checks (hypothesis): the portable primitives
the oracles depend on must agree between Spark and DuckDB on RANDOM inputs,
not just the fixture values the declared queries happen to touch."""

from __future__ import annotations

import pytest

import duckdb
import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cassandra_ttl_remover_spark.operators.lookups import (
    PORTABLE_TOKEN_EXPR,
    murmur3_hash_oracle_expr,
    portable_token_oracle_expr,
)

# two-tier suite (pytest.ini): property/cross-engine sweeps are the
# seal gate, not the per-commit gate
pytestmark = pytest.mark.slow

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


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ids=st.lists(st.integers(min_value=0, max_value=2**40), min_size=1,
                    max_size=40, unique=True),
       seed=st.integers(min_value=0, max_value=1000),
       n_shards=st.integers(min_value=1, max_value=16))
def test_shuffle_deterministic_matches_python_replica(spark, ids, seed, n_shards):
    """Third-implementation check of the training-order shuffle: a pure
    Python md5-token replica must produce the identical (shard, pos) for
    every id — the engine-portability claim verified outside both SQL
    engines."""
    import hashlib

    from cassandra_ttl_remover_spark.operators.curate import (
        shuffle_deterministic,
    )

    def py_token(s: str) -> int:
        h = hashlib.md5(s.encode()).hexdigest()
        t = 0
        for ch in h[:15]:
            t = t * 16 + int(ch, 16)
        return t

    toks = {i: py_token(f"{seed}:{i}") for i in ids}
    by_shard = {}
    for i in ids:
        by_shard.setdefault(toks[i] % n_shards, []).append(i)
    want = {}
    for shard, members in by_shard.items():
        members.sort(key=lambda i: (toks[i], i))
        for pos, i in enumerate(members, start=1):
            want[i] = (shard, pos)

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r.doc_id: (r.shard, r.pos)
           for r in shuffle_deterministic(df, n_shards=n_shards,
                                          seed=seed).collect()}
    assert got == want


_WORDS = st.lists(
    st.text(alphabet="abcdef#!?", min_size=1, max_size=8),
    min_size=0, max_size=30,
)


@given(st.lists(_WORDS, min_size=1, max_size=8))
@_SETTINGS
def test_gopher_rules_match_duckdb_on_random_docs(spark, docs_words):
    """The Gopher battery must agree with its DuckDB oracle on RANDOM
    word soups (multi-space gaps, symbol-only tokens, empty docs) — not
    just the fixture's clean prose."""
    from cassandra_ttl_remover_spark.operators.text import (
        gopher_rules,
        gopher_rules_oracle_sql,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs_words)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_words, r.mean_wl_milli, r.alpha_permille,
                   r.dupe_permille, r.stop_hits, r.passes_gopher)
        for r in gopher_rules(sdf, min_words=2, max_words=20).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES "
                + ", ".join("(?, ?)" for _ in rows)
                + ") t(doc_id, text)",
                [x for row in rows for x in row])
    want = {
        r[0]: tuple(r[1:])
        for r in con.sql(
            gopher_rules_oracle_sql(min_words=2, max_words=20)
        ).fetchall()
    }
    assert got == want


@given(st.lists(_WORDS, min_size=2, max_size=8), st.integers(0, 7))
@_SETTINGS
def test_dsir_matches_duckdb_on_random_docs(spark, docs_words, tgt_mod):
    """DSIR's bucket hashing, smoothing, and integer rational must agree
    with DuckDB on random corpora and an arbitrary target split."""
    from cassandra_ttl_remover_spark.operators.curate import (
        dsir_importance,
        dsir_importance_oracle_sql,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs_words)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    tgt = sdf.filter(f"doc_id % 8 = {tgt_mod}")
    if tgt.count() == 0:
        tgt = sdf  # degenerate split: target = raw
        tgt_where = "TRUE"
    else:
        tgt_where = f"doc_id % 8 = {tgt_mod}"
    got = {
        r.doc_id: (r.n_features, r.target_mass, r.raw_mass,
                   r.importance_permille)
        for r in dsir_importance(sdf, tgt, buckets=64).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES "
                + ", ".join("(?, ?)" for _ in rows)
                + ") t(doc_id, text)",
                [x for row in rows for x in row])
    want = {
        r[0]: tuple(r[1:])
        for r in con.sql(dsir_importance_oracle_sql(
            target_where=tgt_where, buckets=64)).fetchall()
    }
    assert got == want


@given(st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
             min_size=0, max_size=30),
    min_size=1, max_size=6))
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_line_dedup_matches_python_replica(spark, docs_words):
    """r12: the C4 line-dedup rule against an independent pure-Python
    replica on RANDOM corpora — unlike span removal, lines never
    overlap, so the STRONG claim holds and is asserted: the canonical
    (globally first) occurrence of every repeated line survives,
    every other participating occurrence of a >= min_count line is
    removed, and nothing else ever is."""
    import hashlib
    import math

    B, MW, MC = 3, 2, 2
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs_words)],
        "doc_id long, text string")
    got = {r.doc_id: (r.n_lines, r.n_removed, r.cleaned_hash)
           for r in __import__(
               "cassandra_ttl_remover_spark.operators.dedup",
               fromlist=["dedup"]).line_dedup(
               df, block_tokens=B, min_words=MW, min_count=MC).collect()}

    # pure-Python replica
    lines = {}          # doc -> [line str]
    for i, ws in enumerate(docs_words):
        lines[i] = [" ".join(ws[j * B:(j + 1) * B])
                    for j in range(math.ceil(len(ws) / B))]
    occs = {}           # line -> [(doc, pos)] participating only
    for i, ls in lines.items():
        for p, l in enumerate(ls):
            if len([w for w in l.split(" ") if w]) >= MW:
                occs.setdefault(l, []).append((i, p))
    removed = {}
    for l, os_ in occs.items():
        if len(os_) >= MC:
            canon = min(os_)
            for o in os_:
                if o != canon:
                    removed.setdefault(o[0], set()).add(o[1])
    for i, ls in lines.items():
        kept = [l for p, l in enumerate(ls)
                if p not in removed.get(i, set())]
        want = (len(ls), len(removed.get(i, set())),
                hashlib.md5(" ".join(kept).encode()).hexdigest())
        assert got[i] == want, (i, got[i], want)
