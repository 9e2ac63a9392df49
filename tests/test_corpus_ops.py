"""Unit tests for the corpus-statistics / chunking / split / incremental-dedup
operators (text.unigram_freq_quality, text.tfidf_topk, text.chunk_sliding,
curate.hash_split, dedup.dedup_against_corpus)."""

import pyspark.sql.functions as F

from cassandra_ttl_remover_spark.operators import curate, dedup, text


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_unigram_freq_quality_hand_computed(spark):
    # corpus: "a a b" and "a c": freqs a=3, b=1, c=1
    df = _docs(spark, [(1, "a a b"), (2, "a c")])
    out = {r.doc_id: r for r in text.unigram_freq_quality(df).collect()}
    assert out[1].n_tokens == 3 and out[1].sum_freq == 3 + 3 + 1
    assert out[2].n_tokens == 2 and out[2].sum_freq == 3 + 1
    assert out[2].mean_freq == 2.0


def test_unigram_freq_quality_drops_empty(spark):
    df = _docs(spark, [(1, "x"), (2, ""), (3, "  ")])
    ids = {r.doc_id for r in text.unigram_freq_quality(df).collect()}
    assert ids == {1}


def test_tfidf_topk_ranks_rare_terms_first(spark):
    # "cat" appears in both docs (df=2); "dog"/"emu" are unique (df=1).
    df = _docs(spark, [(1, "cat cat dog"), (2, "cat emu emu emu")])
    out = text.tfidf_topk(df, k=2).collect()
    top = {r.doc_id: [x.term for x in sorted(out, key=lambda y: y.rank)
                      if x.doc_id == r.doc_id] for r in out}
    # doc1: dog tf=1 df=1 score=2; cat tf=2 df=2 score=2 -> tie broken term asc
    assert top[1] == ["cat", "dog"]
    # doc2: emu tf=3 df=1 score=6 beats cat tf=1 df=2 score=1
    assert top[2] == ["emu", "cat"]


def test_chunk_sliding_covers_and_overlaps(spark):
    words = " ".join(f"w{i}" for i in range(100))
    df = _docs(spark, [(1, words)])
    chunks = sorted(text.chunk_sliding(df, window=64, stride=48).collect(),
                    key=lambda r: r.chunk_id)
    assert [c.chunk_id for c in chunks] == [0, 1]
    assert chunks[0].n_words == 64 and chunks[1].n_words == 52
    # stride overlap: chunk 1 starts at word 48
    assert chunks[1].chunk.split()[0] == "w48"
    # full coverage: union of chunk words == original words
    got = set(chunks[0].chunk.split()) | set(chunks[1].chunk.split())
    assert got == set(words.split())


def test_chunk_sliding_short_doc_single_chunk(spark):
    df = _docs(spark, [(1, "only three words")])
    chunks = text.chunk_sliding(df, window=64, stride=48).collect()
    assert len(chunks) == 1
    assert chunks[0].chunk == "only three words" and chunks[0].n_words == 3


def test_chunk_sliding_zero_shuffle(spark):
    df = _docs(spark, [(1, "a b c")])
    plan = text.chunk_sliding(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_hash_split_stable_under_other_rows(spark, documents):
    full = curate.hash_split(documents).select("doc_id", "split")
    half = curate.hash_split(documents.filter(F.col("doc_id") % 2 == 0)).select(
        "doc_id", "split"
    )
    # removing the odd rows must not move any even row's split
    moved = full.join(half, "doc_id").filter(
        full["split"] != half["split"]
    )
    assert moved.count() == 0


def test_hash_split_proportions(spark, documents):
    counts = {
        r.split: r.n
        for r in curate.hash_split_counts(documents).collect()
    }
    n = sum(counts.values())
    assert n == documents.count()
    # 80/10/10 within generous tolerance at n=500
    assert 0.7 < counts["train"] / n < 0.9
    assert counts.get("valid", 0) > 0 and counts.get("test", 0) > 0


def test_dedup_against_corpus(spark):
    corpus = _docs(spark, [
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (4, "completely unrelated corpus material about spark physical plans"),
    ])
    batch = _docs(spark, [
        # exact duplicate of corpus doc 2
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        # near duplicate: one word changed
        (3, "the quick brown fox leaps over the lazy dog again and again"),
        # novel
        (5, "genuinely new content that matches nothing in the corpus at all"),
    ])
    kept = sorted(
        r.doc_id
        for r in dedup.dedup_against_corpus(batch, corpus, max_hamming=6).collect()
    )
    assert kept == [5]


def test_dedup_against_corpus_no_corpus_text_in_output_plan(spark):
    corpus = _docs(spark, [(2, "aa bb cc")])
    batch = _docs(spark, [(1, "dd ee ff")])
    out = dedup.dedup_against_corpus(batch, corpus)
    assert out.columns == ["doc_id", "text"]
    assert [r.doc_id for r in out.collect()] == [1]


# ---------------------------------------------------------------------------
# Property-style invariants for the newest operators (random word soups)
# ---------------------------------------------------------------------------

def _word_soup_docs(spark, seed: int, n_docs: int = 8):
    import random

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(12)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 20))))
        for i in range(n_docs)
    ]
    return _docs(spark, rows)


def test_containment_dominates_jaccard_invariant(spark):
    # for any pair, max containment >= jaccard: inter/min(sza,szb) >=
    # inter/union. So at equal thresholds the containment pair set must be
    # a superset of the jaccard pair set — on arbitrary inputs.
    for seed in (7, 23, 91):
        docs = _word_soup_docs(spark, seed)
        thr = 0.4
        jac = {(r.a, r.b) for r in
               dedup.ngram_jaccard_pairs(docs, threshold=thr).collect()}
        cont = {(r.a, r.b) for r in
                dedup.containment_pairs(docs, threshold=thr).collect()}
        assert jac <= cont, f"seed {seed}: jaccard pair missing from containment"


def test_bigram_quality_invariants(spark):
    # n_bigrams == n_words - 1 for docs with >= 2 words; mean_freq >= 1
    # (every bigram occurs at least once — itself)
    for seed in (3, 44):
        docs = _word_soup_docs(spark, seed)
        words = {
            r.doc_id: len([w for w in r.text.split(" ") if w])
            for r in docs.collect()
        }
        out = {r.doc_id: r for r in text.bigram_freq_quality(docs).collect()}
        for d, nw in words.items():
            if nw >= 2:
                assert out[d].n_bigrams == nw - 1
                assert out[d].mean_freq >= 1.0
            else:
                assert d not in out


def test_ngram_novelty_scoring(spark):
    from cassandra_ttl_remover_spark.operators.dedup import ngram_novelty

    corpus = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),  # all seen
            (3, "completely new material about something else entirely"),
            (5, "the quick brown fox went somewhere new today"),  # mixed
            (7, "too short"),  # < 3 words: no shingles
        ],
        "doc_id long, text string",
    )
    r = {x.doc_id: x for x in ngram_novelty(batch, corpus).collect()}
    assert set(r) == {1, 3, 5, 7}
    assert r[1].n_novel == 0 and r[1].novelty_permille == 0
    assert r[3].n_novel == r[3].n_ngrams > 0 and r[3].novelty_permille == 1000
    assert 0 < r[5].n_novel < r[5].n_ngrams
    assert r[5].novelty_permille == r[5].n_novel * 1000 // r[5].n_ngrams
    assert r[7].n_ngrams == 0 and r[7].novelty_permille == 0
