"""Text analysis: lang-id, quality, tokens, fingerprint."""

import pytest
import pyspark.sql.functions as F

from cassandra_ttl_remover_spark.operators import text


def test_lang_id_obvious_sentences(spark):
    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat and it is happy"),
            (1, "der hund und die katze das ist gut"),
            (2, "el perro y la casa es una maravilla"),
            (3, "zzz qqq xxx"),  # no stopword hits anywhere
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.pred_lang for r in text.lang_id(spark, docs).collect()}
    assert got == {0: "en", 1: "de", 2: "es", 3: "und"}


def test_quality_score_bounds(documents):
    q = text.quality_score(documents)
    rows = q.collect()
    assert all(0.0 <= r.quality <= 1.0 for r in rows)
    assert all(r.n_words > 0 for r in rows)


def test_quality_empty_doc(spark):
    docs = spark.createDataFrame([(0, "")], "doc_id long, text string")
    r = text.quality_score(docs).collect()[0]
    assert r.n_words == 0 and r.avg_word_len is None


def test_token_counts(spark):
    docs = spark.createDataFrame([(0, "hello world 42 foo-bar")], "doc_id long, text string")
    r = text.token_counts(docs).collect()[0]
    assert r.ws_tokens == 4
    assert r.alnum_tokens == 5   # hello, world, 42, foo, bar
    assert r.bpe_tokens == 6     # hello, world, 42, foo, -, bar


def test_fingerprint_stable_under_local_edit(spark):
    a = "one two three four five six seven eight nine ten eleven twelve"
    b = a.replace("twelve", "thirteen")  # local tail edit
    docs = spark.createDataFrame([(0, a), (1, b), (2, "x y")], "doc_id long, text string")
    fp = {r.doc_id: r.fingerprint for r in text.fingerprint(docs).collect()}
    # min-shingle fingerprint usually survives a single-shingle change
    assert fp[0] == fp[1]
    assert len(fp[2]) == 32  # md5 fallback for short docs


def test_repetition_ratio_bounds_and_known_doc(spark):
    from cassandra_ttl_remover_spark.operators.text import repetition_ratio
    docs = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),       # 7 shingles, 3 distinct
            (2, "w x y z"),                 # 2 shingles, all distinct
            (3, "q"),                       # no shingles
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in repetition_ratio(docs).collect()}
    assert abs(out[1].dup_shingle_ratio - (1 - 3 / 7)) < 1e-12
    assert out[2].dup_shingle_ratio == 0.0
    assert out[3].dup_shingle_ratio is None  # undefined, not fabricated
    assert abs(out[1].dup_word_ratio - (1 - 3 / 9)) < 1e-12


def test_scrub_pii_redacts_and_counts(spark):
    from cassandra_ttl_remover_spark.operators.text import scrub_pii
    docs = spark.createDataFrame(
        [
            (1, "mail me at jane.doe@example.com or call 5551234567 now"),
            (2, "clean text with short 123 number"),
            (3, "two mails: a@b.io c@d.org and 99999999"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in scrub_pii(docs).collect()}
    assert out[1].clean_text == "mail me at <email> or call <number> now"
    assert out[1].n_redactions == 2
    assert out[2].clean_text == "clean text with short 123 number"
    assert out[2].n_redactions == 0
    assert out[3].clean_text == "two mails: <email> <email> and <number>"
    assert out[3].n_redactions == 3


def test_bigram_freq_quality_known_counts(spark):
    from cassandra_ttl_remover_spark.operators.text import bigram_freq_quality
    docs = spark.createDataFrame(
        # bigrams: doc1 {a b, b a}, doc2 {a b, b c}, doc3 {x} -> none
        [(1, "a b a"), (2, "a b c"), (3, "x")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: (r.n_bigrams, r.sum_freq, r.mean_freq)
            for r in bigram_freq_quality(docs).collect()}
    # corpus: 'a b' x2, 'b a' x1, 'b c' x1
    assert rows == {1: (2, 3, 1.5), 2: (2, 3, 1.5)}
    assert 3 not in rows  # single-word doc has no bigrams


def test_vocab_topk_counts_and_order(spark):
    from cassandra_ttl_remover_spark.operators.text import vocab_topk
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "a c c"), (3, "b a")],
        "doc_id long, text string",
    )
    rows = vocab_topk(docs, 3).collect()
    assert [(r.word, r.n_occurrences, r.n_docs) for r in rows] == [
        ("a", 4, 3), ("b", 2, 2), ("c", 2, 1),   # tie b/c broken by word asc
    ]
    plan = vocab_topk(docs, 3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_keyword_search_conjunctive(spark):
    from cassandra_ttl_remover_spark.operators.text import (
        build_term_index,
        keyword_search,
    )
    docs = spark.createDataFrame(
        [(1, "apple banana cherry"), (2, "apple banana"), (3, "apple"),
         (4, "banana apple apple")],
        "doc_id long, text string",
    )
    got = {r.doc_id for r in keyword_search(docs, ["apple", "banana"]).collect()}
    assert got == {1, 2, 4}
    # pre-built index path gives the same answer
    ix = build_term_index(docs)
    got_ix = {r.doc_id
              for r in keyword_search(docs, ["apple", "banana"], index=ix).collect()}
    assert got_ix == got
    # single-term degenerates to postings lookup
    assert {r.doc_id for r in keyword_search(docs, ["cherry"]).collect()} == {1}


def test_bm25_topk_hand_model_and_invariants(spark):
    """BM25 against a direct Python evaluation of the SAME rational
    formula (_bm25_exprs' derivation), plus the classic invariants:
    more occurrences of a term score higher at equal length, a longer
    document is penalized at equal tf, and a rarer term outweighs a
    common one."""
    from fractions import Fraction

    from cassandra_ttl_remover_spark.operators.text import bm25_topk

    corpus = [
        (0, "apple banana apple cherry"),
        (1, "apple banana cherry date"),
        (2, "banana banana banana banana"),
        (3, "apple cherry"),
        (4, "date date date date date date date date"),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    terms = ["apple", "cherry"]
    got = {r.doc_id: (r.n_matched, r.score)
           for r in bm25_topk(docs, terms, k=10).collect()}

    words = {i: t.split() for i, t in corpus}
    N = len(corpus)
    A = sum(len(w) for w in words.values())
    df = {t: sum(t in w for w in words.values()) for t in terms}

    def score(i):
        s = 0.0
        for t in terms:
            tf = words[i].count(t)
            if not tf:
                continue
            num = Fraction((2 * N - 2 * df[t] + 1) * 44 * A * tf)
            den = Fraction((2 * df[t] + 1)
                           * (20 * A * tf + 6 * A + 18 * N * len(words[i])))
            s += float(num) / float(den)
        return s

    want = {i: (sum(t in words[i] for t in terms), score(i))
            for i in words if any(t in words[i] for t in terms)}
    assert set(got) == set(want)
    for i in got:
        assert got[i][0] == want[i][0]
        assert abs(got[i][1] - want[i][1]) < 1e-15, (i, got[i], want[i])
    # invariants: doc0 (tf_apple=2) beats doc1 (tf=1, same dl); doc3
    # (dl=2) beats doc1 (dl=4, same tfs); all matched docs beat nothing
    assert got[0][1] > got[1][1]
    assert got[3][1] > got[1][1]
    # rarer term outweighs a common one: 'date' (df=2, best doc scores
    # ~2.48) vs 'banana' (df=3, best doc ~1.23) on single-term queries
    d = {r.doc_id: r.score for r in bm25_topk(docs, ["date"], k=10).collect()}
    b = {r.doc_id: r.score for r in bm25_topk(docs, ["banana"], k=10).collect()}
    assert d[4] > b[2]

    # top-k cut is deterministic: k=2 returns the two best by (score, id)
    top2 = [r.doc_id for r in bm25_topk(docs, terms, k=2).collect()]
    full = sorted(want, key=lambda i: (-want[i][1], i))[:2]
    assert top2 == full


def test_equidepth_histogram_properties(spark, documents):
    """Buckets are near-equal depth (SQL ntile remainder rule), ranges are
    ordered and non-overlapping, and counts sum to the corpus."""
    from cassandra_ttl_remover_spark.operators.text import equidepth_histogram

    n = documents.count()
    rows = sorted(equidepth_histogram(documents, n_buckets=8).collect(),
                  key=lambda r: r.bucket)
    assert [r.bucket for r in rows] == list(range(1, 9))
    assert sum(r.n for r in rows) == n
    lo, hi = n // 8, n // 8 + 1
    assert all(r.n in (lo, hi) for r in rows)
    for prev, cur in zip(rows, rows[1:]):
        assert prev.lo <= prev.hi <= cur.lo <= cur.hi


def test_bpe_segment_hand_example(spark):
    """'the then in' with the default merges: 'the'->th+e->the (1 token),
    'then'->the+n (2), 'in'->in (1)."""
    from cassandra_ttl_remover_spark.operators.text import bpe_segment

    df = spark.createDataFrame([(1, "the then in")], "doc_id long, text string")
    row = bpe_segment(df).first()
    assert row.n_words == 3
    assert row.n_subwords == 1 + 2 + 1


def test_bpe_merge_order_matters(spark):
    """Applying ('t','h') before ('th','e') is what makes 'the' a single
    token; without the first merge the second can never fire."""
    from cassandra_ttl_remover_spark.operators.text import bpe_segment

    df = spark.createDataFrame([(1, "the")], "doc_id long, text string")
    only_second = bpe_segment(df, merges=[("th", "e")]).first()
    assert only_second.n_subwords == 3  # 't h e' untouched
    both = bpe_segment(df, merges=[("t", "h"), ("th", "e")]).first()
    assert both.n_subwords == 1


def test_bpe_segment_matches_python_reference(spark):
    """Property check vs a direct Python BPE implementation on adversarial
    word shapes (repeats, overlapping merge targets, single chars)."""
    from cassandra_ttl_remover_spark.operators.text import (
        DEFAULT_BPE_MERGES,
        bpe_segment,
    )

    def py_bpe(word):
        # canonical BPE: whole-symbol, non-overlapping, left-to-right
        toks = list(word)
        for a, b in DEFAULT_BPE_MERGES:
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            toks = out
        return len(toks)

    texts = [
        "ththth the thethe",
        "in inn nin i n",
        "aaaa attth erer",
        "x the-end on,at",
        # boundary-spanning regression: after (t,h) fuses 'th', the old
        # substring replace let the later (a,t) rule match 'a t' ACROSS
        # the head of symbol 'th' ('ath' -> 1 token, 'tath' -> 2); whole
        # -symbol BPE keeps them at 2 and 3
        "ath tath atth atat",
    ]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_words, r.n_subwords) for r in bpe_segment(df).collect()}
    for i, t in enumerate(texts):
        words = [w for w in t.split(" ") if w]
        want = (len(words), sum(py_bpe(w) for w in words))
        assert got[i] == want, (t, got[i], want)


@pytest.mark.slow  # seal-gate tier (heavy equality/e2e sweep)
def test_bpe_train_batched_equals_sequential(spark):
    """The batch>1 mode's whole contract: merge-for-merge identity with
    the sequential loop (same pairs, same order, same recorded counts) —
    on the fixture corpus AND on corpora built to trip every clause of
    the acceptance rule: overlapping top pairs (must stop, not skip),
    equal-count ties at the cutoff (must truncate), a merge whose fused
    form collides with a later candidate's symbol (fused-form guard),
    and a tiny exhausted pair table (no-lookahead path)."""
    from cassandra_ttl_remover_spark.operators.text import bpe_train
    from tests.conftest import SF_DIR

    corpora = {
        # conflict chain: (x,y) dominates, (y,z)/(w,x) overlap it
        "overlap": ["x y z w x", "x y z", "w x y", "u v u v u v"],
        # fused-form collision: merging (a,b) mints 'ab' while a real
        # 'ab' symbol pair (ab,c) is also near the top
        "fused": ["a b c ab c ab c", "a b ab c", "q r q r q r q r"],
        # ties everywhere: four disjoint pairs at the same count
        "ties": ["a b", "c d", "e f", "g h", "a b", "c d", "e f", "g h"],
        # tiny: pair table exhausts below the lookahead
        "tiny": ["m n m n", "m n"],
    }
    for name, texts in corpora.items():
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        seq = [tuple(r) for r in bpe_train(df, n_merges=6).collect()]
        for b in (2, 4, 8):
            got = [tuple(r)
                   for r in bpe_train(df, n_merges=6, batch=b).collect()]
            assert got == seq, (name, b, got, seq)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    seq = [tuple(r) for r in bpe_train(docs, n_merges=8).collect()]
    got = [tuple(r) for r in bpe_train(docs, n_merges=8, batch=4).collect()]
    assert got == seq


def test_repetition_runs_hand_examples(spark):
    from cassandra_ttl_remover_spark.operators.text import repetition_runs

    rows = [
        (1, "a a a b a b"),   # run of three a's; "a a" and "a b" tie at 2
        (2, ""),              # degenerate: no tokens at all
        (3, "x"),             # one token: no bigrams, run of 1
        (4, "p q p q p q"),   # alternation: "p q" dominates, runs stay 1
        (5, "z  z   z"),      # multi-space splits: still three z tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.top_bigram_count, r.max_run)
           for r in repetition_runs(df).collect()}
    assert got[1] == (6, 2, 3)
    assert got[2] == (0, 0, 0)
    assert got[3] == (1, 0, 1)
    assert got[4] == (6, 3, 1)
    assert got[5] == (3, 2, 3)


def test_repetition_runs_exchange_budget(spark, documents):
    """The whole operator must cost at most the two aggregation exchanges
    (per-bigram, then per-doc) — the run-length fold rides the projection."""
    from cassandra_ttl_remover_spark.operators.text import repetition_runs
    from cassandra_ttl_remover_spark.plans import exchange_count

    assert exchange_count(repetition_runs(documents)) <= 2


def test_bpe_train_learns_expected_merges(spark):
    """Hand-checkable corpus: 'aa' dominates, then after fusing, 'aab'
    appears; the deterministic (count DESC, pair ASC) tie-break is pinned
    by the b/c tie in round 2."""
    from cassandra_ttl_remover_spark.operators.text import bpe_train

    rows = [
        (1, "aab aab aab"),
        (2, "aac aab"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r.merge_round, r.pair, r.pair_count)
           for r in bpe_train(df, n_merges=3).collect()]
    # distinct words: aab (cnt applies per distinct word, weighted by
    # occurrences: aab x4, aac x1) -> pairs: "a a" 5, "a b" 4, "a c" 1
    assert got[0] == (0, "a a", 5)
    # after fusing: "aa b" x4 (as distinct word aab), "aa c" x1
    assert got[1] == (1, "aa b", 4)
    assert got[2] == (2, "aa c", 1)


def test_bpe_train_agrees_with_segment_semantics(spark, documents):
    """The merges learned on the corpus, fed into bpe_segment, must
    reproduce bpe_segment's replace-chain behavior — train and apply
    share one greedy convention."""
    from cassandra_ttl_remover_spark.operators.text import (
        bpe_segment,
        bpe_train,
    )

    docs = documents.limit(40)
    merges = [tuple(r.pair.split(" ")) for r in
              bpe_train(docs, n_merges=2).collect()]
    assert len(merges) == 2 and all(len(m) == 2 for m in merges)
    seg = bpe_segment(docs, merges=merges).collect()
    # merging strictly reduces or preserves subword counts vs raw chars
    for r in seg:
        assert r.n_subwords >= r.n_words


def test_bpe_train_survives_hostile_tokens(spark):
    """Corpus tokens containing quotes and backslashes must not break the
    merge-application step (the learned pair is applied as a column
    value, never an interpolated SQL literal)."""
    from cassandra_ttl_remover_spark.operators.text import bpe_train

    rows = [
        (1, "a\\ a\\ a\\ a\\"),        # trailing-backslash token dominates
        (2, "it's it's it's"),          # embedded single quote
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r.merge_round, r.pair, r.pair_count)
           for r in bpe_train(df, n_merges=2).collect()]
    assert len(got) == 2
    assert all(c > 0 for _, _, c in got)


def test_pmi_bigrams_manual(spark):
    """Tiny corpus where 'new york' is a perfect collocation: lift =
    c_xy*T^2/(B*c_x*c_y) computed by hand."""
    from cassandra_ttl_remover_spark.operators import text as T

    df = spark.createDataFrame(
        [(1, "new york new york"), (2, "old town new york"), (3, "old old town")],
        "doc_id long, text string")
    rows = {(r.w1, r.w2): r for r in
            T.pmi_bigrams(df, k=10, min_count=1).collect()}
    ny = rows[("new", "york")]
    # T=11 tokens, B=8 bigrams, c(new)=3, c(york)=3, c_xy=3
    assert (ny.c_xy, ny.c_x, ny.c_y) == (3, 3, 3)
    assert float(ny.lift) == (3 * 11 * 11) / (8 * 3 * 3)
    # 'york new' happens once across doc boundaries -> lower lift
    assert float(rows[("york", "new")].lift) < float(ny.lift)


def test_pmi_bigrams_min_count_filters(spark):
    from cassandra_ttl_remover_spark.operators import text as T

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "c d")], "doc_id long, text string")
    got = {(r.w1, r.w2) for r in T.pmi_bigrams(df, k=10, min_count=2).collect()}
    assert got == {("a", "b")}


def test_winnow_fingerprints_matches_reference(spark):
    """Spark HOF winnowing equals a direct Python implementation,
    including the short-doc and all-ties boundary rules."""
    import hashlib

    from cassandra_ttl_remover_spark.operators import text as T

    texts = [(1, "a b c d e f g h i j k"), (2, "x y"), (3, "p q r"),
             (4, "a b c a b c a b c a b c"),
             (5, "one two three four five six seven")]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r.doc_id: (r.n_grams, r.n_selected, r.fp)
           for r in T.winnow_fingerprints(df, window=4).collect()}

    def ref(text, w=4):
        toks = [t for t in text.split(" ") if t]
        grams = ([" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)]
                 if len(toks) >= 3 else [])
        h = [hashlib.md5(g.encode()).hexdigest() for g in grams]
        if not h:
            return (0, 0, hashlib.md5(b"").hexdigest())
        sel = {}
        for j in range(max(len(h) - w + 1, 1)):
            win = h[j:j + w]
            sel[j + win.index(min(win))] = min(win)
        joined = ",".join(sel[p] for p in sorted(sel))
        return (len(h), len(sel), hashlib.md5(joined.encode()).hexdigest())

    for did, text in texts:
        assert got[did] == ref(text), did


def test_winnow_guarantee_shared_fingerprint(spark):
    """Any shared run of >= window+2 tokens forces a shared fingerprint
    (the winnowing guarantee)."""
    from cassandra_ttl_remover_spark.operators import text as T

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens >= 4+2
    df = spark.createDataFrame(
        [(1, "aa bb " + shared + " cc"), (2, shared + " xx yy zz")],
        "doc_id long, text string")
    # recompute selected hash SETS via the reference rule to compare
    import hashlib

    def sel_set(text, w=4):
        toks = [t for t in text.split(" ") if t]
        grams = [" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)]
        h = [hashlib.md5(g.encode()).hexdigest() for g in grams]
        out = set()
        for j in range(max(len(h) - w + 1, 1)):
            win = h[j:j + w]
            out.add(min(win))
        return out

    rows = {r.doc_id: r for r in T.winnow_fingerprints(df, window=4).collect()}
    assert rows[1].n_selected > 0 and rows[2].n_selected > 0
    assert sel_set("aa bb " + shared + " cc") & sel_set(shared + " xx yy zz")


def test_distinct_ngram_diversity_hand_counts(spark):
    """Hand-checkable corpus: repeated text collapses the distinct
    ratio; unique text keeps it at 1.0; short docs contribute zero
    n-grams for n > their token count."""
    from cassandra_ttl_remover_spark.operators.text import (
        distinct_ngram_diversity,
    )

    docs = spark.createDataFrame(
        [(1, "a b a b", "rep"), (2, "a b a b", "rep"),
         (3, "x y z", "uniq"), (4, "w", "uniq")],
        "doc_id long, text string, source string",
    )
    rows = {(r.source, r.n): r
            for r in distinct_ngram_diversity(docs, ns=(1, 2)).collect()}
    # rep unigrams: 8 total, {a, b} distinct
    assert rows[("rep", 1)].total_ngrams == 8
    assert rows[("rep", 1)].distinct_ngrams == 2
    # rep bigrams: 2 docs x 3 = 6 total, {'a b', 'b a'} distinct
    assert rows[("rep", 2)].total_ngrams == 6
    assert rows[("rep", 2)].distinct_ngrams == 2
    # uniq unigrams 4/4; bigrams: only doc 3 contributes (2), 'w' none
    assert rows[("uniq", 1)].distinct_ratio == 1.0
    assert rows[("uniq", 2)].total_ngrams == 2
    assert rows[("uniq", 2)].distinct_ngrams == 2


def test_gopher_rules_gates_and_edges(spark):
    """Each gate flips on its own threshold; empty doc fails totally;
    integer units are exact."""
    from cassandra_ttl_remover_spark.operators.text import gopher_rules

    docs = spark.createDataFrame(
        [
            (1, "the cat sat of and that have with extra words here now"),
            (2, "a b"),                              # too few words
            (3, "the of " + "x " * 20),              # mean wl < 3
            (4, "### !!! ??? " + "the of and " * 4), # alpha < 800? check
            (5, ""),                                 # empty
            (6, "supercalifragilistic expialidocious "
                "antidisestablishmentarianism " * 4),  # wl > 10, no stops
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in
            gopher_rules(docs, min_words=5, max_words=100).collect()}
    assert rows[1].passes_gopher is True
    assert rows[1].stop_hits >= 2 and rows[1].alpha_permille == 1000
    assert rows[2].passes_gopher is False  # n_words gate
    assert rows[3].passes_gopher is False  # word-length gate
    assert rows[3].mean_wl_milli < 3000
    assert rows[5].passes_gopher is False and rows[5].n_words == 0
    assert rows[6].passes_gopher is False  # stopword + word-length gates
    assert rows[6].stop_hits == 0 and rows[6].mean_wl_milli > 10_000
    # doc 4: symbols lower alpha share; exact permille arithmetic
    n4 = rows[4].n_words
    n_alpha = sum(1 for w in
                  "### !!! ??? the of and the of and the of and the of and"
                  .split() if any(c.isalpha() for c in w))
    assert rows[4].alpha_permille == n_alpha * 1000 // n4
    # duplicate-word fraction is reported exactly
    assert rows[4].dupe_permille == (n4 - 6) * 1000 // n4  # 6 distinct

    # keep_cols carries inputs through the one projection; min_stop_hits
    # parameterizes the stopword gate (0 = disabled, CCNet-style)
    kept = {r.doc_id: r for r in
            gopher_rules(docs, min_words=5, max_words=100,
                         keep_cols=("text",), min_stop_hits=0).collect()}
    assert kept[1].text.startswith("the cat")
    assert kept[6].passes_gopher is False   # still fails word-length
    assert kept[3].passes_gopher is False   # unrelated gates unaffected
    no_stop_doc = spark.createDataFrame(
        [(7, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string")
    r7 = gopher_rules(no_stop_doc, min_words=5, max_words=100,
                      min_stop_hits=0).collect()[0]
    assert r7.passes_gopher is True and r7.stop_hits == 0


def test_tokenizer_fertility_matches_bpe_segment_sums(spark, documents):
    """The card's per-domain totals must be EXACTLY the sums of
    bpe_segment's per-doc counts — same merge chain, one aggregation."""
    from cassandra_ttl_remover_spark.operators.text import (
        bpe_segment,
        tokenizer_fertility,
    )

    seg = {r.doc_id: r for r in bpe_segment(documents).collect()}
    langs = {r.doc_id: r.lang
             for r in documents.select("doc_id", "lang").collect()}
    card = {r.metric: r.value
            for r in tokenizer_fertility(documents).collect()}
    for dom in sorted(set(langs.values())):
        ids = [i for i, l in langs.items() if l == dom]
        n_words = sum(seg[i].n_words for i in ids)
        n_sub = sum(seg[i].n_subwords for i in ids)
        assert card[f"docs:{dom}"] == len(ids)
        assert card[f"ws_words:{dom}"] == n_words
        assert card[f"bpe_tokens:{dom}"] == n_sub
        assert card[f"fertility_permille:{dom}"] == (n_sub * 1000) // n_words
        # a merge table can only FUSE: tokens per word >= 1, and never
        # more than chars per word
        assert card[f"fertility_permille:{dom}"] >= 1000


def test_tokenizer_fertility_unions_onto_corpus_card(spark, documents):
    """The block slots into q_d13's card: same (metric, value) schema,
    disjoint metric names — the union is a valid long-format card."""
    from cassandra_ttl_remover_spark.operators.audit import corpus_card
    from cassandra_ttl_remover_spark.operators.text import (
        tokenizer_fertility,
    )

    card = corpus_card(documents)
    fert = tokenizer_fertility(documents)
    assert card.schema == fert.schema
    merged = card.unionByName(fert)
    names = [r.metric for r in merged.collect()]
    assert len(names) == len(set(names)), "metric names must stay disjoint"


def test_tokenizer_fertility_zero_shuffle_segmentation(spark, documents):
    """The segmentation must stay a per-row JVM projection: one exchange
    total (the per-domain aggregation), no Python boundary."""
    from cassandra_ttl_remover_spark.operators.text import (
        tokenizer_fertility,
    )
    from cassandra_ttl_remover_spark.plans import (
        exchange_count,
        formatted_plan,
    )

    out = tokenizer_fertility(documents)
    plan = formatted_plan(out)
    # fan_out's parallelism floor may add one repartition on the tiny
    # fixture; the per-domain aggregate adds one; the final orderBy adds
    # a range exchange over the <= 6*|domains|-row RESULT — never more,
    # and none of them move text
    assert exchange_count(out) <= 3
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
