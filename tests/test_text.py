"""Text analysis: lang-id, quality, tokens, fingerprint."""

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
