"""Corpus-curation pipeline (operators/curate.py): stage gates compose and
the kept set is exactly the per-stage intersection."""

import pyspark.sql.functions as F

from cassandra_ttl_remover_spark.operators import curate, dedup, text


def test_curate_stages_compose(spark, documents):
    kept = curate.curate_corpus(spark, documents).cache()
    n_total, n_kept = documents.count(), kept.count()
    assert 0 < n_kept < n_total

    # every kept doc passes both gates
    assert kept.filter(F.col("quality") < 0.5).count() == 0
    assert kept.filter(F.col("pred_lang") != "en").count() == 0

    # no two kept docs share content (exact) or form a near-dup pair (fuzzy)
    ids = kept.select("doc_id")
    surviving = documents.join(ids, "doc_id", "left_semi")
    assert (
        dedup.exact_dedup(surviving).filter(F.col("n_copies") > 1).count() == 0
    )
    assert (
        dedup.ngram_jaccard_pairs(surviving, threshold=0.5).count() == 0
    )


def test_curate_lsh_path_runs_and_filters(spark, documents):
    # the 100 TB candidate generator: same gates, MinHash-LSH fuzzy stage
    kept = curate.curate_corpus(spark, documents, use_lsh=True)
    n_total, n_kept = documents.count(), kept.count()
    assert 0 < n_kept < n_total
    assert kept.filter(F.col("quality") < 0.5).count() == 0
