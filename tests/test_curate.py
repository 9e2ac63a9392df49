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


def test_decontaminate_flags_overlap(spark, documents):
    bench = documents.filter(F.col("doc_id") % 50 == 0)
    out = curate.decontaminate(documents, bench).cache()
    assert out.count() == documents.count()  # verdict for EVERY doc

    # a benchmark doc with >= 1 shingle is fully self-contaminated
    from cassandra_ttl_remover_spark.operators.dedup import shingle_frame
    bench_with_sh = shingle_frame(bench).select("doc_id").distinct()
    dirty_bench = out.join(bench_with_sh, "doc_id", "left_semi")
    assert dirty_bench.filter(F.col("is_clean")).count() == 0

    # clean docs have zero overlap, dirty docs at least one
    assert out.filter(F.col("is_clean") & (F.col("n_contaminated") > 0)).count() == 0
    assert out.filter(~F.col("is_clean") & (F.col("n_contaminated") == 0)).count() == 0

    # n_contaminated is bounded by the doc's own distinct shingle count
    sizes = (
        shingle_frame(documents)
        .groupBy("doc_id")
        .agg(F.count("*").alias("sz"))
    )
    assert (
        out.join(sizes, "doc_id")
        .filter(F.col("n_contaminated") > F.col("sz"))
        .count()
        == 0
    )


def test_decontaminate_shuffle_path_matches_broadcast(spark, documents):
    bench = documents.filter(F.col("doc_id") % 50 == 0)
    a = curate.decontaminate(documents, bench)
    b = curate.decontaminate(documents, bench, broadcast_benchmark=False,
                             hash_shingles=False)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
