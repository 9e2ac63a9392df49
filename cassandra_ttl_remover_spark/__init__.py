"""cassandra_ttl_remover_spark — a PySpark-native analytics engine with the
query/data-processing capabilities of instaclustr/cassandra-ttl-remover.

The reference (see /root/reference, SURVEY.md) is an offline rewrite tool for
Cassandra SSTables: scan every partition, rewrite expiring cells into live
cells (same value, same write timestamp, no TTL), preserve every tombstone,
and write the result sorted. This package re-expresses that pipeline — and
the surrounding operator surface (scans, range/point lookups, projections,
key counts, HLL sketches, sorted partitioned writes) — as idiomatic PySpark
DataFrame programs, then extends it with the large-scale pipeline operators a
100 TB training-data corpus needs: exact and fuzzy deduplication, similarity
search, text analysis, and multimodal column plumbing.

Design stance (SURVEY.md §7): a library of composable DataFrame->DataFrame
functions. Catalyst handles pushdown/pruning/codegen; we only add what Spark
does not have natively (liveness semantics, tombstone reconciliation,
order-preserving sink, sketch-based dedup).
"""

from cassandra_ttl_remover_spark.session import get_spark, configure_builder
from cassandra_ttl_remover_spark.schema import cql_to_struct_type, cell_struct
from cassandra_ttl_remover_spark.sources.scan import (
    discover_data_files,
    scan,
    scan_table,
    load_tables,
)
from cassandra_ttl_remover_spark.operators.liveness import (
    annotate_events,
    live_view,
    strip_ttl,
    cell_kind,
    strip_ttl_cells,
    live_view_cells,
)
from cassandra_ttl_remover_spark.sinks.writer import compact_small_files, write_sorted
from cassandra_ttl_remover_spark.operators.compact import compact_runs, merge_runs_lww
from cassandra_ttl_remover_spark.operators.dedup import (
    containment_pairs,
    dedup_against_corpus,
    exact_dedup,
    minhash_lsh_pairs,
    neardup_dedup,
    ngram_jaccard_pairs,
)
from cassandra_ttl_remover_spark.operators.similarity import (
    embedding_norms,
    topk_dot,
)
from cassandra_ttl_remover_spark.operators.curate import (
    curate_corpus,
    decontaminate,
    mix_corpus,
    mix_decisions,
    mix_report,
    pack_sequences,
    quality_cutoff,
    sample_fixed,
    sample_per_group,
)
from cassandra_ttl_remover_spark.operators.sessions import session_stats, sessionize
from cassandra_ttl_remover_spark.operators.text import (
    bigram_freq_quality,
    normalize_text,
    repetition_ratio,
    scrub_pii,
    unigram_freq_quality,
    vocab_topk,
)
from cassandra_ttl_remover_spark.plans import fan_out, salted_agg, skew_distinct_count
from cassandra_ttl_remover_spark import catalog

__all__ = [
    "catalog",
    "compact_runs",
    "curate_corpus",
    "decontaminate",
    "merge_runs_lww",
    "mix_corpus",
    "mix_decisions",
    "mix_report",
    "normalize_text",
    "pack_sequences",
    "quality_cutoff",
    "repetition_ratio",
    "sample_fixed",
    "sample_per_group",
    "scrub_pii",
    "session_stats",
    "sessionize",
    "vocab_topk",
    "fan_out",
    "salted_agg",
    "skew_distinct_count",
    "get_spark",
    "configure_builder",
    "cql_to_struct_type",
    "cell_struct",
    "discover_data_files",
    "scan",
    "scan_table",
    "load_tables",
    "annotate_events",
    "live_view",
    "strip_ttl",
    "cell_kind",
    "strip_ttl_cells",
    "live_view_cells",
    "write_sorted",
    "compact_small_files",
    "containment_pairs",
    "dedup_against_corpus",
    "exact_dedup",
    "minhash_lsh_pairs",
    "neardup_dedup",
    "ngram_jaccard_pairs",
    "embedding_norms",
    "topk_dot",
    "bigram_freq_quality",
    "unigram_freq_quality",
]

__version__ = "0.9.0"
