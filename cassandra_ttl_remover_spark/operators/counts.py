"""Key-count / sketch operators (SURVEY.md §2.1 A1/A2/A3).

A1 — exact key count: the reference walks Index.db counting partition keys
before writing (countKeys — Cassandra3TTLRemover.java:149-165,
Cassandra2TTLRemover.java:145-159). Spark: distinct-count hash aggregate
with map-side partial aggregation.

A2 — approximate distinct count: the reference merges per-SSTable
HyperLogLogPlus(13,25) sketches from stats metadata
(NoTTLReader.java:152-216, merge :252-264). Spark's approx_count_distinct is
the same HLL++ family — rsd 0.0040625 ≈ 1.04/sqrt(2^13) matches the
reference's p=13 precision.

A3 — overlap/merge-gain estimate: cardinality of the union vs. sum of
per-source cardinalities (estimateCompactionGain — NoTTLReader.java:221-250).

Scale: all three are single-shuffle aggregates with partial (map-side)
combine; A2/A3 move only fixed-size sketch bytes per partition.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: rsd matching the reference's HyperLogLogPlus precision p=13
#: (1.04 / sqrt(2^13) — NoTTLReader.java:162).
REFERENCE_HLL_RSD = 1.04 / (2 ** 13) ** 0.5


def count_keys(df: DataFrame, key: str) -> int:
    """A1 — exact distinct key count (countKeys pre-pass analog)."""
    return df.select(key).distinct().count()


def approximate_key_count(df: DataFrame, key: str, rsd: float = REFERENCE_HLL_RSD) -> int:
    """A2 — HLL++ distinct estimate (getApproximateKeyCount analog)."""
    return int(df.select(F.approx_count_distinct(key, rsd).alias("n")).first()["n"])


def approximate_keys_for_range(df: DataFrame, key: str, lo, hi,
                               rsd: float = REFERENCE_HLL_RSD) -> int:
    """A2 per-range variant (estimatedKeysForRanges —
    NoTTLReader.java:1289-1299): range-filter first (pushes to the parquet
    scan), then the HLL++ estimate."""
    return approximate_key_count(df.filter(F.col(key).between(lo, hi)), key, rsd)


def estimate_merge_gain(sources: list[DataFrame], key: str,
                        rsd: float = REFERENCE_HLL_RSD) -> float:
    """A3 — estimateCompactionGain (NoTTLReader.java:221-250): cardinality of
    the merged key set divided by the sum of per-source cardinalities.
    1.0 = no overlap; lower = compaction/merge saves space."""
    per = [approximate_key_count(s, key, rsd) for s in sources]
    total = sum(per)
    if total == 0:
        return 1.0
    union = approximate_key_count(
        reduce(lambda a, b: a.unionByName(b), [s.select(key) for s in sources]), key, rsd
    )
    return union / total
