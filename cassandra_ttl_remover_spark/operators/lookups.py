"""Scan-restriction operators (SURVEY.md §2.1 S3/S4/S5/S6).

The reference implements these against its own storage machinery: token-range
scan with index-summary binary search + seek (NoTTLScanner.java:66-101,
NoTTLReader.java:1420-1448), bloom-filter/key-cache point lookup
(getPosition — NoTTLReader.java:1502-1665), successor lookup
(firstKeyBeyond — NoTTLReader.java:1680-1715), and named-column reads via
column index blocks (NoTTLSSTableNamesIterator.java:29-131).

Spark-first: these are *declarative* — a filter/projection whose pushdown to
parquet row-group stats / bloom filters / column chunks is Catalyst's job.
The functions below are thin, typed wrappers that (a) document the mapping,
(b) give the engine a stable API surface, and (c) are verified for pushdown
in tests (tests/test_lookups_and_plan.py asserts PushedFilters / ReadSchema
in the physical plan — the analog of "the seek actually happened").
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def range_scan(df: DataFrame, key: str, lo, hi) -> DataFrame:
    """S3 — restrict a scan to a key range. Parquet min/max row-group
    statistics skip non-overlapping groups (zone-map analog of the
    reference's index-summary binary search, NoTTLReader.java:1544-1575)."""
    return df.filter(F.col(key).between(F.lit(lo), F.lit(hi)))


def point_lookup(df: DataFrame, key: str, value) -> DataFrame:
    """S4 — single-key fetch. Pushdown order mirrors the reference's
    bloom -> summary -> index chain (NoTTLReader.java:1521-1575): parquet
    bloom filter (if written), then row-group stats, then dictionary."""
    return df.filter(F.col(key) == F.lit(value))


def first_key_beyond(df: DataFrame, key: str, value) -> DataFrame:
    """S5 — smallest key strictly greater than ``value``
    (firstKeyBeyond — NoTTLReader.java:1680-1715) as a top-1:
    filter + orderBy + limit, which Spark executes as a TakeOrdered
    (per-partition top-k then driver merge — no full sort)."""
    return df.filter(F.col(key) > F.lit(value)).orderBy(F.col(key).asc()).limit(1)


def named_columns(df: DataFrame, key: str, value, columns: list[str]) -> DataFrame:
    """S6 — named-column point read: fetch only ``columns`` of one partition
    (NoTTLSSTableNamesIterator.java:29-131). Column pruning reaches the
    parquet footer (ReadSchema), so unread column chunks are never fetched —
    the exact analog of reading only the requested column index blocks."""
    return df.filter(F.col(key) == F.lit(value)).select(key, *columns)


def token_filter(df: DataFrame, key: str, lo_token: int, hi_token: int,
                 num_buckets: int = 1 << 31) -> DataFrame:
    """S3 variant — hash-token range restriction (Murmur3Partitioner token
    ranges, Cassandra3TTLRemover.java:69; wrap-around handled like
    NoTTLScanner.addRange, NoTTLScanner.java:66-101). Spark's hash() is the
    same Murmur3 family. Wrap-around (lo > hi) selects the complement span.
    """
    tok = F.pmod(F.hash(F.col(key)), F.lit(num_buckets))
    if lo_token <= hi_token:
        cond: Column = tok.between(F.lit(lo_token), F.lit(hi_token))
    else:
        cond = (tok >= F.lit(lo_token)) | (tok <= F.lit(hi_token))
    return df.filter(cond)


#: 60-bit engine-portable token: md5 of the key's string form, first 15 hex
#: nibbles folded into a bigint — identical arithmetic is expressible in any
#: engine with md5 + string ops, so token-range scans become oracle-checkable
#: (Murmur3 parity is impossible across engines; the SEMANTICS — a
#: deterministic hash-range restriction — is what this verifies).
PORTABLE_TOKEN_EXPR = (
    "aggregate(sequence(1, 15), 0L, (a, j) -> a * 16 + "
    "cast(instr('0123456789abcdef', substring(md5(cast({col} as string)), j, 1)) - 1 as bigint))"
)


def portable_token_oracle_expr(col: str) -> str:
    """DuckDB expression computing the identical 60-bit md5 token."""
    return (
        "list_sum(list_transform(range(1, 16), j -> "
        f"(strpos('0123456789abcdef', substr(md5(CAST({col} AS VARCHAR)), j, 1)) - 1)"
        " * (1::BIGINT << ((15 - j) * 4))))::BIGINT"
    )


def portable_token_filter(df: DataFrame, key: str, lo_token: int,
                          hi_token: int) -> DataFrame:
    """S3 variant with the portable token — same range/wrap-around semantics
    as token_filter, hash-matchable against the DuckDB oracle. Token domain
    is [0, 2^60)."""
    tok = F.expr(PORTABLE_TOKEN_EXPR.format(col=key))
    if lo_token <= hi_token:
        cond: Column = tok.between(F.lit(lo_token), F.lit(hi_token))
    else:
        cond = (tok >= F.lit(lo_token)) | (tok <= F.lit(hi_token))
    return df.filter(cond)
