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


def _u32(e: str) -> str:
    return f"(({e}) & 4294967295)"


def _mul32(a: str, b: int) -> str:
    # 32-bit wrapping multiply via a HUGEINT (int128) intermediate
    return f"((CAST({a} AS HUGEINT) * {b} & 4294967295)::BIGINT)"


def _rotl32(x: str, r: int) -> str:
    return _u32(f"(({x}) << {r}) | (({x}) >> {32 - r})")


def murmur3_hash_oracle_expr(col: str, seed: int = 42) -> str:
    """DuckDB expression reproducing Spark's ``F.hash`` on a BIGINT column
    BIT-EXACTLY (verified): Murmur3_x86_32's hashLong — the long split into
    two 32-bit halves, each mixed as a block, finalized with len=8. All
    32-bit wrap-around arithmetic is emulated with masks (HUGEINT for the
    multiplies), and the result is returned UNSIGNED in [0, 2^32); Spark's
    signed int32 relates by ``h_signed = h - 2^32 if h >= 2^31``. For
    token-range semantics note ``pmod(h_signed, 2^31) == h & 0x7fffffff``.

    This makes the Murmur3 token-range scan (token_filter — the analog of
    the reference's hard-coded Murmur3Partitioner ranges,
    Cassandra3TTLRemover.java:69, NoTTLScanner.java:66-101) hash-checkable
    against the oracle rather than rows-only."""
    steps: list[tuple[str, str]] = []

    def step(name: str, expr: str) -> str:
        steps.append((name, expr))
        return name

    low = step("Qlow", _u32(col))
    high = step("Qhigh", _u32(f"({col}) >> 32"))
    h = str(seed)
    for half in (low, high):
        k1 = step(f"QkA{half}", _mul32(half, 0xCC9E2D51))
        k1 = step(f"QkB{half}", _rotl32(k1, 15))
        k1 = step(f"QkC{half}", _mul32(k1, 0x1B873593))
        h1 = step(f"QhA{half}", _u32(f"xor({h}, {k1})"))
        h1 = step(f"QhB{half}", _rotl32(h1, 13))
        h = step(f"QhC{half}", _u32(f"{_mul32(h1, 5)} + 3864292196"))
    f_ = step("Qf0", _u32(f"xor({h}, 8)"))
    f_ = step("Qf1", _u32(f"xor({f_}, ({f_}) >> 16)"))
    f_ = step("Qf2", _mul32(f_, 0x85EBCA6B))
    f_ = step("Qf3", _u32(f"xor({f_}, ({f_}) >> 13)"))
    f_ = step("Qf4", _mul32(f_, 0xC2B2AE35))
    f_ = step("Qf5", _u32(f"xor({f_}, ({f_}) >> 16)"))
    expr = f_
    for name, e in reversed(steps):
        expr = expr.replace(name, f"({e})")
    return expr


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
