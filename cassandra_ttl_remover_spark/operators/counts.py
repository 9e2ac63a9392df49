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


def estimate_intersection(a: DataFrame, b: DataFrame, key: str) -> DataFrame:
    """Distinct-key INTERSECTION estimate by inclusion–exclusion over HLL
    sketches: ``|A∩B| ≈ est(A) + est(B) − est(A∪B)``. Returns one row
    ``(est_small, est_large, est_union, est_intersection)`` — the two
    side estimates surfaced order-independently (min/max), and the
    intersection clamped at 0 (sketch noise can push the raw
    inclusion–exclusion difference slightly negative for disjoint sets).

    HLL sketches union losslessly but cannot intersect directly — the
    standard workaround is exactly this subtraction, whose error grows
    with ``|A∪B| / |A∩B|`` (three estimates' noise lands on a possibly
    small difference), so gate it with a tolerance proportional to the
    UNION when the intersection may be small.

    Scale: three sketch aggregations, each map-side mergeable (the same
    one-pass shape as q_a4's two-level merge); no exact distinct, no
    shuffle of raw keys beyond the sketch partials. At 100 TB this is the
    only affordable way to ask "how many users did both"."""
    # An EMPTY side aggregates to a NULL sketch; coalescing its estimate
    # to 0 (and skipping it in the union) keeps the identity honest —
    # min/max over the raw estimates would silently drop the NULL row and
    # report est_intersection ~ |B| for an empty A.
    sa = a.select(F.col(key).alias("k")).agg(F.hll_sketch_agg("k").alias("ska"))
    sb = b.select(F.col(key).alias("k")).agg(F.hll_sketch_agg("k").alias("skb"))
    est = sa.crossJoin(sb).select(
        F.coalesce(F.hll_sketch_estimate("ska"), F.lit(0)).alias("_ea"),
        F.coalesce(F.hll_sketch_estimate("skb"), F.lit(0)).alias("_eb"),
        F.coalesce(
            F.hll_sketch_estimate(
                F.when(F.col("ska").isNull(), F.col("skb"))
                .when(F.col("skb").isNull(), F.col("ska"))
                .otherwise(F.hll_union("ska", "skb"))
            ),
            F.lit(0),
        ).alias("est_union"),
    )
    return est.select(
        F.least("_ea", "_eb").alias("est_small"),
        F.greatest("_ea", "_eb").alias("est_large"),
        "est_union",
        F.greatest(
            F.lit(0).cast("long"),
            F.col("_ea") + F.col("_eb") - F.col("est_union"),
        ).alias("est_intersection"),
    )


def estimate_difference(a: DataFrame, b: DataFrame, key: str) -> DataFrame:
    """Distinct-key DIFFERENCE estimate ``|A \\ B| ≈ est(A∪B) − est(B)`` —
    completing the sketch set algebra (union: merge_gain/q_a4,
    intersection: q_a6, difference: this). Returns one row
    ``(est_a, est_b, est_union, est_difference)`` with the difference
    clamped at 0 (sketch noise can push it negative when A ⊆ B).

    HLL sketches union losslessly but cannot subtract directly; the
    identity above is the standard workaround, and like the intersection
    its error is proportional to the UNION estimate's noise — gate with
    a union-proportional tolerance when |A \\ B| may be small.

    Scale: three map-side-mergeable sketch aggregations, no exact
    distinct, no shuffle of raw keys beyond sketch partials."""
    sa = a.select(F.col(key).alias("k")).agg(F.hll_sketch_agg("k").alias("ska"))
    sb = b.select(F.col(key).alias("k")).agg(F.hll_sketch_agg("k").alias("skb"))
    est = sa.crossJoin(sb).select(
        F.coalesce(F.hll_sketch_estimate("ska"), F.lit(0)).alias("est_a"),
        F.coalesce(F.hll_sketch_estimate("skb"), F.lit(0)).alias("est_b"),
        F.coalesce(
            F.hll_sketch_estimate(
                F.when(F.col("ska").isNull(), F.col("skb"))
                .when(F.col("skb").isNull(), F.col("ska"))
                .otherwise(F.hll_union("ska", "skb"))
            ),
            F.lit(0),
        ).alias("est_union"),
    )
    return est.select(
        "est_a", "est_b", "est_union",
        F.greatest(
            F.lit(0).cast("long"),
            F.col("est_union") - F.col("est_b"),
        ).alias("est_difference"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch (portable-hash, exact-certificate form)
# ---------------------------------------------------------------------------

def countmin_estimates(docs: DataFrame, depth: int = 4, width: int = 256,
                       top: int = 20, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Count-min sketch frequency estimation over the corpus vocabulary,
    with its defining guarantee surfaced as a checkable certificate: for
    the ``top`` most frequent tokens, return the exact count, the CMS
    estimate (min over ``depth`` counters), and the one-sided-error flag
    ``est >= true`` that CMS can never violate.

    Completes the sketch family (HLL distinct / union / intersection /
    difference, Bloom membership) with the frequency sketch. The hash
    rows reuse the engine-portable 60-bit md5 token, so BOTH engines
    build the identical sketch and the estimates hash-match exactly —
    unlike library CMS implementations whose hash choices are private.

    Scale shape: the only corpus-sized pass is the word count (one
    partial-aggregated shuffle to the vocab frame). The sketch itself is
    built FROM the vocab (sum of word counts per (row, cell) — identical
    to streaming increments, since CMS cells are linear in the input),
    giving a depth x width counter table (~1k rows) that broadcasts to
    the probe lookups. At 100 TB nothing here grows beyond vocabulary
    size."""
    from pyspark.sql.functions import broadcast

    from cassandra_ttl_remover_spark.operators.lookups import (
        PORTABLE_TOKEN_EXPR,
    )
    from cassandra_ttl_remover_spark.operators.text import WORDS_EXPR
    from cassandra_ttl_remover_spark.plans import fan_out

    ws = WORDS_EXPR.format(col=text_col)
    counts = (
        fan_out(docs, id_col)
        .select(F.explode(F.expr(ws)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("true_count"))
    )
    spark = docs.sparkSession
    rows_df = spark.range(depth).select(F.col("id").cast("int").alias("i"))
    tok = PORTABLE_TOKEN_EXPR.format(col="concat(cast(i as string), ':', w)")
    cell = f"pmod({tok}, {width})"
    counters = (
        counts.crossJoin(broadcast(rows_df))
        .select("i", F.expr(cell).cast("long").alias("cell"), "true_count")
        .groupBy("i", "cell")
        .agg(F.sum("true_count").alias("cell_count"))
    )
    probes = (
        counts.orderBy(F.col("true_count").desc(), F.col("w").asc())
        .limit(top)
    )
    return (
        probes.crossJoin(broadcast(rows_df))
        .select("w", "true_count", "i",
                F.expr(cell).cast("long").alias("cell"))
        .join(broadcast(counters), ["i", "cell"])
        .groupBy("w", "true_count")
        .agg(F.min("cell_count").cast("long").alias("cms_est"))
        .select(
            F.col("w").alias("token"),
            "true_count",
            "cms_est",
            (F.col("cms_est") >= F.col("true_count")).alias("is_overestimate"),
        )
        .orderBy(F.col("true_count").desc(), F.col("token").asc())
    )


def countmin_oracle_sql(depth: int = 4, width: int = 256, top: int = 20,
                        table: str = "documents") -> str:
    """Identical sketch in DuckDB list primitives: same portable token,
    same cell arithmetic, same min-over-rows estimate."""
    from cassandra_ttl_remover_spark.operators.lookups import (
        portable_token_oracle_expr,
    )

    ws = "[w for w in string_split(text, ' ') if w <> '']"
    tok = portable_token_oracle_expr("CAST(i AS VARCHAR) || ':' || w")
    return f"""
WITH counts AS (
  SELECT w, count(*)::BIGINT AS true_count
  FROM (SELECT unnest({ws}) AS w FROM {table})
  GROUP BY w
),
rows_i AS (SELECT unnest(range(0, {depth}))::INT AS i),
cells AS (
  SELECT i, (({tok}) % {width} + {width}) % {width} AS cell, true_count, w
  FROM counts CROSS JOIN rows_i
),
counters AS (
  SELECT i, cell, sum(true_count)::BIGINT AS cell_count
  FROM cells GROUP BY i, cell
),
probes AS (
  SELECT w, true_count FROM counts
  ORDER BY true_count DESC, w ASC LIMIT {top}
)
SELECT p.w AS token, p.true_count,
       min(c.cell_count)::BIGINT AS cms_est,
       (min(c.cell_count) >= p.true_count) AS is_overestimate
FROM probes p
JOIN cells x ON x.w = p.w
JOIN counters c ON c.i = x.i AND c.cell = x.cell
GROUP BY p.w, p.true_count
ORDER BY p.true_count DESC, token ASC
"""


def countmin_join_size(a: DataFrame, a_key: str, b: DataFrame, b_key: str,
                       depth: int = 4, width: int = 512) -> DataFrame:
    """Equi-join cardinality estimation by count-min inner product:
    |A ⋈ B| = Σ_k f_A(k)·f_B(k) ≤ min_i ⟨row_i(A), row_i(B)⟩ — the
    classic sketch-based cardinality estimate an optimizer consults
    before picking a join strategy. Returns one row: the exact join
    size, the CMS estimate, and the one-sided certificate
    ``est >= exact`` (inner products only gain from collisions).

    Both sketches use the engine-portable md5 token rows, so the oracle
    rebuilds them identically and the estimate hash-matches. Scale: each
    side collapses to its key-frequency table (one partial-aggregated
    shuffle each — the optimizer's stats pass); the d×w counter tables
    then join on (i, cell), a broadcast-sized operation. The exact side
    is the same two frequency tables joined on the key — never the raw
    join — so the certificate costs key-cardinality, not join-output,
    work."""
    from pyspark.sql.functions import broadcast

    from cassandra_ttl_remover_spark.operators.lookups import (
        PORTABLE_TOKEN_EXPR,
    )

    def freq_table(df: DataFrame, key: str, fcol: str) -> DataFrame:
        return df.groupBy(F.col(key).cast("string").alias("k")).agg(
            F.count("*").cast("long").alias(fcol)
        )

    def counters(freq: DataFrame, fcol: str) -> DataFrame:
        # builds the sketch FROM the same frequency frame the exact side
        # consumes — one key universe by construction, so the est >= exact
        # certificate can never compare sketches over diverging casts
        spark = freq.sparkSession
        rows_df = spark.range(depth).select(
            F.col("id").cast("int").alias("i")
        )
        tok = PORTABLE_TOKEN_EXPR.format(
            col="concat(cast(i as string), ':', k)"
        )
        return (
            freq.crossJoin(broadcast(rows_df))
            .select("i", F.expr(f"pmod({tok}, {width})").cast("long")
                    .alias("cell"), fcol)
            .groupBy("i", "cell")
            .agg(F.sum(fcol).alias("cnt"))
        )

    fa = freq_table(a, a_key, "fa")
    fb = freq_table(b, b_key, "fb")
    exact = fa.join(fb, "k").agg(
        F.coalesce(F.sum(F.col("fa") * F.col("fb")), F.lit(0))
        .cast("long").alias("exact_join_size")
    )
    ca = counters(fa, "fa").withColumnRenamed("cnt", "ca")
    cb = counters(fb, "fb").withColumnRenamed("cnt", "cb")
    est = (
        ca.join(cb, ["i", "cell"])
        .groupBy("i")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("ip"))
        .agg(F.min("ip").cast("long").alias("cms_join_est"))
    )
    return exact.crossJoin(est).select(
        "exact_join_size", "cms_join_est",
        (F.col("cms_join_est") >= F.col("exact_join_size"))
        .alias("is_overestimate"),
    )


def countmin_join_size_oracle_sql(a_sql: str, a_key: str, b_sql: str,
                                  b_key: str, depth: int = 4,
                                  width: int = 512) -> str:
    """Identical sketches + inner products in DuckDB."""
    from cassandra_ttl_remover_spark.operators.lookups import (
        portable_token_oracle_expr,
    )

    tok = portable_token_oracle_expr("CAST(i AS VARCHAR) || ':' || k")
    cell = f"((({tok}) % {width} + {width}) % {width})"
    return f"""
WITH fa AS (SELECT CAST({a_key} AS VARCHAR) AS k, count(*)::BIGINT AS f
            FROM ({a_sql}) GROUP BY 1),
fb AS (SELECT CAST({b_key} AS VARCHAR) AS k, count(*)::BIGINT AS f
       FROM ({b_sql}) GROUP BY 1),
rows_i AS (SELECT unnest(range(0, {depth}))::INT AS i),
ca AS (
  SELECT i, {cell}::BIGINT AS cell, sum(f)::BIGINT AS cnt
  FROM fa CROSS JOIN rows_i GROUP BY 1, 2
),
cb AS (
  SELECT i, {cell}::BIGINT AS cell, sum(f)::BIGINT AS cnt
  FROM fb CROSS JOIN rows_i GROUP BY 1, 2
),
ip AS (
  SELECT ca.i, sum(ca.cnt * cb.cnt)::BIGINT AS ip
  FROM ca JOIN cb ON ca.i = cb.i AND ca.cell = cb.cell
  GROUP BY ca.i
),
ex AS (
  SELECT coalesce(sum(fa.f * fb.f), 0)::BIGINT AS exact_join_size
  FROM fa JOIN fb USING (k)
)
SELECT ex.exact_join_size,
       (SELECT min(ip) FROM ip)::BIGINT AS cms_join_est,
       ((SELECT min(ip) FROM ip) >= ex.exact_join_size) AS is_overestimate
FROM ex
"""


def frequent_pairs(baskets: DataFrame, basket_col: str, item_col: str,
                   min_support: int = 10,
                   max_basket: int = 1000) -> DataFrame:
    """Apriori 2-itemset mining (market basket): item pairs co-occurring
    in at least ``min_support`` baskets — with the A-PRIORI prune that
    makes it tractable at scale: a pair can only be frequent if BOTH
    items are, so baskets are first restricted to frequent singletons
    before any pair materializes. Returns
    ``(item_a, item_b, support)`` ordered by (support desc, items asc).

    Scale shape: singleton supports are one map-side-combined groupBy;
    the frequent-item set joins back as a LEFT SEMI (never collected);
    pair generation is a within-basket self-join keyed on the basket id,
    quadratic ONLY in each basket's frequent-item count —
    ``max_basket`` drops degenerate baskets above that bound (the
    standard guard; dropped baskets are by definition promiscuous and
    near-uninformative for pair support). One final pair aggregation."""
    items = baskets.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("i")
    ).distinct()
    freq = (
        items.groupBy("i")
        .agg(F.count("*").cast("long").alias("sup1"))
        .filter(F.col("sup1") >= min_support)
        .select("i")
    )
    pruned = items.join(freq, "i", "left_semi")
    sizes = (
        pruned.groupBy("b").agg(F.count("*").cast("long").alias("_bs"))
        .filter(F.col("_bs") <= max_basket)
        .select("b")
    )
    pruned = pruned.join(sizes, "b", "left_semi")
    a = pruned.select("b", F.col("i").alias("item_a"))
    c = pruned.select("b", F.col("i").alias("item_b"))
    return (
        a.join(c, "b")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").cast("long").alias("support"))
        .filter(F.col("support") >= min_support)
        .orderBy(F.col("support").desc(), "item_a", "item_b")
    )


def frequent_pairs_oracle_sql(fact: str, basket_col: str, item_col: str,
                              min_support: int = 10,
                              max_basket: int = 1000) -> str:
    return f"""
WITH items AS (
  SELECT DISTINCT {basket_col} AS b, {item_col} AS i FROM {fact}
), freq AS (
  SELECT i FROM items GROUP BY i HAVING count(*) >= {min_support}
), pruned AS (
  SELECT b, i FROM items WHERE i IN (SELECT i FROM freq)
), keepb AS (
  SELECT b FROM pruned GROUP BY b HAVING count(*) <= {max_basket}
), p2 AS (
  SELECT x.b, x.i AS item_a, y.i AS item_b
  FROM pruned x JOIN pruned y ON x.b = y.b AND x.i < y.i
  WHERE x.b IN (SELECT b FROM keepb)
)
SELECT item_a, item_b, count(*)::BIGINT AS support
FROM p2 GROUP BY item_a, item_b
HAVING count(*) >= {min_support}
ORDER BY support DESC, item_a, item_b
"""


def bloom_fpr_certificate(docs: DataFrame, *, num_bits: int = 1 << 16,
                          k: int = 5, text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """PORTABLE Bloom filter with a measured false-positive certificate —
    the oracle-checkable counterpart of the engine-hash bloom inside
    :func:`~cassandra_ttl_remover_spark.operators.curate.decontaminate_bloom`.
    Word 3-gram shingles of EVEN documents are inserted; probe shingles
    are those appearing ONLY in odd documents (true negatives by
    construction — shingles, not tokens: the fixture vocabulary is ~30
    words, far too small for disjoint probe sets), so every probe hit is
    a genuine false positive of the filter. Bit
    positions use md5-derived Kirsch–Mitzenmacher double hashing
    (h1, h2 = two 60-bit md5 slices; p_i = (h1 + i*h2) mod m) — pure
    integer arithmetic both engines compute identically, so the EXACT
    false-positive count hash-matches. Returns ONE row
    ``(n_inserted, n_bits_set, n_probes, n_fp, fpr, fpr_ok)`` with
    ``fpr_ok`` gating fp*10 <= probes (10%).

    Scale shape: the bit set is a distinct-position frame (<= num_bits
    rows — filter-sized, not corpus-sized); probes check membership via
    ONE position-keyed join + a per-token count==k confirm. No driver
    bit array, no UDFs; at real scale the position frame becomes the
    broadcast bitset exactly as decontaminate_bloom builds it."""
    h1 = "cast(conv(substr(md5(token), 1, 15), 16, 10) as bigint)"
    h2 = "cast(conv(substr(md5(token), 16, 15), 16, 10) as bigint)"
    from cassandra_ttl_remover_spark.operators.text import (
        SHINGLES_EXPR, WORDS_EXPR)

    ws = WORDS_EXPR.format(col=text_col)
    sh = SHINGLES_EXPR.format(ws="_ws")  # hoisted, no per-element re-split
    toks = docs.select(
        (F.col(id_col) % 2 == 0).alias("even"),
        F.expr(ws).alias("_ws"),
    ).select("even", F.explode(F.expr(sh)).alias("token"))
    membership = toks.groupBy("token").agg(
        F.max(F.col("even").cast("int")).alias("in_even"),
        F.min(F.col("even").cast("int")).alias("all_even"),
    )
    inserted = membership.filter("in_even = 1").select("token")
    probes = membership.filter("in_even = 0").select("token")
    pos_expr = [f"pmod({h1} + {i} * {h2}, {int(num_bits)})" for i in range(k)]
    arr = "array(" + ", ".join(pos_expr) + ")"
    bitset = (
        inserted.select(F.explode(F.expr(arr)).alias("p")).distinct()
    )
    probe_pos = probes.select(
        "token", F.explode(F.expr(arr)).alias("p")
    )
    fp = (
        probe_pos.join(bitset, "p")
        .groupBy("token")
        .agg(F.count("*").alias("nh"))
        .filter(F.col("nh") == k)
    )
    stats = (
        inserted.agg(F.count("*").cast("long").alias("n_inserted"))
        .crossJoin(F.broadcast(
            bitset.agg(F.count("*").cast("long").alias("n_bits_set"))))
        .crossJoin(F.broadcast(
            probes.agg(F.count("*").cast("long").alias("n_probes"))))
        .crossJoin(F.broadcast(
            fp.agg(F.count("*").cast("long").alias("n_fp"))))
    )
    return stats.select(
        "n_inserted", "n_bits_set", "n_probes", "n_fp",
        F.expr(
            "case when n_probes = 0 then cast(0.0 as double) "
            "else cast(n_fp as double) / cast(n_probes as double) end"
        ).alias("fpr"),
        (F.col("n_fp") * 10 <= F.col("n_probes")).alias("fpr_ok"),
    )


def bloom_fpr_certificate_oracle_sql(num_bits: int = 1 << 16, k: int = 5,
                                     table: str = "documents",
                                     id_col: str = "doc_id") -> str:
    h1 = "('0x' || substr(md5(token), 1, 15))::BIGINT"
    h2 = "('0x' || substr(md5(token), 16, 15))::BIGINT"
    ws = "[w for w in string_split(text, ' ') if w <> '']"
    pos = " UNION ALL ".join(
        f"SELECT token, (({h1} + {i} * {h2}) % {num_bits}"
        f" + {num_bits}) % {num_bits} AS p FROM toks_named"
        for i in range(k)
    )
    return f"""
WITH t0 AS (
  SELECT ({id_col} % 2 = 0) AS even, {ws} AS toks FROM {table}
), raw AS (
  SELECT even, toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS token
  FROM t0, LATERAL UNNEST(generate_series(1, len(toks) - 2)) AS u(i)
  WHERE len(toks) >= 3
), membership AS (
  SELECT token, max(even::INT) AS in_even FROM raw GROUP BY token
), inserted AS (
  SELECT token FROM membership WHERE in_even = 1
), probes AS (
  SELECT token FROM membership WHERE in_even = 0
), ins_pos AS (
  SELECT DISTINCT p FROM (
    {pos.replace('toks_named', 'inserted')}
  )
), probe_pos AS (
  {pos.replace('toks_named', 'probes')}
), fp AS (
  SELECT token FROM probe_pos JOIN ins_pos USING (p)
  GROUP BY token HAVING count(*) = {k}
)
SELECT (SELECT count(*) FROM inserted)::BIGINT AS n_inserted,
       (SELECT count(*) FROM ins_pos)::BIGINT AS n_bits_set,
       (SELECT count(*) FROM probes)::BIGINT AS n_probes,
       (SELECT count(*) FROM fp)::BIGINT AS n_fp,
       CASE WHEN (SELECT count(*) FROM probes) = 0 THEN 0.0
            ELSE (SELECT count(*) FROM fp)::DOUBLE
                 / (SELECT count(*) FROM probes)::DOUBLE END AS fpr,
       ((SELECT count(*) FROM fp) * 10 <= (SELECT count(*) FROM probes))
         AS fpr_ok
"""
