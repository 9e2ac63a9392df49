"""Data-ops audit operators: version diffing and column profiling — the
two checks every pipeline run wraps around its real work ("what changed
since yesterday's snapshot?", "what does this table even look like?").

Both are deterministic and fully SQL-expressible, so they join the
hash-matched oracle surface like everything else.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def diff_frames(old: DataFrame, new: DataFrame, keys: list[str],
                compare_cols: list[str] | None = None) -> DataFrame:
    """Row-level diff between two versions of a table: one row per key that
    is ``added`` (new only), ``removed`` (old only), or ``changed`` (both,
    any compared column differs — NULL-safe). Unchanged keys are omitted.
    Returns ``(*keys, change)``.

    Scale: ONE full-outer sort-merge join on the key — the minimal shape
    for a two-sided comparison (both sides shuffle once); the change
    classification is a projection on top. Comparing only ``compare_cols``
    (default: all shared non-key columns) lets a 100 TB diff ship just the
    columns that matter."""
    shared = [c for c in old.columns if c in new.columns and c not in keys]
    cols = compare_cols if compare_cols is not None else shared
    o = old.select(*keys, *[F.col(c).alias(f"_o_{c}") for c in cols]).withColumn(
        "_in_old", F.lit(True)
    )
    n = new.select(*keys, *[F.col(c).alias(f"_n_{c}") for c in cols]).withColumn(
        "_in_new", F.lit(True)
    )
    j = o.join(n, keys, "full_outer")
    differs = F.lit(False)
    for c in cols:
        # eqNullSafe: NULL == NULL is a non-change
        differs = differs | ~F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    change = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(differs, F.lit("changed"))
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(*keys, "change")
    )


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Column profile: per column, row count, null count, exact distinct
    count — the ANALYZE-style summary a pipeline records per snapshot.
    Returns ``(col_name, n_rows, n_nulls, n_distinct)`` one row per column.

    Scale: ONE aggregation job computing every column's stats in a single
    pass (count + count(col) + count_distinct(col) per column, all
    map-side combined); the per-column unpivot happens on the 1-row result.
    For very wide tables swap count_distinct for approx_count_distinct —
    the exact form is kept here because it is the oracle surface."""
    cols = cols or df.columns
    aggs = [F.count("*").alias("_rows")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"_nn_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"_nd_{c}"))
    one = df.agg(*aggs)
    stacked = ", ".join(
        f"'{c}', _nn_{c}, _nd_{c}" for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stacked}) as (col_name, _nonnull, n_distinct)"
        ),
        F.col("_rows"),
    ).select(
        "col_name",
        F.col("_rows").cast("long").alias("n_rows"),
        (F.col("_rows") - F.col("_nonnull")).cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
    )


def profile_table_oracle_sql(table: str, cols: list[str]) -> str:
    parts = [
        f"SELECT '{c}' AS col_name, count(*)::BIGINT AS n_rows,"
        f" (count(*) - count({c}))::BIGINT AS n_nulls,"
        f" count(DISTINCT {c})::BIGINT AS n_distinct FROM {table}"
        for c in cols
    ]
    return " UNION ALL ".join(parts) + " ORDER BY col_name"


#: prime just under 2^63: digests stay in BIGINT range in any engine.
_DIGEST_MOD = 9_223_372_036_854_775_783


def duck_digest_leaf_sql(canon_sql: str) -> str:
    """DuckDB leaf expression of the anti-entropy digest: first 15 hex
    digits of md5(canonical string) as a 60-bit BIGINT — the ONE place
    the oracle-side leaf construction lives (table_digest_oracle_sql and
    the replica-repair oracle both build on it; widening the leaf means
    changing exactly this function and its Spark twin in
    :func:`table_digest`)."""
    return f"('0x' || substr(md5({canon_sql}), 1, 15))::BIGINT"


def duck_pmod_sql(expr: str, n: int) -> str:
    """DuckDB mirror of Spark's pmod: ((x % n) + n) % n (DuckDB's %
    follows the dividend's sign)."""
    return f"((({expr}) % {n}) + {n}) % {n}"


def table_digest(df: DataFrame, cols: list[str],
                 bucket_col: str, n_buckets: int = 16) -> DataFrame:
    """Anti-entropy digest: one order-independent content checksum per key
    bucket — the Merkle-leaf construction Cassandra repair runs over token
    ranges (the reference's storage layer carries the same machinery:
    NoTTLReader's validation metadata). Two replicas/runs of a table agree
    iff every ``(bucket, n_rows, digest)`` row matches; a mismatched bucket
    localizes the divergence to 1/``n_buckets`` of the keyspace without
    either side shipping data.

    Construction (engine-portable, so the DuckDB oracle hash-matches): each
    row's canonical string (``'|'``-joined ``cols`` — caller supplies
    integer/string columns; float formatting is NOT portable) is md5'd, the
    first 15 hex digits become a 60-bit int, and the bucket digest is their
    exact sum (decimal(38)) mod a prime under 2^63. Addition is commutative,
    so the digest is independent of row order and partitioning — exactly
    the property a distributed checksum needs.

    Scale: one map-side-combined agg keyed by bucket; shuffle carries
    ``n_buckets`` partial rows per task, nothing else."""
    canon = "concat_ws('|', {cs})".format(
        cs=", ".join(f"cast(`{c}` as string)" for c in cols)
    )
    leaf = (
        f"cast(conv(substr(md5({canon}), 1, 15), 16, 10) as bigint)"
    )
    return (
        df.select(
            F.expr(f"pmod(`{bucket_col}`, {n_buckets})").cast("int").alias("bucket"),
            F.expr(leaf).alias("_leaf"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.expr(
                f"cast(sum(cast(_leaf as decimal(38,0))) % {_DIGEST_MOD} as bigint)"
            ).alias("digest"),
        )
    )


def table_digest_oracle_sql(cols: list[str], bucket_col: str,
                            n_buckets: int = 16,
                            table: str = "events") -> str:
    canon = " || '|' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
    return f"""
WITH leaves AS (
  -- pmod mirror: a negative bucket key would otherwise land the two
  -- engines in different buckets and diverge the digests
  SELECT ({duck_pmod_sql(bucket_col, n_buckets)})::INT AS bucket,
         {duck_digest_leaf_sql(canon)}::HUGEINT AS leaf
  FROM {table}
)
SELECT bucket, count(*)::BIGINT AS n_rows,
       CAST(sum(leaf) % {_DIGEST_MOD} AS BIGINT) AS digest
FROM leaves GROUP BY bucket ORDER BY bucket
"""


def group_outliers(df: DataFrame, value_col: str, group_col: str,
                   z: int = 2) -> DataFrame:
    """Per-group z-score outlier counts with NO floating point anywhere:
    the test |x − μ| > z·σ (population σ) rearranges to the pure integer
    inequality ``(n·x − Σx)² > z²·(n·Σx² − (Σx)²)`` over 1e-6-quantized
    values — exact decimal(38) arithmetic both sides, so the result is
    bit-identical in any engine (the standard data-quality gate, made
    oracle-checkable). Returns ``(group_col, n_rows, n_outliers, mean_q)``
    (``mean_q`` = Σx/n, the single IEEE division).

    Scale: one map-side-combined stats agg per group + one broadcast join
    back onto the quantized rows (the stats frame is |groups| rows), then
    a second count agg. Bounds: works while n·max|x_q| < ~1e19 per group
    (decimal(38) headroom) — rescale the quantization for larger groups.
    """
    xq = f"cast(round(cast(`{value_col}` as double) * 1000000.0d) as bigint)"
    q = df.select(
        F.col(group_col), F.expr(xq).alias("_xq")
    )
    stats = q.groupBy(group_col).agg(
        F.count("*").cast("decimal(38,0)").alias("_n"),
        F.sum(F.col("_xq").cast("decimal(38,0)")).alias("_sx"),
        F.sum(
            F.col("_xq").cast("decimal(38,0)") * F.col("_xq").cast("decimal(38,0)")
        ).alias("_sxx"),
    )
    flagged = (
        q.join(F.broadcast(stats), group_col)
        .withColumn(
            "_is_out",
            (
                (F.col("_n") * F.col("_xq").cast("decimal(38,0)") - F.col("_sx"))
                * (F.col("_n") * F.col("_xq").cast("decimal(38,0)") - F.col("_sx"))
            )
            > F.lit(z * z).cast("decimal(38,0)")
            * (F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")),
        )
    )
    return flagged.groupBy(group_col).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.col("_is_out").cast("long")).cast("long").alias("n_outliers"),
        (F.max("_sx").cast("double") / F.max("_n").cast("double")).alias("mean_q"),
    )


def group_outliers_oracle_sql(value_col: str, group_col: str,
                              z: int = 2, table: str = "events") -> str:
    return f"""
WITH q AS (
  SELECT {group_col}, round(CAST({value_col} AS DOUBLE) * 1000000)::BIGINT AS xq
  FROM {table}
),
s AS (
  SELECT {group_col}, count(*)::HUGEINT AS n, sum(xq::HUGEINT) AS sx,
         sum(xq::HUGEINT * xq::HUGEINT) AS sxx
  FROM q GROUP BY {group_col}
)
SELECT {group_col}, CAST(n AS BIGINT) AS n_rows,
       sum(CASE WHEN (n * xq - sx) * (n * xq - sx)
                     > {z * z} * (n * sxx - sx * sx)
                THEN 1 ELSE 0 END)::BIGINT AS n_outliers,
       CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mean_q
FROM q JOIN s USING ({group_col})
GROUP BY {group_col}, n, sx ORDER BY {group_col}
"""


def referential_integrity(child: DataFrame, parent: DataFrame,
                          child_key: str, parent_key: str) -> DataFrame:
    """Foreign-key audit: one row ``(n_child, n_orphans, ok)`` — how many
    child rows reference a parent key that does not exist. The orphan scan
    is a LEFT ANTI join (the probe side streams, the parent key set
    builds/shuffles once; Catalyst broadcasts it when small), so the audit
    costs one pass over the child at any scale — run it per ingest batch,
    not per corpus."""
    orphans = child.select(F.col(child_key).alias("_k")).join(
        parent.select(F.col(parent_key).alias("_k")), "_k", "left_anti"
    )
    return (
        child.agg(F.count("*").alias("n_child"))
        .crossJoin(orphans.agg(F.count("*").alias("n_orphans")))
        .select(
            "n_child", "n_orphans", (F.col("n_orphans") == 0).alias("ok")
        )
    )


def referential_integrity_oracle_sql(child: str, parent: str,
                                     child_key: str, parent_key: str) -> str:
    return f"""
SELECT (SELECT count(*) FROM {child})::BIGINT AS n_child,
       (SELECT count(*) FROM {child} c
        WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                          WHERE p.{parent_key} = c.{child_key}))::BIGINT
         AS n_orphans,
       (SELECT count(*) FROM {child} c
        WHERE NOT EXISTS (SELECT 1 FROM {parent} p
                          WHERE p.{parent_key} = c.{child_key})) = 0 AS ok
"""


def distribution_drift(old: DataFrame, new: DataFrame, col: str) -> DataFrame:
    """Categorical distribution drift between two snapshots: per-category
    observed/expected counts and the chi-square statistic — the standing
    data-ops alarm for "did this feed change shape". Returns one row per
    category ``(category, n_old, n_new, chi2_term)`` plus exact counts;
    sum chi2_term for the statistic (kept per-category so the report
    shows WHICH categories drifted).

    chi2 per category compares the new share against the old share scaled
    to the new total: ``e = n_old * N_new / N_old``; ``term = (n_new -
    e)^2 / e``. All inputs are exact integer counts and the formula is
    rational double arithmetic (no logs — a KL/PSI variant would hang
    engine-portability on libm's ln rounding), so it hash-matches the
    ANSI oracle bit for bit.

    Scale: two map-side-combined counts + a tiny full-outer join on the
    category key — cost is the two scans, state is |categories|."""
    a = old.groupBy(F.col(col).alias("category")).agg(
        F.count("*").alias("n_old")
    )
    b = new.groupBy(F.col(col).alias("category")).agg(
        F.count("*").alias("n_new")
    )
    joined = (
        a.join(b, "category", "full_outer")
        .select(
            "category",
            F.coalesce("n_old", F.lit(0)).alias("n_old"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
    )
    tot = joined.agg(
        F.sum("n_old").alias("_ta"), F.sum("n_new").alias("_tb")
    )
    # _ta = 0 (an entirely empty old snapshot) would make expected 0/0:
    # Spark's NaN fails every comparison while DuckDB orders NaN above all
    # doubles, so both expected and the term are explicitly NULL-guarded
    # on _ta > 0 to keep the engines bit-identical on the degenerate input
    return (
        joined.crossJoin(F.broadcast(tot))
        .withColumn(
            "expected",
            F.when(
                F.col("_ta") > 0,
                F.col("n_old").cast("double") * F.col("_tb").cast("double")
                / F.col("_ta").cast("double"),
            ),
        )
        .withColumn(
            "chi2_term",
            F.when(
                F.col("expected") > 0,
                (F.col("n_new").cast("double") - F.col("expected"))
                * (F.col("n_new").cast("double") - F.col("expected"))
                / F.col("expected"),
            ).otherwise(F.lit(None).cast("double")),
        )
        .select("category", "n_old", "n_new", "expected", "chi2_term")
    )


def distribution_drift_oracle_sql(old_sql: str, new_sql: str,
                                  col: str) -> str:
    """Same exact-counts + rational-double formula; ``old_sql``/``new_sql``
    are row sources exposing ``col``."""
    return f"""
WITH a AS (SELECT {col} AS category, count(*)::BIGINT AS n_old
           FROM ({old_sql}) GROUP BY {col}),
b AS (SELECT {col} AS category, count(*)::BIGINT AS n_new
      FROM ({new_sql}) GROUP BY {col}),
j AS (
  SELECT COALESCE(a.category, b.category) AS category,
         COALESCE(n_old, 0)::BIGINT AS n_old,
         COALESCE(n_new, 0)::BIGINT AS n_new
  FROM a FULL OUTER JOIN b ON a.category = b.category
),
t AS (SELECT sum(n_old)::BIGINT AS ta, sum(n_new)::BIGINT AS tb FROM j)
SELECT category, n_old, n_new,
       CASE WHEN ta > 0 THEN n_old::DOUBLE * tb::DOUBLE / ta::DOUBLE
       END AS expected,
       CASE WHEN ta > 0 AND n_old::DOUBLE * tb::DOUBLE / ta::DOUBLE > 0 THEN
         (n_new::DOUBLE - n_old::DOUBLE * tb::DOUBLE / ta::DOUBLE)
         * (n_new::DOUBLE - n_old::DOUBLE * tb::DOUBLE / ta::DOUBLE)
         / (n_old::DOUBLE * tb::DOUBLE / ta::DOUBLE)
       END AS chi2_term
FROM j CROSS JOIN t ORDER BY category
"""


def ks_drift(a: DataFrame, b: DataFrame, col: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance in EXACT integer
    arithmetic — the numeric-distribution companion to the categorical
    :func:`distribution_drift`: ``D = max_x |F_a(x) - F_b(x)|`` over the
    empirical CDFs, returned as one row ``(n_a, n_b, d_num)`` where
    ``D = d_num / (n_a * n_b)``. Keeping the integer numerator (no float
    division) makes the statistic engine-portable bit for bit; the caller
    divides when it wants the [0,1] form. NULLs carry no distributional
    information and are dropped on both sides.

    Scale: one tagged union + one map-side-combined count per distinct
    value; BOTH empirical CDFs then accumulate through ONE
    :func:`~cassandra_ttl_remover_spark.plans.two_level_cumsums` pass
    over the |distinct| aggregate (range-sharded parallel prefix sums —
    no single-partition window even when a continuous column makes the
    distinct frame corpus-sized; the distinct values are unique keys,
    so the sharded sums equal the global window bit for bit). Products
    stay under 2^63 through ~3·10^9 rows per side."""
    from cassandra_ttl_remover_spark.plans import two_level_cumsums

    tagged = a.filter(F.col(col).isNotNull()).select(
        F.col(col).alias("v"), F.lit(1).alias("_ca"), F.lit(0).alias("_cb")
    ).unionAll(
        b.filter(F.col(col).isNotNull()).select(
            F.col(col).alias("v"), F.lit(0).alias("_ca"),
            F.lit(1).alias("_cb")
        )
    )
    per = tagged.groupBy("v").agg(
        F.sum("_ca").alias("ca"), F.sum("_cb").alias("cb")
    ).localCheckpoint(eager=False)    # feeds the cum pass AND the totals
    cum = two_level_cumsums(per, ["v"], {"cum_a": "ca", "cum_b": "cb"})
    tot = F.broadcast(per.agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    ))
    return cum.crossJoin(tot).groupBy("n_a", "n_b").agg(
        F.max(
            F.abs(F.col("cum_a") * F.col("n_b")
                  - F.col("cum_b") * F.col("n_a"))
        ).alias("d_num")
    )


def ks_drift_oracle_sql(a_sql: str, b_sql: str, col: str) -> str:
    """Same exact-integer KS numerator; ``a_sql``/``b_sql`` are row
    sources exposing ``col``."""
    return f"""
WITH tagged AS (
  SELECT {col} AS v, 1 AS _ca, 0 AS _cb FROM ({a_sql})
   WHERE {col} IS NOT NULL
  UNION ALL
  SELECT {col} AS v, 0 AS _ca, 1 AS _cb FROM ({b_sql})
   WHERE {col} IS NOT NULL
),
per AS (SELECT v, sum(_ca)::BIGINT AS ca, sum(_cb)::BIGINT AS cb
        FROM tagged GROUP BY v),
cum AS (
  SELECT sum(ca) OVER (ORDER BY v)::BIGINT AS cum_a,
         sum(cb) OVER (ORDER BY v)::BIGINT AS cum_b
  FROM per
),
tot AS (SELECT sum(ca)::BIGINT AS n_a, sum(cb)::BIGINT AS n_b FROM per)
SELECT n_a, n_b,
       max(abs(cum_a * n_b - cum_b * n_a))::BIGINT AS d_num
FROM cum CROSS JOIN tot GROUP BY n_a, n_b
"""


def cascade_delete_audit(customer: DataFrame, orders: DataFrame,
                         lineitem: DataFrame, *,
                         nation_key: int = 3) -> DataFrame:
    """Right-to-erasure impact audit (the GDPR "forget these users"
    pre-flight): given a deletion request — every customer in nation
    ``nation_key`` — report, per table, how many rows the cascade
    customer -> orders -> lineitem would remove and how many survive.
    Returns ``(table_name, n_total, n_deleted, n_surviving)`` — the
    dry-run report a pipeline runs BEFORE executing the actual anti-join
    rewrite (which is the same three joins with ``left_anti``).

    Scale shape: the request set never materializes on the driver — it
    flows as two LEFT SEMI joins (custkey into orders, the deleted
    orderkeys into lineitem), each a key-partitioned shuffle that AQE
    converts to broadcast when the request set is small (the common
    case). Counts are 1-row aggregates; nothing is collected except the
    3-row report."""
    del_cust = customer.filter(
        F.col("c_nationkey") == F.lit(int(nation_key))
    ).select("c_custkey")
    del_orders = orders.join(
        del_cust, orders["o_custkey"] == del_cust["c_custkey"], "left_semi"
    ).select("o_orderkey")
    del_line = lineitem.join(
        del_orders, lineitem["l_orderkey"] == del_orders["o_orderkey"],
        "left_semi",
    )
    rows = []
    for name, total_df, deleted_df in (
        ("customer", customer, del_cust),
        ("lineitem", lineitem, del_line),
        ("orders", orders, del_orders),
    ):
        rows.append(
            total_df.agg(F.count("*").cast("long").alias("n_total"))
            .crossJoin(
                deleted_df.agg(F.count("*").cast("long").alias("n_deleted"))
            )
            .select(
                F.lit(name).alias("table_name"),
                "n_total",
                "n_deleted",
                (F.col("n_total") - F.col("n_deleted")).alias("n_surviving"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("table_name")


def cascade_delete_audit_oracle_sql(nation_key: int = 3) -> str:
    return f"""
WITH del_cust AS (
  SELECT c_custkey FROM customer WHERE c_nationkey = {nation_key}
), del_orders AS (
  SELECT o_orderkey FROM orders
  WHERE o_custkey IN (SELECT c_custkey FROM del_cust)
), del_line AS (
  SELECT l_orderkey FROM lineitem
  WHERE l_orderkey IN (SELECT o_orderkey FROM del_orders)
)
SELECT * FROM (
  SELECT 'customer' AS table_name,
         (SELECT count(*) FROM customer)::BIGINT AS n_total,
         (SELECT count(*) FROM del_cust)::BIGINT AS n_deleted,
         ((SELECT count(*) FROM customer)
          - (SELECT count(*) FROM del_cust))::BIGINT AS n_surviving
  UNION ALL
  SELECT 'lineitem',
         (SELECT count(*) FROM lineitem)::BIGINT,
         (SELECT count(*) FROM del_line)::BIGINT,
         ((SELECT count(*) FROM lineitem)
          - (SELECT count(*) FROM del_line))::BIGINT
  UNION ALL
  SELECT 'orders',
         (SELECT count(*) FROM orders)::BIGINT,
         (SELECT count(*) FROM del_orders)::BIGINT,
         ((SELECT count(*) FROM orders)
          - (SELECT count(*) FROM del_orders))::BIGINT
)
ORDER BY table_name
"""


def source_overlap_matrix(docs: DataFrame, *, source_col: str = "source",
                          text_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Cross-subcorpus contamination audit: for every PAIR of sources,
    how many distinct word 3-gram shingles they share — the "is my eval
    slice leaking into my train slice?" / "which two crawls overlap?"
    governance report. Returns
    ``(src_a, src_b, shared, n_a, n_b, jaccard)`` for every source pair
    with ``shared > 0``, ordered by (src_a, src_b); ``jaccard`` is the
    exact-operand IEEE quotient shared / (n_a + n_b - shared).

    Scale shape: the corpus reduces ONCE to distinct (shingle, source)
    incidence (one shuffle, map-side combined); pairs come from a
    self-join keyed on the SHINGLE — per-shingle fan-out is bounded by
    sources^2 (sources are dozens-to-hundreds, never corpus-sized), so
    no all-pairs term exists anywhere. Per-source distinct counts ride
    the same incidence frame; the |sources|^2-row result is trivially
    collectable."""
    from cassandra_ttl_remover_spark.operators.text import (
        SHINGLES_EXPR, WORDS_EXPR)

    ws = WORDS_EXPR.format(col=text_col)
    sh = SHINGLES_EXPR.format(ws="_ws")  # hoisted, no per-element re-split
    incidence = (
        docs.select(F.col(source_col).alias("src"),
                    F.expr(ws).alias("_ws"))
        .select("src", F.explode(F.expr(sh)).alias("g"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    per_src = incidence.groupBy("src").agg(
        F.count("*").cast("long").alias("n_g")
    )
    pairs = (
        incidence.alias("x")
        .join(incidence.alias("y"), "g")
        .filter(F.col("x.src") < F.col("y.src"))
        .groupBy(F.col("x.src").alias("src_a"), F.col("y.src").alias("src_b"))
        .agg(F.count("*").cast("long").alias("shared"))
    )
    return (
        pairs.join(F.broadcast(per_src.select(F.col("src").alias("src_a"),
                                              F.col("n_g").alias("n_a"))),
                   "src_a")
        .join(F.broadcast(per_src.select(F.col("src").alias("src_b"),
                                         F.col("n_g").alias("n_b"))),
              "src_b")
        .select(
            "src_a", "src_b", "shared", "n_a", "n_b",
            (F.col("shared").cast("double")
             / (F.col("n_a") + F.col("n_b") - F.col("shared")).cast("double")
             ).alias("jaccard"),
        )
        .orderBy("src_a", "src_b")
    )


def source_overlap_matrix_oracle_sql(table: str = "documents",
                                     source_col: str = "source") -> str:
    """Independent recomputation: shingles via UNNEST over the token
    sequence, distinct incidence, pair counts, same single quotient."""
    ws = "[w for w in string_split(text, ' ') if w <> '']"
    return f"""
WITH t AS (
  SELECT {source_col} AS src, {ws} AS toks FROM {table}
), inc AS (
  SELECT DISTINCT src,
         toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] AS g
  FROM t, LATERAL UNNEST(generate_series(1, len(toks) - 2)) AS u(i)
  WHERE len(toks) >= 3
), per_src AS (
  SELECT src, count(*)::BIGINT AS n_g FROM inc GROUP BY src
), pairs AS (
  SELECT x.src AS src_a, y.src AS src_b, count(*)::BIGINT AS shared
  FROM inc x JOIN inc y ON x.g = y.g AND x.src < y.src
  GROUP BY x.src, y.src
)
SELECT src_a, src_b, shared, a.n_g AS n_a, b.n_g AS n_b,
       shared::DOUBLE / (a.n_g + b.n_g - shared)::DOUBLE AS jaccard
FROM pairs JOIN per_src a ON pairs.src_a = a.src
           JOIN per_src b ON pairs.src_b = b.src
ORDER BY src_a, src_b
"""


def key_skew_report(df: DataFrame, key_col: str, *,
                    quantiles: tuple = (50, 90, 99),
                    top_k: int = 5) -> DataFrame:
    """Join-key skew audit — the pre-flight a 100 TB join wants before it
    shuffles: per-key row counts reduced to the numbers that decide the
    strategy (salt? AQE skew-join? broadcast?). Returns ONE row
    ``(n_rows, n_keys, max_cnt, p50_cnt, p90_cnt, p99_cnt, top_keys)``
    where the percentiles are DISCRETE order statistics over the per-key
    count distribution (rank = floor((n_keys-1)*q/100) + 1 on the
    ascending counts — integer selection, no interpolation formula to
    disagree on between engines) and ``top_keys`` is the concatenated
    ``key:cnt`` list of the ``top_k`` heaviest keys (count desc, key asc).

    Scale shape: one groupBy(key) (the same shuffle the real join would
    do, at count-only width); the rank statistics ride a
    :func:`~cassandra_ttl_remover_spark.plans.two_level_row_number`
    pass over the per-key frame (range-sharded — at 100 TB the key
    frame itself can be billions of rows, so no single-partition
    window even here), the top-k heaviest keys come from a distributed
    TakeOrdered (orderBy + limit), and the scalars from one 1-row
    aggregate. No collect of the key frame, no sort of the raw data."""
    from cassandra_ttl_remover_spark.plans import two_level_row_number

    counts = (
        df.groupBy(F.col(key_col).alias("k"))
        .agg(F.count("*").cast("long").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    # (cnt, k) is unique per row, so the sharded global rank equals the
    # single-window row_number exactly
    ranked = two_level_row_number(counts, ["cnt", "k"], out="rn")
    top = (
        counts.orderBy(F.col("cnt").desc(), F.col("k").asc()).limit(top_k)
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list("
                "struct(-cnt as s, k, cnt))),"
                " x -> concat(x.k, ':', x.cnt)), ',')"
            ).alias("top_keys")
        )
    )
    base = F.broadcast(counts.agg(
        F.sum("cnt").alias("n_rows"),
        F.count("*").cast("long").alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
    ))
    qcols = [
        F.max(
            F.when(
                # integer rank selection: ((n-1)*q) div 100 + 1 — no float
                # interpolation formula for the engines to disagree on
                F.col("rn")
                == F.expr(f"((n_keys - 1) * {int(qq)}) div 100 + 1"),
                F.col("cnt"),
            )
        ).alias(f"p{qq}_cnt")
        for qq in quantiles
    ]
    stats = ranked.crossJoin(base).agg(
        F.max("n_rows").alias("n_rows"),
        F.max("n_keys").alias("n_keys"),
        F.max("max_cnt").alias("max_cnt"),
        *qcols,
    )
    return stats.crossJoin(F.broadcast(top))


def key_skew_report_oracle_sql(table: str, key_col: str, *,
                               quantiles: tuple = (50, 90, 99),
                               top_k: int = 5) -> str:
    qsel = ", ".join(
        f"(SELECT cnt FROM ranked WHERE rn = "
        f"((SELECT count(*) FROM counts) - 1) * {qq} // 100 + 1)"
        f"::BIGINT AS p{qq}_cnt"
        for qq in quantiles
    )
    return f"""
WITH counts AS (
  SELECT {key_col} AS k, count(*)::BIGINT AS cnt
  FROM {table} GROUP BY {key_col}
), ranked AS (
  SELECT k, cnt, row_number() OVER (ORDER BY cnt ASC, k ASC) AS rn
  FROM counts
), top AS (
  SELECT string_agg(k || ':' || cnt, ',' ORDER BY cnt DESC, k ASC)
           AS top_keys
  FROM (SELECT k, cnt FROM counts ORDER BY cnt DESC, k ASC LIMIT {top_k})
)
SELECT (SELECT sum(cnt) FROM counts)::BIGINT AS n_rows,
       (SELECT count(*) FROM counts)::BIGINT AS n_keys,
       (SELECT max(cnt) FROM counts)::BIGINT AS max_cnt,
       {qsel},
       top_keys
FROM top
"""


def join_strategy_advisor(fact: DataFrame, dim: DataFrame, fact_key: str, *,
                          broadcast_rows: int = 1_000_000,
                          skew_ratio: int = 20) -> DataFrame:
    """The decision row a 100 TB join planner wants BEFORE shuffling:
    measure the fact side's key distribution and the dim side's size,
    then recommend by deterministic integer rules —

    - ``broadcast``  when the dim side fits the broadcast budget
      (``dim_rows <= broadcast_rows``): no exchange at all;
    - ``salt``       when the hottest key exceeds ``skew_ratio`` x the
      mean per-key count (integer cross-multiplied:
      ``max_cnt * n_keys > skew_ratio * fact_rows``) — feed
      :func:`~cassandra_ttl_remover_spark.plans.salted_join`;
    - ``shuffle``    otherwise (plain hash join; AQE handles the rest).

    Returns ONE row ``(fact_rows, n_keys, max_cnt, dim_rows,
    recommendation)``. Both measurements are single aggregates (the
    per-key count is the same exchange the real join would pay, at
    count-only width); nothing is collected."""
    counts = fact.groupBy(F.col(fact_key)).agg(
        F.count("*").cast("long").alias("cnt")
    )
    kstats = counts.agg(
        F.sum("cnt").alias("fact_rows"),
        F.count("*").cast("long").alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
    )
    dstats = dim.agg(F.count("*").cast("long").alias("dim_rows"))
    return kstats.crossJoin(F.broadcast(dstats)).select(
        "fact_rows", "n_keys", "max_cnt", "dim_rows",
        F.expr(
            f"case when dim_rows <= {int(broadcast_rows)} then 'broadcast' "
            f"when max_cnt * n_keys > {int(skew_ratio)} * fact_rows "
            f"then 'salt' else 'shuffle' end"
        ).alias("recommendation"),
    )


def join_strategy_advisor_oracle_sql(fact: str, dim: str, fact_key: str, *,
                                     broadcast_rows: int = 1_000_000,
                                     skew_ratio: int = 20) -> str:
    return f"""
WITH counts AS (
  SELECT {fact_key} AS k, count(*)::BIGINT AS cnt
  FROM {fact} GROUP BY {fact_key}
), kstats AS (
  SELECT sum(cnt)::BIGINT AS fact_rows, count(*)::BIGINT AS n_keys,
         max(cnt)::BIGINT AS max_cnt
  FROM counts
), dstats AS (
  SELECT count(*)::BIGINT AS dim_rows FROM {dim}
)
SELECT fact_rows, n_keys, max_cnt, dim_rows,
       CASE WHEN dim_rows <= {broadcast_rows} THEN 'broadcast'
            WHEN max_cnt * n_keys > {skew_ratio} * fact_rows THEN 'salt'
            ELSE 'shuffle' END AS recommendation
FROM kstats, dstats
"""


def k_anonymity_report(df: DataFrame, quasi_cols: list[str],
                       k: int = 5) -> DataFrame:
    """k-anonymity audit over a quasi-identifier column set: every
    combination of ``quasi_cols`` values shared by FEWER than ``k`` rows
    is a re-identification risk (the release gate privacy reviews run
    before publishing any slice). Returns one row per violating
    combination ``(*quasi_cols, n_rows)`` ordered by (n_rows, *cols) —
    empty result == the table is k-anonymous at this k.

    Scale: one map-side-combined groupBy over the quasi columns; the
    violating set is by definition small (each group < k rows), so the
    result never approaches data size."""
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count("*").cast("long").alias("n_rows"))
        .filter(F.col("n_rows") < k)
        .orderBy("n_rows", *quasi_cols)
    )


def k_anonymity_oracle_sql(table: str, quasi_cols: list[str],
                           k: int = 5) -> str:
    cols = ", ".join(quasi_cols)
    return f"""
SELECT {cols}, count(*)::BIGINT AS n_rows
FROM {table} GROUP BY {cols}
HAVING count(*) < {k}
ORDER BY n_rows, {cols}
"""


def corpus_card(docs: DataFrame, text_col: str = "text",
                lang_col: str = "lang",
                id_col: str = "doc_id") -> DataFrame:
    """The data-card summary block ("corpus card"): the one-stop
    long-format metric table a dataset release publishes — sizes, token
    counts, language distribution, exact-duplicate rate — all exact
    integers so the card is reproducible bit-for-bit. Returns
    ``(metric, value)`` rows ordered by metric.

    Scale: ONE pass computes the scalar metrics (map-side combined);
    the language histogram and the duplicate count are one groupBy
    each — three aggregation jobs total, none corpus-sized in output."""
    from cassandra_ttl_remover_spark.operators.text import WORDS_EXPR

    ws = WORDS_EXPR.format(col=text_col)
    scal = docs.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.length(text_col)).cast("long").alias("n_chars"),
        F.expr(f"sum(cast(size({ws}) as bigint))").alias("n_tokens"),
        F.min(F.length(text_col)).cast("long").alias("min_chars"),
        F.max(F.length(text_col)).cast("long").alias("max_chars"),
    )
    n_scal = 5
    scal_rows = scal.select(
        F.expr(
            "stack({n}, 'n_docs', n_docs, 'n_chars', n_chars,"
            " 'n_tokens', n_tokens, 'min_chars', min_chars,"
            " 'max_chars', max_chars) as (metric, value)".format(n=n_scal)
        )
    )
    lang_rows = (
        docs.groupBy(lang_col)
        .agg(F.count("*").cast("long").alias("value"))
        .select(F.concat(F.lit("lang:"), F.col(lang_col)).alias("metric"),
                "value")
    )
    dup_rows = (
        docs.groupBy(F.md5(F.col(text_col)).alias("_h"))
        .agg(F.count("*").alias("_c"))
        .agg(
            F.sum(F.col("_c") - 1).cast("long").alias("value")
        )
        .select(F.lit("n_exact_dup_rows").alias("metric"),
                F.coalesce("value", F.lit(0)).alias("value"))
    )
    return scal_rows.unionByName(lang_rows).unionByName(dup_rows).orderBy(
        "metric"
    )


def corpus_card_oracle_sql(table: str = "documents",
                           lang_col: str = "lang") -> str:
    ws = "[w for w in string_split(text, ' ') if w <> '']"
    return f"""
SELECT metric, value FROM (
  SELECT 'n_docs' AS metric, count(*)::BIGINT AS value FROM {table}
  UNION ALL SELECT 'n_chars', sum(length(text))::BIGINT FROM {table}
  UNION ALL SELECT 'n_tokens', sum(len({ws}))::BIGINT FROM {table}
  UNION ALL SELECT 'min_chars', min(length(text))::BIGINT FROM {table}
  UNION ALL SELECT 'max_chars', max(length(text))::BIGINT FROM {table}
  UNION ALL
  SELECT 'lang:' || {lang_col}, count(*)::BIGINT
  FROM {table} GROUP BY {lang_col}
  UNION ALL
  SELECT 'n_exact_dup_rows', coalesce(sum(c - 1), 0)::BIGINT FROM (
    SELECT count(*)::BIGINT AS c FROM {table} GROUP BY md5(text)
  )
)
ORDER BY metric
"""
