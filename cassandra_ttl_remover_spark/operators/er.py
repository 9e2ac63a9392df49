"""Entity resolution — blocking + pairwise matching + transitive closure
(standard-taxonomy addition, SURVEY.md §2.2: the record-linkage step every
large-scale data integration / training-corpus provenance pipeline runs).

Classic three-stage shape (Fellegi–Sunter lineage, public method):

1. **Blocking** by each record's ``n_keys`` globally RAREST tokens
   (smallest document frequency, ties by token asc) — the textbook trick
   that keeps candidate generation near-linear: a pair is compared only
   if the two records share one of their rare tokens, and rare tokens by
   construction appear in few records, so block sizes are bounded by the
   key token's df.
2. **Matching**: exact set-Jaccard over distinct token sets with a
   rational threshold ``p/q`` (integer cross-multiplied predicate — no
   float ratios), same discipline as
   :func:`cassandra_ttl_remover_spark.operators.dedup.prefix_filter_join`.
3. **Transitive closure**: match edges through
   :func:`~cassandra_ttl_remover_spark.operators.dedup.connected_components`
   (HashMin / driver union-find cutover) — every record gets an
   ``entity_id`` (min reachable id), cluster size, and a canonical flag.

Scale shape: token df is ONE vocab-sized aggregate; the rare-key pick is
one row_number window over the record key (top-``n_keys`` by (df, token));
candidate pairs shuffle on the block token only (no all-pairs anywhere)
and duplicates from multi-key overlap are removed before matching; closure
cost is bounded by the MATCH graph, not the corpus. At 100 TB the only
quadratic term is within-block, and the blocking key was chosen precisely
to keep those blocks small — the frequency cap ``max_block_df`` drops
blocks whose key token is too common (documented recall trade, mirrored
in the oracle).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from cassandra_ttl_remover_spark.operators.dedup import connected_components
from cassandra_ttl_remover_spark.operators.text import WORDS_EXPR
from cassandra_ttl_remover_spark.plans import fan_out


def _rare_token_blocks(docs: DataFrame, max_block_df: int, n_keys: int,
                       text_col: str, id_col: str,
                       include_text: bool = False):
    """Shared blocking stage for :func:`resolve_entities` and
    :func:`edit_distance_pairs`: token sets, document frequencies, and
    each record's ``n_keys`` rarest tokens as blocking keys
    (df <= ``max_block_df``). Returns ``(sets, rarest)`` where
    sets = (id[, t], s, sz) — the original text column rides along ONLY
    when ``include_text`` (edit distance needs it; carrying it for the
    Jaccard path would double the checkpoint footprint for nothing) —
    and rarest = (id, block). Single source for the blocking rule — a
    change here (and in the two mirrored oracles) applies to both
    operators."""
    from pyspark.sql import Window

    ws = WORDS_EXPR.format(col=text_col)
    cols = [F.col(id_col)]
    if include_text:
        cols.append(F.col(text_col).alias("t"))
    cols.append(F.expr(f"array_sort(array_distinct({ws}))").alias("s"))
    sets = (
        fan_out(docs.select(id_col, text_col), id_col)
        .select(*cols)
        .withColumn("sz", F.expr("cast(size(s) as bigint)"))
        .localCheckpoint(eager=False)
    )
    dfreq = (
        sets.select(F.explode("s").alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("df"))
    )
    w = Window.partitionBy(id_col).orderBy("df", "token")
    rarest = (
        sets.select(id_col, F.explode("s").alias("token"))
        .join(dfreq, "token")
        .withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") <= n_keys) & (F.col("df") <= max_block_df))
        .select(F.col(id_col), F.col("token").alias("block"))
    )
    return sets, rarest


def resolve_entities(docs: DataFrame, threshold: tuple[int, int] = (1, 2),
                     max_block_df: int = 50, n_keys: int = 2,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Resolve ``docs`` into entities. Returns one row per input record:
    ``(id_col, entity_id, cluster_size, is_canon)`` ordered by id, where
    ``entity_id`` is the min record id reachable through the match graph
    and ``is_canon`` marks the cluster representative.

    ``threshold`` is the rational Jaccard gate ``(p, q)`` — a pair
    matches when ``q * |A∩B| >= p * |A∪B|``. Each record contributes its
    ``n_keys`` rarest tokens as blocking keys (multi-key blocking — one
    unlucky rare token can't hide a true match); ``max_block_df`` drops
    keys whose token df exceeds it (the blocks a production blocker
    would re-block with a composite key). Candidates found under several
    shared keys are de-duplicated before the Jaccard stage."""
    p, q = threshold
    sets, rarest = _rare_token_blocks(docs, max_block_df, n_keys,
                                      text_col, id_col)
    a = rarest.select(F.col(id_col).alias("a"), "block")
    b = rarest.select(F.col(id_col).alias("b"), "block")
    cand = (
        a.join(b, "block")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
        .join(sets.select(F.col(id_col).alias("a"), F.col("s").alias("sa"),
                          F.col("sz").alias("sza")), "a")
        .join(sets.select(F.col(id_col).alias("b"), F.col("s").alias("sb"),
                          F.col("sz").alias("szb")), "b")
        .withColumn(
            "inter", F.expr("cast(size(array_intersect(sa, sb)) as bigint)")
        )
        .filter(
            (F.col("inter") > 0)
            & (F.lit(int(q)) * F.col("inter")
               >= F.lit(int(p)) * (F.col("sza") + F.col("szb")
                                   - F.col("inter")))
        )
        .select("a", "b")
    )
    cc = connected_components(cand, docs.select(id_col), id_col)
    sizes = cc.groupBy("component").agg(
        F.count("*").cast("long").alias("cluster_size")
    )
    return (
        cc.join(sizes, "component")
        .select(
            F.col(id_col),
            F.col("component").alias("entity_id"),
            "cluster_size",
            (F.col("component") == F.col(id_col)).alias("is_canon"),
        )
        .orderBy(id_col)
    )


def resolve_entities_oracle_sql(threshold: tuple[int, int] = (1, 2),
                                max_block_df: int = 50, n_keys: int = 2,
                                table: str = "documents",
                                id_col: str = "doc_id") -> str:
    """Independent DuckDB recomputation: df via unnest, rarest pick via a
    row_number window (different mechanism than Spark's min(struct)),
    Jaccard via list_intersect, closure via the recursive reachability
    CTE — all must agree row-for-row."""
    p, q = threshold
    ws = "[w for w in string_split(text, ' ') if w <> '']"
    return f"""
WITH RECURSIVE t AS (
  SELECT {id_col} AS id, list_sort(list_distinct({ws})) AS s FROM {table}
), exploded AS (
  SELECT id, unnest(s) AS token FROM t
), dfreq AS (
  SELECT token, count(*)::BIGINT AS df FROM exploded GROUP BY token
), rarest AS (
  SELECT id, token AS block FROM (
    SELECT e.id, e.token, d.df,
           row_number() OVER (PARTITION BY e.id ORDER BY d.df, e.token) AS rn
    FROM exploded e JOIN dfreq d USING (token)
  ) WHERE rn <= {n_keys} AND df <= {max_block_df}
), cand AS (
  SELECT DISTINCT ra.id AS a, rb.id AS b
  FROM rarest ra JOIN rarest rb ON ra.block = rb.block AND ra.id < rb.id
), pairs AS (
  SELECT a, b
  FROM cand
  JOIN t ta ON ta.id = cand.a JOIN t tb ON tb.id = cand.b
  WHERE len(list_intersect(ta.s, tb.s)) > 0
    AND {q} * len(list_intersect(ta.s, tb.s))
        >= {p} * (len(ta.s) + len(tb.s) - len(list_intersect(ta.s, tb.s)))
), edges AS (
  SELECT a, b FROM pairs UNION SELECT b, a FROM pairs
), reach(node, r) AS (
  SELECT {id_col}, {id_col} FROM {table}
  UNION
  SELECT e.b, reach.r FROM edges e JOIN reach ON e.a = reach.node
), cc AS (
  SELECT node AS id, min(r) AS component FROM reach GROUP BY node
), sizes AS (
  SELECT component, count(*)::BIGINT AS cluster_size FROM cc GROUP BY component
)
SELECT cc.id AS {id_col}, cc.component AS entity_id, sizes.cluster_size,
       (cc.component = cc.id) AS is_canon
FROM cc JOIN sizes USING (component)
ORDER BY {id_col}
"""


def edit_distance_pairs(docs: DataFrame, max_dist: int = 20,
                        max_block_df: int = 50, n_keys: int = 2,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Edit-distance near-dup verification: the rare-token blocked
    candidate generator (same machinery as :func:`resolve_entities`),
    confirmed by FULL Levenshtein distance <= ``max_dist`` — the
    character-level complement to token-set Jaccard (catches
    transposition/typo variants Jaccard scores poorly). Returns
    ``(id_a, id_b, dist)`` ordered by (id_a, id_b).

    Both engines implement the same standard DP metric, so the integer
    distances hash-match. A cheap LENGTH-BAND prefilter
    (||a|-|b|| <= max_dist) runs before the O(len^2) DP — the classic
    guard that keeps the expensive metric off obviously-far pairs.

    Scale shape: candidate generation is the bounded blocking join (no
    all-pairs); per-pair DP cost is bounded by doc length — at 100 TB
    run it on the truncated prefix (first ~1k chars) or post-Jaccard
    survivors; the fixture form compares full texts."""
    sets, rarest = _rare_token_blocks(docs, max_block_df, n_keys,
                                      text_col, id_col, include_text=True)
    a = rarest.select(F.col(id_col).alias("id_a"), "block")
    b = rarest.select(F.col(id_col).alias("id_b"), "block")
    return (
        a.join(b, "block")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .join(sets.select(F.col(id_col).alias("id_a"),
                          F.col("t").alias("ta")), "id_a")
        .join(sets.select(F.col(id_col).alias("id_b"),
                          F.col("t").alias("tb")), "id_b")
        .filter(
            F.abs(F.length("ta") - F.length("tb")) <= F.lit(int(max_dist))
        )
        .select(
            "id_a", "id_b",
            F.levenshtein("ta", "tb").cast("long").alias("dist"),
        )
        .filter(F.col("dist") <= F.lit(int(max_dist)))
        .orderBy("id_a", "id_b")
    )


def edit_distance_pairs_oracle_sql(max_dist: int = 20,
                                   max_block_df: int = 50, n_keys: int = 2,
                                   table: str = "documents",
                                   id_col: str = "doc_id") -> str:
    ws = "[w for w in string_split(text, ' ') if w <> '']"
    return f"""
WITH t AS (
  SELECT {id_col} AS id, text AS txt,
         list_sort(list_distinct({ws})) AS s
  FROM {table}
), exploded AS (
  SELECT id, unnest(s) AS token FROM t
), dfreq AS (
  SELECT token, count(*)::BIGINT AS df FROM exploded GROUP BY token
), rarest AS (
  SELECT id, token AS block FROM (
    SELECT e.id, e.token, d.df,
           row_number() OVER (PARTITION BY e.id ORDER BY d.df, e.token) AS rn
    FROM exploded e JOIN dfreq d USING (token)
  ) WHERE rn <= {n_keys} AND df <= {max_block_df}
), cand AS (
  SELECT DISTINCT ra.id AS id_a, rb.id AS id_b
  FROM rarest ra JOIN rarest rb ON ra.block = rb.block AND ra.id < rb.id
)
SELECT id_a, id_b, levenshtein(ta.txt, tb.txt)::BIGINT AS dist
FROM cand JOIN t ta ON ta.id = cand.id_a JOIN t tb ON tb.id = cand.id_b
WHERE abs(length(ta.txt) - length(tb.txt)) <= {max_dist}
  AND levenshtein(ta.txt, tb.txt) <= {max_dist}
ORDER BY id_a, id_b
"""
