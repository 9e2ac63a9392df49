"""Graph analytics over DataFrames (north-star surface, SURVEY.md §2.2
taxonomy — the reference has no graph operators; connected components lives
in operators/dedup.py as near-dup clustering's backbone).

PageRank here is the INTEGER-ARITHMETIC fixed-iteration form: ranks are
scaled longs, per-edge contributions use integer division, and the damping
update is ``base + (d_num * sum) div d_den`` — every step is exact and
order-independent, so a fixed iteration count hash-matches an unrolled-CTE
ANSI oracle (same construction as similarity.kmeans_labels). Float PageRank
would converge to the same ordering but could never be bit-checked across
engines.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def pagerank(edges: DataFrame, iters: int = 2, *,
             scale: int = 1_000_000, damping_num: int = 85,
             damping_den: int = 100, broadcast_nodes: int = 5_000_000,
             src: str = "src", dst: str = "dst") -> DataFrame:
    """Fixed-iteration PageRank on a directed edge list. Returns
    ``(node, rank)`` — scaled-integer ranks after ``iters`` updates from a
    uniform start of ``scale`` per node.

    Update rule (all integer): ``contrib(u) = rank(u) div outdeg(u)``;
    ``rank'(v) = (1 - d) * scale + d * sum(contribs into v)`` with the
    damping factor d applied as ``(damping_num * s) div damping_den``.
    Dangling nodes (no out-edges) contribute nothing — give the graph both
    edge directions when sink absorption is not wanted.

    Scale: the degree-annotated edge frame is computed once and reused
    every iteration; each iteration is ONE join (edges x ranks, both
    shuffled on the src key — co-partitioned after the first iteration, so
    the edge side's exchange is reused) and one map-side-combinable
    groupBy(dst) sum. The ranks frame is (node, long) — tiny next to
    edges — so iterations move O(|E|) once and O(|V|) twice. Lineage grows
    linearly with ``iters``; checkpoint beyond ~10 (fixed small counts are
    the intended use).
    """
    # Materialize the loop invariants ONCE: the edge frame feeds the node
    # set (twice), the degree count, and every iteration's join — without
    # the checkpoints each iteration re-executes the upstream
    # distinct/union lineage, and the plan doubles per iteration.
    e = edges.select(src, dst).localCheckpoint(eager=False)
    nodes = (
        e.select(F.col(src).alias("node"))
        .union(e.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    outdeg = e.groupBy(src).agg(F.count("*").alias("_d"))
    ed = e.join(outdeg, src).localCheckpoint(eager=False)
    ranks = nodes.withColumn("rank", F.lit(scale).cast("long"))
    base = (damping_den - damping_num) * scale // damping_den
    # Scale-adaptive join side: the ranks frame is |V| (node, long) rows —
    # tiny next to |E|. Below ``broadcast_nodes`` it broadcasts, so the
    # EDGE frame (the big side) never shuffles in any iteration; above it
    # (billion-node graphs) fall back to the shuffled join, where the
    # checkpointed ed at least re-reads local blocks. One cheap count()
    # on the materialized node set decides.
    bcast = nodes.count() <= broadcast_nodes
    for _ in range(iters):
        r = F.broadcast(ranks) if bcast else ranks
        contribs = (
            ed.join(r, ed[src] == r["node"])
            .select(F.col(dst).alias("node"),
                    F.expr("rank div _d").alias("_c"))
            .groupBy("node")
            .agg(F.sum("_c").alias("_s"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                F.expr(
                    f"cast({base} + ({damping_num} * coalesce(_s, 0L))"
                    f" div {damping_den} as long)"
                ).alias("rank"),
            )
            # lineage stays O(1) across iterations instead of nesting the
            # whole previous plan under each new join
            .localCheckpoint(eager=False)
        )
    return ranks


def pagerank_oracle_sql(edges_sql: str, iters: int = 2, *,
                        scale: int = 1_000_000, damping_num: int = 85,
                        damping_den: int = 100) -> str:
    """The same fixed-iteration integer loop UNROLLED into chained CTEs.
    ``edges_sql`` must yield columns ``(src, dst)``."""
    base = (damping_den - damping_num) * scale // damping_den
    ctes = [f"e AS ({edges_sql})",
            """nodes AS (
  SELECT src AS node FROM e UNION SELECT dst FROM e
)""",
            "deg AS (SELECT src, count(*) AS d FROM e GROUP BY src)",
            f"r0 AS (SELECT node, {scale}::BIGINT AS r FROM nodes)"]
    for i in range(iters):
        prev, cur = f"r{i}", f"r{i + 1}"
        ctes.append(f"""c{i} AS (
  SELECT e.dst AS node, sum({prev}.r // deg.d)::BIGINT AS s
  FROM e JOIN {prev} ON {prev}.node = e.src JOIN deg ON deg.src = e.src
  GROUP BY e.dst
)""")
        ctes.append(f"""{cur} AS (
  SELECT n.node,
         ({base} + ({damping_num} * COALESCE(c{i}.s, 0)) // {damping_den})::BIGINT AS r
  FROM nodes n LEFT JOIN c{i} ON c{i}.node = n.node
)""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, r AS rank FROM r{iters} ORDER BY node"
    )


def triangle_count(edges: DataFrame, *, src: str = "src",
                   dst: str = "dst") -> DataFrame:
    """Exact triangle counting on an undirected graph given as an edge
    list (either or both directions, self-loops ignored). Returns
    ``(node, triangles)`` for every node in at least one triangle.

    The standard orientation trick: canonicalize each edge to ``a < b``
    and dedup, then join oriented edges twice — (a,b) ⋈ (b,c) ⋈ (a,c)
    finds each triangle exactly once as a < b < c. Orientation bounds the
    join: a node contributes pairs only among its HIGHER-id neighbors, so
    work per node is outdeg² under the orientation (≪ deg² for hubs when
    ids spread a hub's neighbors — the degeneracy-ordering refinement
    would replace id order with degree order, same plan shape).

    Scale: two shuffle joins on single-key columns + one explode-free
    groupBy; edge payload is two longs. At 100 TB-scale graphs the
    (a,b)⋈(b,c) intermediate is the budget item — cap or sample hub
    out-neighborhoods upstream if the orientation alone is not enough.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    ab = e
    bc = e.select(F.col("a").alias("b"), F.col("b").alias("c"))
    ac = e.select(F.col("a").alias("_a"), F.col("b").alias("_c"))
    tri = (
        ab.join(bc, "b")
        .join(ac, (F.col("a") == F.col("_a")) & (F.col("c") == F.col("_c")))
        .select("a", "b", "c")
    )
    per_node = (
        tri.select(F.col("a").alias("node"))
        .union(tri.select(F.col("b").alias("node")))
        .union(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("triangles"))
    )
    return per_node


def triangle_count_oracle_sql(edges_sql: str) -> str:
    """Same orientation + double join in ANSI SQL; ``edges_sql`` yields
    ``(src, dst)``."""
    return f"""
WITH e0 AS ({edges_sql}),
e AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM e0 WHERE src <> dst
),
tri AS (
  SELECT ab.a, ab.b, bc.b AS c
  FROM e ab
  JOIN e bc ON bc.a = ab.b
  JOIN e ac ON ac.a = ab.a AND ac.b = bc.b
)
SELECT node, count(*)::BIGINT AS triangles
FROM (
  SELECT a AS node FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri
)
GROUP BY node ORDER BY node
"""
