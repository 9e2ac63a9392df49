"""Python user-defined table functions (Spark 4 UDTF API surface).

The JVM generator path (explode/posexplode, q_x17) is always preferred
when the row expansion is expressible as a higher-order function — it
stays inside codegen. A Python UDTF is the escape hatch for expansions
with genuinely imperative per-row state; run-length segmentation is the
canonical example: each emitted row depends on a scan cursor over the
token stream, which HOFs can only emulate with quadratic re-scans.

Scale note: UDTF evaluation is row-at-a-time Python — the same cost
profile as a non-Arrow UDF — so this surface is for low-volume or
already-reduced inputs; bulk paths stay JVM-side (the repetition_runs
operator computes the aggregate forms of exactly these runs with HOFs +
one shuffle).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos bigint, token string, run_len bigint")
class RunLengthSegments:
    """Emit one row per maximal run of identical consecutive tokens:
    (1-based token position of the run start, the token, run length).
    Deterministic, pure, and exactly recomputable by a gaps-and-islands
    SQL query — the oracle form."""

    def eval(self, text: str):  # noqa: D102 — contract in class docstring
        toks = [w for w in (text or "").split(" ") if w]
        i, pos = 0, 1
        while i < len(toks):
            j = i
            while j < len(toks) and toks[j] == toks[i]:
                j += 1
            yield pos, toks[i], j - i
            pos += j - i
            i = j


def run_length_oracle_sql(table: str = "documents",
                          id_col: str = "doc_id") -> str:
    """Gaps-and-islands recomputation of RunLengthSegments: position
    minus per-token rank groups consecutive occurrences; the run start
    is the island's min position."""
    ws = "[w for w in string_split(text, ' ') if w <> '']"
    return f"""
WITH b AS (SELECT {id_col}, {ws} AS ws FROM {table}),
tok AS (
  SELECT {id_col}, unnest(ws) AS w, unnest(range(1, len(ws) + 1)) AS i
  FROM b
)
SELECT {id_col}, min(i)::BIGINT AS pos, w AS token,
       count(*)::BIGINT AS run_len
FROM (
  SELECT {id_col}, w, i,
         i - row_number() OVER (PARTITION BY {id_col}, w ORDER BY i) AS isl
  FROM tok
)
GROUP BY {id_col}, w, isl
ORDER BY {id_col}, pos
"""
