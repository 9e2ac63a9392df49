"""Local replica of the driver's correctness gate: run each queries() entry
in Spark and its oracle_sql() in DuckDB over the same parquet, compare
row-count + schema-name set + column-name-sorted values exactly.

Usage:
    python tests/oracle_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def check_scalar_outputs(spark_df, name: str) -> str | None:
    """Driver-harness contract: the external gate canonicalizes results via
    pandas ``sort_values``, which raises ``unhashable type`` on list/dict
    cells — so every declared query must emit ONLY scalar-typed top-level
    columns (CORRECTNESS_r02's sole red row, q_x13, violated this).
    Returns an error string, or None if the schema is harness-safe."""
    from pyspark.sql import types as T

    bad = [
        f.name
        for f in spark_df.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    if bad:
        return (
            f"{name} emits complex-typed top-level column(s) {bad} — "
            "the driver harness cannot canonicalize these; serialize "
            "(array_join/to_json) before returning"
        )
    return None


def compare(spark_df, duck_sql: str, con) -> tuple[bool, str]:
    sp_cols = spark_df.columns
    sp_rows = [tuple(r) for r in spark_df.collect()]
    dk = con.sql(duck_sql)
    dk_cols = list(dk.columns)
    dk_rows = dk.fetchall()
    if sorted(sp_cols) != sorted(dk_cols):
        return False, f"schema mismatch: spark={sorted(sp_cols)} duck={sorted(dk_cols)}"
    if len(sp_rows) != len(dk_rows):
        return False, f"row count mismatch: spark={len(sp_rows)} duck={len(dk_rows)}"
    a = normalize(sp_rows, sp_cols)
    b = normalize(dk_rows, dk_cols)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, f"OK ({len(sp_rows)} rows)"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    import __spark_entry__ as entry_mod
    from pyspark.sql import SparkSession

    # deliberately VANILLA (no ENGINE_CONF): the driver's harness builds its
    # own session, so the engine must be self-sufficient — round 1 failed
    # exactly because this replica used get_spark() and hid the gap
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-parity")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    con = duck_connection(sf_dir)
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            complex_err = check_scalar_outputs(df, name)
            if complex_err:
                print(f"  {name:32s} FAIL {complex_err}")
                failures.append(name)
                continue
            if name not in oracles:
                n = df.count()
                print(f"  {name:32s} rows-only: {n} rows")
                continue
            ok, msg = compare(df, oracles[name], con)
            status = "PASS" if ok else "FAIL"
            print(f"  {name:32s} {status} {msg}")
            if not ok:
                failures.append(name)
        except Exception as e:  # noqa: BLE001
            print(f"  {name:32s} ERROR {type(e).__name__}: {str(e)[:200]}")
            failures.append(name)
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
