"""Driver-hash dtype audit: catch the q_n47 class BEFORE the driver does.

The grading driver canonicalizes both sides through pandas, so a column
whose VALUES match can still hash-mismatch when the DTYPES diverge:

- DuckDB ``sum(BIGINT)`` (plain or windowed) returns HUGEINT, and the
  duckdb->pandas bridge converts HUGEINT to float64 — Spark's int64 ``1``
  then hashes against ``1.0`` (CORRECTNESS_r05's only red row, q_n47).
- EVERY DuckDB DECIMAL lands in pandas as float64, while Spark's
  DecimalType lands as object(Decimal) — so a declared query must never
  emit DECIMAL at top level, and an oracle must CAST decimal-producing
  aggregates.
- Symmetrically, a Spark double against an uncast DuckDB integer column
  hashes 1.0 vs 1.

This audit runs each oracle through the SAME ``duckdb .df()`` pandas path
the driver uses and compares per-column dtype KINDS against what Spark's
result schema will produce under ``toPandas`` — without executing the
Spark side (schema is lazy), so the whole 259-oracle sweep stays cheap.

NULL subtlety: a nullable integral Spark column with actual NULLs becomes
float64 under toPandas, and DuckDB does the same — so an integral-vs-float
divergence is only flagged when the duck column carries NO nulls (when it
does, both bridges degrade identically and the hash still matches).

Usage:
    python tests/oracle_dtype_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from oracle_parity import duck_connection  # noqa: E402


def spark_kind(dt) -> str:
    """Pandas dtype kind that Spark's toPandas produces for a NON-NULL
    column of this type: 'i' integral, 'f' float, 'b' bool, 'O' other
    (strings, decimals, timestamps handled separately as 'M')."""
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "i"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "f"
    if isinstance(dt, T.BooleanType):
        return "b"
    if isinstance(dt, T.DecimalType):
        return "DECIMAL"  # object(Decimal) — never hash-safe vs duckdb
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return "M"
    return "O"


def audit_query(df, duck_sql: str, con) -> list[str]:
    """Return dtype-divergence findings for one queries()/oracle pair."""
    findings = []
    pdf = con.sql(duck_sql).df()
    sp = {f.name: spark_kind(f.dataType) for f in df.schema.fields}
    for col in pdf.columns:
        if col not in sp:
            continue  # schema-name mismatch is the parity sweep's job
        dk = pdf[col].dtype.kind
        sk = sp[col]
        if sk == "DECIMAL":
            findings.append(
                f"{col}: Spark emits DecimalType (pandas object) — cast the "
                f"Spark side to long/double; duck dtype is {dk}"
            )
        elif sk == "i" and dk == "f":
            if pdf[col].isna().any():
                continue  # NULLs degrade BOTH bridges to float64 — safe
            findings.append(
                f"{col}: Spark int64 vs duck float64 (uncast HUGEINT/DECIMAL "
                "aggregate?) — CAST the oracle column to BIGINT"
            )
        elif sk == "f" and dk in ("i", "u"):
            findings.append(
                f"{col}: Spark float vs duck int — cast the oracle to DOUBLE"
            )
        elif sk == "b" and dk != "b":
            findings.append(f"{col}: Spark bool vs duck {dk}")
    return findings


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    import __spark_entry__ as entry_mod
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-dtype-audit")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    con = duck_connection(sf_dir)
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    bad = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        try:
            findings = audit_query(fn(spark, sf_dir), oracles[name], con)
        except Exception as e:  # noqa: BLE001
            findings = [f"ERROR {type(e).__name__}: {str(e)[:160]}"]
        if findings:
            bad[name] = findings
            for f in findings:
                print(f"  {name:32s} {f}")
    print(f"\n{len(bad)} queries with dtype divergence"
          + (f": {sorted(bad)}" if bad else ""))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
