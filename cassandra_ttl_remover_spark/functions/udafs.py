"""Arrow-vectorized pandas UDAF: the grouped-aggregate UDF taxonomy slot.

The demonstration aggregate is an EXACT quantity-weighted mean price:
inputs are quantized to integer cents inside the UDF (numpy int64 sums —
order-independent, so the result is deterministic under any partitioning)
and divided once at the end, which makes a Python aggregate hash-matchable
against an ANSI oracle — the same exactness discipline as the engine's
JVM-side aggregates.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf


# a DataType INSTANCE, not a DDL string: string return types are
# parsed via the active SparkContext, which does not exist at import time
@pandas_udf(T.DoubleType())
def _weighted_mean_cents(price: pd.Series, qty: pd.Series) -> float:
    # Arrow hands the WHOLE group's columns as numpy-backed Series in one
    # call (grouped-agg pandas UDFs do no partial aggregation); the
    # quantization + int64 sums are vectorized and order-independent, so
    # the result is identical under any partitioning.
    # round half AWAY FROM ZERO to match Spark's F.round and DuckDB's
    # round() — pandas .round() is half-to-even (2.5 -> 2, not 3) and
    # would silently diverge from the oracle on half-unit inputs
    import numpy as np

    pv = (price * 100).to_numpy(dtype="float64")
    qv = qty.to_numpy(dtype="float64")
    pc = (np.sign(pv) * np.floor(np.abs(pv) + 0.5)).astype("int64")
    q = (np.sign(qv) * np.floor(np.abs(qv) + 0.5)).astype("int64")
    num = int((pc * q).sum())
    den = int(q.sum())
    return float(num) / den / 100.0 if den else float("nan")


def weighted_mean_cents(df: DataFrame, group_col: str, price_col: str,
                        qty_col: str) -> DataFrame:
    """Per-group exact weighted mean of ``price_col`` weighted by
    ``qty_col``: ``sum(cents(price) * qty) / sum(qty) / 100`` with integer
    numerator/denominator and ONE final IEEE division.

    Scale: grouped-agg pandas UDFs do NOT partial-aggregate — each group's
    full column data shuffles to one task and must fit its memory (Spark's
    documented limitation), unlike JVM aggregates with map-side combine.
    That makes this the right tool only for bounded-cardinality groups
    needing numpy-only logic; for anything expressible in SQL, the JVM
    aggregate (the oracle's inner expression) is strictly better, and for
    huge groups pre-reduce with a JVM partial first. This module pins the
    boundary's contract; it is deliberately not used by the hot paths.
    """
    # NB: Spark refuses to mix a grouped-agg pandas UDF with JVM
    # aggregates in one agg() (INVALID_PANDAS_UDF_PLACEMENT) — another
    # reason the boundary is a last resort.
    return (
        df.groupBy(group_col)
        .agg(_weighted_mean_cents(F.col(price_col), F.col(qty_col)).alias("wmean"))
    )


def weighted_mean_oracle_sql(group_col: str = "l_returnflag",
                             price_col: str = "l_extendedprice",
                             qty_col: str = "l_quantity",
                             table: str = "lineitem") -> str:
    return f"""
SELECT {group_col},
       (sum(round({price_col} * 100)::BIGINT * round({qty_col})::BIGINT)::DOUBLE
        / sum(round({qty_col})::BIGINT)) / 100.0 AS wmean
FROM {table} GROUP BY {group_col} ORDER BY {group_col}
"""
