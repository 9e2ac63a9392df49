"""User-defined function surface (SURVEY.md §2.2 taxonomy: UDF/UDAF —
absent from the reference, whose only extension point is the strategy SPI
at TTLRemoverCLI.java:131-145; Spark supplies the machinery).

House rule: Python in the hot path ONLY at Arrow-vectorized boundaries —
pandas_udf (scalar and grouped-agg) and mapInPandas, never row-at-a-time
``F.udf``. Everything expressible with built-in pyspark.sql.functions stays
JVM-side; this module exists for the shapes that genuinely need numpy.
"""

from cassandra_ttl_remover_spark.functions.udafs import (
    weighted_mean_cents,
    weighted_mean_oracle_sql,
)

__all__ = ["weighted_mean_cents", "weighted_mean_oracle_sql"]
