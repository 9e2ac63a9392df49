"""Streaming TTL semantics (SURVEY.md §7 M4).

The reference's TTL model is an event-time expiry (a cell with
localExpirationTime simply stops being visible — NoTTLColumnSerializer.java:
33-39); its batch job is a bounded rewrite. Structured Streaming expresses
the same semantics continuously:

  * `stream_strip_ttl` — the rewrite as an always-on pipeline: readStream
    over arriving files, the same strip projection (operators/liveness.py),
    append-mode sink. Identical per-row semantics to the batch path — the
    transform is a pure projection so batch/stream parity is by construction.
  * `expiring_counts` — watermarked sliding-window counts of soon-to-expire
    data (the operational dashboard the reference's users run the tool for).
  * state TTL via `applyInPandasWithState` would be the custom-state analog;
    not needed while the transform stays stateless (kept out per SURVEY's
    "only if the query surface demands it").
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from cassandra_ttl_remover_spark.operators.liveness import strip_ttl


def read_events_stream(spark: SparkSession, path: str,
                       schema: T.StructType,
                       max_files_per_trigger: int = 16) -> DataFrame:
    """File-arrival stream over a directory of event parquet. Throttled by
    maxFilesPerTrigger — the streaming analog of the reference's RateLimiter
    (NoTTLScanner.java:55, SURVEY.md §2.1 M6)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_strip_ttl(events: DataFrame) -> DataFrame:
    """The TTL strip as a streaming transformation (stateless projection —
    exactly-once under the file sink's commit protocol)."""
    return strip_ttl(events)


def expiring_counts(events: DataFrame, ts_col: str = "ts",
                    window: str = "10 minutes",
                    watermark: str = "30 minutes") -> DataFrame:
    """Watermarked windowed count of rows carrying a TTL — late data beyond
    the watermark is dropped, state is bounded (the scale requirement for an
    always-on 100 TB ingest)."""
    return (
        events.withWatermark(ts_col, watermark)
        .filter(F.col("ttl").isNotNull())
        .groupBy(F.window(F.col(ts_col), window))
        .agg(F.count("*").alias("n_expiring"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_expiring",
        )
    )


def run_to_completion(stream_df: DataFrame, out_dir: str, checkpoint: str) -> None:
    """Drain all currently-available input (availableNow trigger) into a
    parquet sink — used by tests and backfills; the production call is the
    same minus availableNow."""
    (
        stream_df.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .format("parquet")
        .option("path", out_dir)
        .start()
        .awaitTermination()
    )
