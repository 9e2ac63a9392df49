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
  * `track_ttl_state` — the custom stateful operator: per-key liveness state
    with an event-time timeout via `applyInPandasWithState`, emitting an
    'expired' record when a key stops receiving writes for its TTL — the
    streaming-native realization of the reference's expiry semantics (a cell
    whose localExpirationTime passes stops being visible).
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


def stream_dedup(events: DataFrame, keys: list[str], ts_col: str = "ts",
                 watermark: str = "30 minutes") -> DataFrame:
    """Streaming exact dedup: drop repeats of ``keys`` arriving within the
    watermark window (dropDuplicatesWithinWatermark — state is purged once
    the watermark passes, so memory stays bounded on an unbounded stream;
    the streaming counterpart of operators/dedup.exact_dedup)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def track_ttl_state(events: DataFrame, key_col: str = "user_id",
                    ts_col: str = "ts", ttl_seconds: int = 1800,
                    watermark: str = "1 hour") -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-key liveness
    with an event-time TTL.

    For every key the state holds ``(n_events, last_write_us)``; each batch
    of arrivals refreshes it and emits an 'active' snapshot; when the
    watermark passes ``last_write + ttl`` the state times out, the key emits
    one 'expired' record, and its state is dropped — bounded state, the
    streaming analog of a cell's localExpirationTime passing.

    Scale: state is shuffled by key (one shuffle), held in the state store,
    and strictly bounded by the timeout — no unbounded growth on a 100 TB/day
    ingest. Arrow batches carry the groups (Pandas-UDF path, not row-at-a-time).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType([
        T.StructField("key", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("last_write_us", T.LongType()),
        T.StructField("status", T.StringType()),
    ])
    state_schema = T.StructType([
        T.StructField("n", T.LongType()),
        T.StructField("last_us", T.LongType()),
    ])

    def fn(key: tuple, pdfs, state: GroupState):
        (k,) = key
        if state.hasTimedOut:
            n, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                {"key": [k], "n_events": [n], "last_write_us": [last_us],
                 "status": ["expired"]}
            )
            return
        n, last_us = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            batch_max_ns = int(pdf[ts_col].astype("int64").max())
            last_us = max(last_us, batch_max_ns // 1000)
        state.update((n, last_us))
        state.setTimeoutTimestamp(last_us // 1000 + ttl_seconds * 1000)
        yield pd.DataFrame(
            {"key": [k], "n_events": [n], "last_write_us": [last_us],
             "status": ["active"]}
        )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.col(key_col))
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append",
            GroupStateTimeout.EventTimeTimeout,
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
