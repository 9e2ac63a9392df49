"""Structured-Streaming TTL semantics (SURVEY.md §7 M4): the strip as a
continuous pipeline must produce exactly the batch result."""

import shutil
import tempfile
from pathlib import Path

import pyspark.sql.functions as F

from cassandra_ttl_remover_spark import annotate_events, strip_ttl
from cassandra_ttl_remover_spark.streaming.ttl_stream import (
    read_events_stream,
    run_to_completion,
    stream_strip_ttl,
)


def test_stream_strip_matches_batch(spark, events):
    work = Path(tempfile.mkdtemp(prefix="ctrs_stream_"))
    src, out, ckpt = work / "src", work / "out", work / "ckpt"
    try:
        ann = annotate_events(events).limit(200)
        ann.write.parquet(str(src))
        batch = strip_ttl(spark.read.parquet(str(src)))

        stream = read_events_stream(
            spark, str(src), schema=batch.schema, max_files_per_trigger=2
        )
        run_to_completion(stream_strip_ttl(stream), str(out), str(ckpt))

        got = spark.read.parquet(str(out))
        assert got.count() == batch.count()
        assert got.filter(F.col("ttl").isNotNull()).count() == 0
        assert batch.select("event_id", "writetime").exceptAll(
            got.select("event_id", "writetime")
        ).count() == 0
    finally:
        shutil.rmtree(work, ignore_errors=True)
