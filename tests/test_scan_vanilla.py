"""Regression: scan() must be self-sufficient on a session built WITHOUT
engine conf (the driver's oracle harness constructs a vanilla SparkSession).

Round-1 failure mode: reading the TIMESTAMP(NANOS) events fixture threw
PARQUET_TYPE_ILLEGAL unless session.py's ENGINE_CONF had pre-set
spark.sql.legacy.parquet.nanosAsLong. scan() now sets the conf at runtime
and the footer probe fails loud instead of silently skipping normalization.
"""

import pytest
from pyspark.sql import types as T

from cassandra_ttl_remover_spark.sources.scan import (
    _NANOS_AS_LONG,
    ScanProbeError,
    _probe_ns_timestamp_cols,
    scan,
    scan_table,
)
from tests.conftest import SF_DIR


@pytest.fixture
def vanilla_conf(spark):
    """Simulate an externally-built session: strip the engine's nanosAsLong
    conf before the test, restore after (the conf is runtime-settable, which
    is exactly what the fix relies on)."""
    spark.conf.unset(_NANOS_AS_LONG)
    yield spark
    spark.conf.set(_NANOS_AS_LONG, "true")


@pytest.fixture
def ns_events(tmp_path):
    """A TIMESTAMP(NANOS) parquet file (the round-1 fixture shape; the
    driver's current fixtures are µs, so the regression input is synthesized
    here to stay independent of fixture drift)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            # 2024-01-01T00:00:00.000000123 etc — sub-µs precision on purpose
            "ts": pa.array(
                [1704067200_000000123, 1704067201_000000456, 1704067202_000000789],
                pa.timestamp("ns"),
            ),
        }
    )
    out = tmp_path / "ns_events.parquet"
    pq.write_table(tbl, out)
    return str(out)


def test_scan_ns_parquet_without_engine_conf(vanilla_conf, ns_events):
    spark = vanilla_conf
    df = scan(spark, ns_events, recursive=False, glob=None)
    # ns column normalized to timestamp_ntz micros, not left as a raw long
    assert isinstance(df.schema["ts"].dataType, T.TimestampNTZType)
    rows = df.orderBy("event_id").collect()
    assert len(rows) == 3
    # µs truncation of the ns value, exact
    assert rows[0]["ts"].isoformat() == "2024-01-01T00:00:00"
    assert rows[1]["ts"].microsecond == 0
    # scan() must have set the conf on the live session
    assert spark.conf.get(_NANOS_AS_LONG) == "true"


def test_scan_us_events_without_engine_conf(vanilla_conf):
    # the driver's current events fixture is µs — must read with no conf help
    df = scan_table(vanilla_conf, SF_DIR, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampNTZType)
    assert df.count() > 0


def test_scan_non_ns_table_does_not_need_conf(vanilla_conf):
    # a table with no ns columns must read fine and not require the conf
    df = scan_table(vanilla_conf, SF_DIR, "nation")
    assert df.count() == 25


def test_probe_failure_is_loud(tmp_path):
    bad = tmp_path / "bad.parquet"
    bad.write_bytes(b"not a parquet file")
    with pytest.raises(ScanProbeError):
        _probe_ns_timestamp_cols(str(bad))


def test_probe_best_effort_warns(tmp_path):
    bad = tmp_path / "bad.parquet"
    bad.write_bytes(b"not a parquet file")
    with pytest.warns(RuntimeWarning):
        assert _probe_ns_timestamp_cols(str(bad), best_effort=True) == []


def test_scan_max_partition_bytes_throttle(spark):
    # M6 analog: a small split ceiling must yield more, smaller scan tasks
    before = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        df = scan_table(spark, SF_DIR, "lineitem")
        base = df.rdd.getNumPartitions()
        from cassandra_ttl_remover_spark.sources.scan import scan

        throttled = scan(
            spark, f"{SF_DIR}/lineitem.parquet", recursive=False, glob=None,
            max_partition_bytes=64 * 1024,
        )
        assert throttled.rdd.getNumPartitions() > base
        assert throttled.count() == df.count()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", before)
