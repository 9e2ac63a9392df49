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


def test_scan_events_without_engine_conf(vanilla_conf):
    spark = vanilla_conf
    df = scan_table(spark, SF_DIR, "events")
    # ns column normalized to timestamp_ntz, not left as a raw long
    assert isinstance(df.schema["ts"].dataType, T.TimestampNTZType)
    assert df.count() > 0
    # scan() must have set the conf on the live session
    assert spark.conf.get(_NANOS_AS_LONG) == "true"


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
