"""M3 strategy registry + M7 CLI option matrix + end-to-end CLI job."""

import shutil
import tempfile
from pathlib import Path

import pytest

from cassandra_ttl_remover_spark.cli import main, parse_args
from cassandra_ttl_remover_spark.registry import get_strategy, registered_versions


def test_registry_versions():
    assert registered_versions() == ["2", "3", "4", "4.1"]
    assert get_strategy("3").strip is not None
    with pytest.raises(LookupError):
        get_strategy("5")


def test_cli_option_matrix():
    # --cql required for cell-struct formats (TTLRemoverCLI.java:165-197)
    with pytest.raises(SystemExit):
        parse_args(["--format-version", "3", "--input", "x", "--output-path", "y"])
    # --input xor --input-file
    with pytest.raises(SystemExit):
        parse_args(["--input", "a", "--input-file", "b", "--output-path", "y"])
    spec = parse_args(["--format-version", "2", "--input", "/in",
                       "--output-path", "/out", "--pk", "user_id"])
    assert spec.version == "2" and spec.input_path == "/in"


def test_cli_end_to_end(spark, events):
    work = Path(tempfile.mkdtemp(prefix="ctrs_cli_"))
    try:
        from cassandra_ttl_remover_spark import annotate_events
        src, out = work / "src", work / "out"
        annotate_events(events).limit(100).write.parquet(str(src))
        rc = main(["--format-version", "2", "--input", str(src),
                   "--output-path", str(out), "--pk", "user_id",
                   "--clustering", "event_id"])
        assert rc == 0
        back = spark.read.parquet(str(out))
        assert back.count() == 100
        assert back.filter("ttl is not null").count() == 0
    finally:
        shutil.rmtree(work, ignore_errors=True)
