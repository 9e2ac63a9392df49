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


def test_cli_version_flag(capsys):
    # --version prints the package version and exits 0 — the reference's
    # jar-manifest version provider (JarManifestVersionProvider.java:1-20)
    from cassandra_ttl_remover_spark import __version__

    with pytest.raises(SystemExit) as ex:
        parse_args(["--version"])
    assert ex.value.code == 0
    assert __version__ in capsys.readouterr().out


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


@pytest.mark.slow  # seal-gate tier (heavy equality/e2e sweep)
def test_cli_sstable_to_sstable_is_the_reference_job(spark):
    """--input-format sstable --output-format sstable == the reference
    tool end to end on its native format: scan -> strip -> sharded
    binary sink. The output scans back as the stripped input, no
    expiring cell survives, and every output shard passes the digest
    sweep."""
    from cassandra_ttl_remover_spark.sources import sstable as ss

    work = Path(tempfile.mkdtemp(prefix="ctrs_clis_"))
    try:
        src, out = work / "src", work / "out"
        ss.events_sstable_fixture(spark, "/root/testdata/sf0.001",
                                  str(src))
        rc = main(["--input", str(src), "--output-path", str(out),
                   "--input-format", "sstable",
                   "--output-format", "sstable"])
        assert rc == 0
        back = ss.scan_sstable(spark, str(out))
        want = sorted(
            tuple(r) for r in
            ss.strip_ttl_cells(ss.scan_sstable(spark, str(src))).collect()
        )
        got = sorted(tuple(r) for r in back.collect())
        assert got == want and len(got) > 0
        assert back.filter("kind = 'expiring'").count() == 0
        checks = ss.verify_digests(spark, str(out)).collect()
        assert checks and all(r.digest_ok and r.toc_ok for r in checks)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_cli_sstable_option_matrix():
    # native input needs no --cql (schema is the format's, like the
    # reference's C2 path)
    spec = parse_args(["--input", "/in", "--output-path", "/out",
                       "--input-format", "sstable"])
    assert spec.input_format == "sstable" and spec.cql is None
    # binary sink without binary source is rejected at run() time
    from cassandra_ttl_remover_spark.cli import TTLRemovalError, run

    bad = parse_args(["--format-version", "2", "--input", "/in",
                      "--output-path", "/out",
                      "--output-format", "sstable"])
    with pytest.raises(TTLRemovalError, match="requires --input-format"):
        run(bad)


def test_cli_inplace_rewrite_matches_reshard(spark):
    """--rewrite-mode inplace (zero shuffle) and reshard (one range
    exchange) must produce scan-identical stripped outputs."""
    from cassandra_ttl_remover_spark.sources import sstable as ss

    work = Path(tempfile.mkdtemp(prefix="ctrs_clir_"))
    try:
        src = work / "src"
        ss.events_sstable_fixture(spark, "/root/testdata/sf0.001",
                                  str(src))
        for mode in ("inplace", "reshard"):
            rc = main(["--input", str(src),
                       "--output-path", str(work / mode),
                       "--input-format", "sstable",
                       "--output-format", "sstable",
                       "--rewrite-mode", mode])
            assert rc == 0
        a = sorted((tuple(r) for r in
                    ss.scan_sstable(spark, str(work / "inplace"))
                    .collect()), key=repr)
        b = sorted((tuple(r) for r in
                    ss.scan_sstable(spark, str(work / "reshard"))
                    .collect()), key=repr)
        assert a == b and len(a) > 0
    finally:
        shutil.rmtree(work, ignore_errors=True)
