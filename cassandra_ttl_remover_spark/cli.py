"""CLI driver (SURVEY.md §2.1 M7, §3.1).

Mirrors the reference's picocli surface (TTLRemoverCLI.java:25-70) and its
option cross-validation matrix (:165-197): version <-> cql requirements,
--sstables xor --sstable, output path handling. Produces a job spec and runs
the distributed read -> strip -> sorted-write DAG that replaces the
reference's sequential per-file loop (§3.1 step 5).

Usage:
    python -m cassandra_ttl_remover_spark.cli \
        --format-version 3 --input DIR_OR_FILE --output-path OUT \
        --cql 'CREATE TABLE ks.t (...)' [--now EPOCH_SECONDS]
"""

from __future__ import annotations

import argparse
import sys
from dataclasses import dataclass

from cassandra_ttl_remover_spark.registry import get_strategy, registered_versions


@dataclass
class JobSpec:
    version: str
    input_path: str
    output_path: str
    cql: str | None
    now: int | None
    pk: str
    clustering: list[str]
    input_format: str = "parquet"
    output_format: str = "parquet"
    rewrite_mode: str = "reshard"


class TTLRemovalError(RuntimeError):
    """Analog of TTLRemovalException (TTLRemovalException.java:3-15): any
    failure surfaces as exit code 1 (TTLRemoverCLI.java:102-118)."""


def parse_args(argv: list[str]) -> JobSpec:
    from cassandra_ttl_remover_spark import __version__

    p = argparse.ArgumentParser(prog="ttl-remover-spark")
    # tool version from package metadata — the reference surfaces it from
    # the jar manifest (JarManifestVersionProvider.java:1-20, wired by
    # TTLRemoverCLI.java:26's mixinStandardHelpOptions)
    p.add_argument("--version", action="version",
                   version=f"%(prog)s {__version__}")
    p.add_argument("--format-version", default="3", choices=registered_versions(),
                   help="source format generation (reference: cassandra 2/3/4/4.1)")
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("--input", help="directory of data files (recursive)")
    g.add_argument("--input-file", help="a single data file")
    p.add_argument("--output-path", required=True)
    p.add_argument("--cql", help="CREATE TABLE DDL declaring the schema "
                                 "(required for cell-struct formats 3/4/4.1)")
    p.add_argument("--now", type=int, default=None,
                   help="deterministic 'now' epoch-seconds (SURVEY.md §2.3.1)")
    p.add_argument("--pk", default="user_id")
    p.add_argument("--clustering", default="")
    p.add_argument("--input-format", default="parquet",
                   choices=["parquet", "sstable"],
                   help="sstable = the reference's NATIVE on-disk format "
                        "(Data.db/Index.db directories)")
    p.add_argument("--output-format", default="parquet",
                   choices=["parquet", "sstable"],
                   help="sstable = re-encode stripped cells through the "
                        "distributed sharded SSTable sink (the "
                        "reference's output side)")
    p.add_argument("--rewrite-mode", default="reshard",
                   choices=["reshard", "inplace"],
                   help="sstable->sstable only: 'reshard' range-"
                        "partitions into new shards (one exchange); "
                        "'inplace' is the zero-shuffle per-split 1:1 "
                        "rewrite (the reference's own dataflow)")
    a = p.parse_args(argv)

    # option matrix (TTLRemoverCLI.java:165-197): cql required iff the format
    # needs a declared schema (the reference requires it for C3/4/4.1 and
    # loads from disk for C2). The native sstable source carries its own
    # fixed cell schema — like the reference's C2 path, no DDL needed.
    if (a.input_format != "sstable" and a.format_version != "2"
            and not a.cql):
        p.error(f"--cql is required for format-version {a.format_version}")
    return JobSpec(
        version=a.format_version,
        input_path=a.input or a.input_file,
        output_path=a.output_path,
        cql=a.cql,
        now=a.now,
        pk=a.pk,
        clustering=[c for c in a.clustering.split(",") if c],
        input_format=a.input_format,
        output_format=a.output_format,
        rewrite_mode=a.rewrite_mode,
    )


def run(spec: JobSpec) -> int:
    from cassandra_ttl_remover_spark import get_spark, scan, write_sorted
    from cassandra_ttl_remover_spark.schema import parse_cql_create_table

    spark = get_spark("ttl-remover-cli")
    try:
        if spec.input_format == "sstable":
            # the reference's job verbatim on its NATIVE format: binary
            # scan -> strip -> (sharded binary sink | sorted parquet).
            # Sidecars (Filter/Summary/Statistics/Digest/TOC) are
            # re-emitted by the sink, so outputs pass verify_digests.
            from cassandra_ttl_remover_spark.sources.sstable import (
                rewrite_stripped,
                scan_sstable,
                strip_ttl_cells,
                write_sstable_distributed,
            )

            if (spec.output_format == "sstable"
                    and spec.rewrite_mode == "inplace"):
                rewrite_stripped(spark, spec.input_path,
                                 spec.output_path)
                return 0
            stripped = strip_ttl_cells(
                scan_sstable(spark, spec.input_path))
            if spec.output_format == "sstable":
                write_sstable_distributed(stripped, spec.output_path)
            else:
                write_sorted(stripped, spec.output_path, pk="pk",
                             clustering=["cell"])
            return 0
        if spec.output_format == "sstable":
            raise TTLRemovalError(
                "--output-format sstable requires --input-format sstable "
                "(the binary sink consumes the native cell schema)")
        schema = None
        pk, clustering = spec.pk, spec.clustering
        if spec.cql:
            table = parse_cql_create_table(spec.cql)
            pk = table.partition_keys[0]
            clustering = table.clustering_keys
        df = scan(spark, spec.input_path, schema=schema)
        stripped = get_strategy(spec.version).strip(df)
        write_sorted(stripped, spec.output_path, pk=pk, clustering=clustering)
        return 0
    except TTLRemovalError:
        raise
    except Exception as e:  # noqa: BLE001 — CLI boundary
        raise TTLRemovalError(str(e)) from e


def main(argv: list[str] | None = None) -> int:
    try:
        return run(parse_args(argv if argv is not None else sys.argv[1:]))
    except TTLRemovalError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(main())
