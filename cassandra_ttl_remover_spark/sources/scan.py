"""Source discovery + scan operators (SURVEY.md §2.1 S1/S2).

S1 — recursive file-source discovery: the reference walks a directory tree
keeping files ending ``Data.db``, or accepts a single file
(TTLRemoverCLI.java:147-163). Spark-first: we DON'T hand-walk directories on
the driver — ``spark.read`` with ``recursiveFileLookup`` + ``pathGlobFilter``
enumerates files inside the JVM, in parallel, and keeps planning metadata off
the Python side. ``discover_data_files`` exists for CLI parity/UX only.

S2 — full sorted scan: the reference streams all partitions in token order
(getScanner — Cassandra3TTLRemover.java:103, NoTTLScanner.java:47-64). In
Spark, global order is not a property of a scan (and must not be — a 100 TB
sort-on-read would be absurd); order is applied where it matters: at the
sink (sinks/writer.py) or per-partition after a hash shuffle, matching the
reference's partition-local ordering guarantee.

The scan layer also normalizes parquet TIMESTAMP(NANOS) columns (which
Spark's µs TimestampType cannot ingest directly) by reading them as longs
(``spark.sql.legacy.parquet.nanosAsLong``) and converting to
``timestamp_ntz`` — a pure projection, fused into the scan by codegen.
"""

from __future__ import annotations

import os
import warnings
from pathlib import Path

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def discover_data_files(root: str | os.PathLike, suffix: str = ".parquet") -> list[Path]:
    """S1 driver-side analog of getSSTables() (TTLRemoverCLI.java:147-163):
    accept a single data file, or walk a tree collecting ``*{suffix}``.

    Prefer :func:`scan` (JVM-side listing) for actual reads; this is for CLI
    validation and small-tool UX, mirroring the reference's contract.
    """
    p = Path(root)
    if p.is_file():
        return [p] if p.name.endswith(suffix) else []
    return sorted(q for q in p.rglob(f"*{suffix}") if q.is_file())


#: Runtime-settable SQL conf that lets Spark (µs TimestampType) ingest parquet
#: TIMESTAMP(NANOS) columns as raw longs; the scan layer converts them back.
_NANOS_AS_LONG = "spark.sql.legacy.parquet.nanosAsLong"


def _probe_ns_timestamp_cols(
    path: str,
    *,
    glob: str | None = None,
    recursive: bool = True,
    best_effort: bool = False,
    max_files: int = 8,
) -> list[str]:
    """Names of parquet TIMESTAMP(NANOS) columns in the footer(s) at ``path``,
    honoring the same ``glob``/``recursive`` selection the scan will use.

    Footer-only sniff via pyarrow: cheap driver-side planning metadata, not
    data movement. Capped at ``max_files`` footers — a scan's files share a
    schema (Spark itself unifies from a subset unless mergeSchema), so a
    bounded sample is sufficient and keeps the probe O(1) on a 100 TB,
    million-file source. Probe failures are LOUD by default — silently
    skipping normalization would hand downstream queries raw nanosecond longs
    in place of timestamps (the round-1 failure mode). ``best_effort=True``
    (used with ``ignore_corrupt``) degrades to a warning, matching the
    reference's mark-suspect-and-continue stance (NoTTLReader.java:436-452).
    """
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq

        p = Path(path)
        if p.is_dir():
            pattern = glob or "*.parquet"
            it = p.rglob(pattern) if recursive else p.glob(pattern)
            files: list[Path] = []
            for q in sorted(it):
                if q.is_file():
                    files.append(q)
                    if len(files) >= max_files:
                        break
        else:
            files = [p]
        out: set[str] = set()
        for f in files:
            for field in pq.read_schema(f):
                if pa.types.is_timestamp(field.type) and field.type.unit == "ns":
                    out.add(field.name)
        return sorted(out)
    except Exception as exc:
        if best_effort:
            warnings.warn(
                f"parquet footer probe failed for {path!r} ({exc!r}); "
                "TIMESTAMP(NANOS) normalization skipped",
                RuntimeWarning,
                stacklevel=3,
            )
            return []
        raise ScanProbeError(
            f"cannot probe parquet footers under {path!r} for TIMESTAMP(NANOS) "
            f"columns: {exc}"
        ) from exc


class ScanProbeError(RuntimeError):
    """The pyarrow footer probe failed; ns-timestamp normalization would be
    silently wrong, so the scan refuses to proceed."""


def scan(
    spark: SparkSession,
    path: str,
    *,
    schema: T.StructType | None = None,
    recursive: bool = True,
    glob: str | None = "*.parquet",
    ignore_corrupt: bool = False,
    max_partition_bytes: int | str | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """S1+S2: load a file/dir of parquet as a DataFrame, schema declared not
    inferred when given (reference stance, SURVEY.md §1.3), with
    TIMESTAMP(NANOS) normalization to ``timestamp_ntz`` micros.

    ``ignore_corrupt=True`` is the corrupt-input quarantine (the reference
    marks suspect SSTables and continues — NoTTLReader.java:436-452,
    Cassandra2TTLRemover.java:58-61): unreadable files are skipped instead
    of failing the job. Off by default — silently dropping data is a policy
    the caller must opt into.

    ``max_partition_bytes`` is the batch-path read throttle (M6 — the
    reference rate-limits data-file reads via a RateLimiter on openDataReader,
    NoTTLReader.java:1987-1996, NoTTLScanner.java:55). Spark's batch analog
    is bounding how much input one task ingests: the value is applied to
    ``spark.sql.files.maxPartitionBytes`` at plan time, so a smaller value
    throttles per-task I/O (more, smaller splits) exactly where the
    reference throttles per-read bytes. Session-scoped, like the reference's
    process-wide limiter; the streaming analog is maxFilesPerTrigger
    (streaming/ttl_stream.py).

    Scale: listing, footer pruning and row-group skipping are Spark-native;
    the ns->µs conversion is a codegen'd projection (no extra pass).
    """
    if max_partition_bytes is not None:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(max_partition_bytes))
    # Self-sufficiency: the session may not be engine-built (the driver's
    # oracle harness constructs its own). nanosAsLong is a runtime-settable
    # SQL conf; without it a TIMESTAMP(NANOS) read throws PARQUET_TYPE_ILLEGAL
    # before any operator runs. Harmless for non-ns sources.
    ns_cols = _probe_ns_timestamp_cols(
        path, glob=glob, recursive=recursive, best_effort=ignore_corrupt
    )
    if ns_cols:
        spark.conf.set(_NANOS_AS_LONG, "true")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    opts = {}
    if ignore_corrupt:
        opts["ignoreCorruptFiles"] = "true"
    if merge_schema:
        # schema evolution on read: union-by-name over per-file footers;
        # columns absent from an older snapshot surface as NULL. Footer
        # merging is a driver-side metadata pass (one footer per file, no
        # data read), so the cost at 100 TB is file COUNT, not bytes —
        # compact small files first (compact_small_files) when listing
        # dominates.
        opts["mergeSchema"] = "true"
    if Path(path).is_dir():
        if recursive:
            opts["recursiveFileLookup"] = "true"
        if glob:
            opts["pathGlobFilter"] = glob
    try:
        df = reader.options(**opts).parquet(path)
    except Exception:
        # ignoreCorruptFiles covers corrupt files at READ time, but a file
        # too short to even attempt a footer parse fails schema INFERENCE.
        # Quarantine fallback: infer from the first readable footer, then
        # re-read the directory with the schema pinned.
        if not (ignore_corrupt and schema is None):
            raise
        good = _first_readable_schema(spark, path, glob or "*.parquet")
        df = reader.schema(good).options(**opts).parquet(path)
    for c in ns_cols:
        # only normalize what actually surfaced as a raw long (a caller-pinned
        # schema may already map the column differently)
        if c in df.columns and isinstance(df.schema[c].dataType, T.LongType):
            # integer division keeps the µs value exact (ANSI-safe, JVM-side)
            df = df.withColumn(
                c, F.expr(f"cast(timestamp_micros(`{c}` div 1000) as timestamp_ntz)")
            )
    return df


def _first_readable_schema(spark: SparkSession, path: str, glob: str) -> T.StructType:
    """Schema of the first file whose parquet footer parses (pyarrow validity
    probe, then Spark's own parquet->Catalyst mapping on that single file).
    Driver-side listing — only reached on the corrupt+schemaless fallback."""
    import pyarrow.parquet as pq

    for f in sorted(Path(path).rglob(glob)):
        try:
            pq.read_metadata(f)
        except Exception:
            continue
        return spark.read.parquet(str(f)).schema
    raise CorruptSourceError(f"no readable parquet file under {path!r}")


class CorruptSourceError(RuntimeError):
    """Every candidate input file failed the footer probe."""


def scan_table(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Load one driver fixture table (TESTDATA.md) with ns normalization."""
    return scan(spark, f"{sf_dir}/{table}.parquet", recursive=False, glob=None)


def load_tables(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> dict[str, DataFrame]:
    """Load fixture tables and register them as temp views for spark.sql."""
    out: dict[str, DataFrame] = {}
    for t in tables or TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            df = scan_table(spark, sf_dir, t)
            df.createOrReplaceTempView(t)
            out[t] = df
    return out


# ---------------------------------------------------------------------------
# Non-parquet source formats (schema declared, never inferred)
# ---------------------------------------------------------------------------

def scan_csv(spark: SparkSession, path: str, schema: T.StructType, *,
             header: bool = True, multiline: bool = True) -> DataFrame:
    """CSV source with a DECLARED schema (the reference's
    schema-is-metadata stance, SURVEY.md §1.3 — inference is a full extra
    pass over 100 TB and non-deterministic under dirty data).
    ``multiline`` handles quoted embedded newlines (document text).

    Scale note: multiLine CSV files are NOT splittable (a quoted newline
    can't be detected mid-file) — many medium files beat one giant file;
    set it False for machine-generated single-line rows to restore
    intra-file splits."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("multiLine", str(multiline).lower())
        .option("escape", '"')
        .csv(path)
    )


def scan_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """JSON-lines source with a DECLARED schema — splittable, self-
    describing field names; schema pinning skips Spark's sampling pass and
    rejects drifted types loudly (ANSI)."""
    return spark.read.schema(schema).json(path)


def scan_orc(spark: SparkSession, path: str,
             schema: T.StructType | None = None) -> DataFrame:
    """ORC source — the other columnar format large estates actually hold
    (Hive-era warehouses). Splittable, predicate-pushdown-capable like
    parquet; schema optional since ORC footers carry exact types (pass one
    to pin against drift, same stance as the other sources)."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.orc(path)


def scan_text(spark: SparkSession, path: str) -> DataFrame:
    """Plain-text source: one row per line, single ``value`` string column —
    the rawest ingest shape (log shipping, WET/WARC-extracted corpora).
    Splittable by line; all structure is the caller's parse projection."""
    return spark.read.text(path)


def text_lines_roundtrip(spark: SparkSession, sf_dir: str,
                         out_dir: str) -> DataFrame:
    """Documents → tab-delimited text lines → parsed back: the line-ingest
    path end-to-end. ``text`` is the LAST field and the split is bounded
    (limit=5), so embedded delimiters in every earlier field would fail
    loudly as cast errors rather than silently shifting columns; embedded
    tabs/newlines in the payload are the format's real limitation — use
    CSV-with-quoting (scan_csv) for payloads that need them."""
    src = scan_table(spark, sf_dir, "documents")
    # concat_ws SKIPS nulls (it does not emit an empty field), which would
    # silently shift every later column on parse — so a NULL in any
    # serialized field fails the write loudly instead
    not_null = " AND ".join(
        f"{c} IS NOT NULL" for c in ("doc_id", "lang", "source", "n_chars", "text")
    )
    lines = src.select(
        F.when(
            F.expr(not_null),
            F.concat_ws(
                "\t",
                F.col("doc_id"), F.col("lang"), F.col("source"),
                F.col("n_chars"), F.col("text"),
            ),
        )
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("text_lines_roundtrip: NULL field in doc_id="),
                    F.col("doc_id").cast("string"),
                )
            )
        )
        .alias("value")
    )
    lines.write.mode("overwrite").text(out_dir)
    p = F.split(F.col("value"), "\t", 5)
    return scan_text(spark, out_dir).select(
        p.getItem(0).cast("long").alias("doc_id"),
        p.getItem(4).alias("text"),
        p.getItem(1).alias("lang"),
        p.getItem(2).alias("source"),
        p.getItem(3).cast("long").alias("n_chars"),
    )


def roundtrip_table(spark: SparkSession, sf_dir: str, table: str, fmt: str,
                    out_dir: str) -> DataFrame:
    """Write a fixture table out as ``fmt`` ('csv' | 'json' | 'orc') and
    scan it back with the SAME schema — the format-conversion correctness
    surface (CSV/JSON lossless for string/integral columns; ORC, like
    parquet, carries timestamps/decimals natively)."""
    src = scan_table(spark, sf_dir, table)
    if fmt == "csv":
        src.write.mode("overwrite").option("header", "true").option(
            "escape", '"'
        ).csv(out_dir)
        return scan_csv(spark, out_dir, src.schema)
    if fmt == "json":
        src.write.mode("overwrite").json(out_dir)
        return scan_json(spark, out_dir, src.schema)
    if fmt == "orc":
        src.write.mode("overwrite").orc(out_dir)
        return scan_orc(spark, out_dir, src.schema)
    raise ValueError(f"unsupported roundtrip format: {fmt!r}")
