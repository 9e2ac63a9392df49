"""Archive & crawl-container ingestion — WARC and ZIP readers (standard-
taxonomy addition, SURVEY.md §2.2): the two containers a web-scale
training-data pipeline actually receives — crawls arrive as WARC
(ISO 28500, the Common Crawl format) and bulk document drops arrive as
ZIP archives. The reference reads one binary container format (SSTables);
these extend the same strict-parse / quarantine discipline to the
ingestion side.

Both readers are pure stdlib (struct, zlib) + mapInPandas: blobs parse
where they sit (Arrow batches, no row-at-a-time Python), strict
structure checks raise ValueError so corrupt archives hit the quarantine
policy, and the fixture WRITERS are deterministic functions of the
documents table — so every decoded statistic is recomputable by the
DuckDB oracle straight from the source text (the multimodal codec
construction applied to containers).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql import types as T


# ---------------------------------------------------------------------------
# WARC (ISO 28500) — one response record per document
# ---------------------------------------------------------------------------


def _doc_to_warc_bytes(doc_id: int, text: bytes) -> bytes:
    """One deterministic WARC/1.0 response record: named headers, exact
    Content-Length, double-CRLF separators, record terminator."""
    uri = f"https://corpus.example/doc/{doc_id}"
    body = text
    headers = (
        "WARC/1.0\r\n"
        f"WARC-Type: response\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Record-ID: <urn:doc:{doc_id}>\r\n"
        f"Content-Length: {len(body)}\r\n"
        "\r\n"
    ).encode("ascii")
    return headers + body + b"\r\n\r\n"


def _parse_warc(blob: bytes) -> list:
    """Strict WARC walker: version line, header block, Content-Length-
    delimited payload, record terminator. Returns per-record
    ``(record_id, target_uri, content_length, payload_sum)``; raises on
    any malformed structure."""
    out = []
    pos = 0
    while pos < len(blob):
        if blob[pos:pos + 5] != b"WARC/":
            raise ValueError("WARC record does not start with version line")
        hdr_end = blob.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError("WARC header block not terminated")
        headers = {}
        lines = blob[pos:hdr_end].decode("ascii").split("\r\n")
        for line in lines[1:]:
            k, _, v = line.partition(": ")
            headers[k.lower()] = v
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError("WARC record missing Content-Length") from exc
        body_start = hdr_end + 4
        body = blob[body_start:body_start + clen]
        if len(body) != clen:
            raise ValueError("WARC payload truncated")
        if blob[body_start + clen:body_start + clen + 4] != b"\r\n\r\n":
            raise ValueError("WARC record terminator missing")
        out.append((headers.get("warc-record-id", ""),
                    headers.get("warc-target-uri", ""),
                    clen, sum(body)))
        pos = body_start + clen + 4
    return out


WARC_RECORDS_SCHEMA = T.StructType([
    T.StructField("record_id", T.StringType()),
    T.StructField("target_uri", T.StringType()),
    T.StructField("content_length", T.LongType()),
    T.StructField("payload_sum", T.LongType()),
])


def documents_as_warc(docs: DataFrame, *, records_per_file: int = 50,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Pack documents into multi-record WARC blobs (``records_per_file``
    docs per archive, grouped by ``doc_id div records_per_file`` — the
    shape crawl dumps actually have). Returns ``(archive_id, payload)``."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        aid = int(pdf[id_col].iloc[0]) // records_per_file
        return pd.DataFrame(
            {
                "archive_id": [aid],
                "payload": [b"".join(
                    _doc_to_warc_bytes(int(r[id_col]),
                                       r[text_col].encode("utf-8"))
                    for _, r in pdf.iterrows()
                )],
            }
        )

    # applyInPandas keyed on the archive id: Spark GUARANTEES each group
    # arrives whole in one call (mapInPandas would split a group across
    # Arrow batches at scale, yielding duplicate partial archives)
    return (
        docs.select(id_col, text_col)
        .groupBy(F.expr(f"{id_col} div {records_per_file}"))
        .applyInPandas(pack, schema=T.StructType([
            T.StructField("archive_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]))
    )


def warc_records(archives: DataFrame) -> DataFrame:
    """Explode every WARC blob into its records: the crawl-ingestion scan
    ("read Common Crawl, one row per response"). Strict parse; corrupt
    archives raise (wrap with a census for quarantine)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"record_id": [], "target_uri": [],
                    "content_length": [], "payload_sum": []}
            for payload in pdf["payload"]:
                for rid, uri, clen, psum in _parse_warc(bytes(payload)):
                    rows["record_id"].append(rid)
                    rows["target_uri"].append(uri)
                    rows["content_length"].append(clen)
                    rows["payload_sum"].append(psum)
            yield pd.DataFrame(rows)

    return archives.select("payload").mapInPandas(
        run, schema=WARC_RECORDS_SCHEMA
    )


def warc_records_oracle_sql(table: str = "documents",
                            id_col: str = "doc_id") -> str:
    """Every record field is a deterministic function of the source row."""
    return f"""
SELECT '<urn:doc:' || {id_col} || '>' AS record_id,
       'https://corpus.example/doc/' || {id_col} AS target_uri,
       length(text)::BIGINT AS content_length,
       coalesce(list_aggregate(list_transform(
         range(1, (length(text) + 1)::INT), i -> ord(text[i])), 'sum'),
         0)::BIGINT AS payload_sum
FROM {table}
ORDER BY record_id
"""


# ---------------------------------------------------------------------------
# ZIP (PKZIP) — local file headers + central directory, stored & DEFLATE
# ---------------------------------------------------------------------------


def _doc_to_zip_entry(name: bytes, data: bytes, offset: int,
                      deflate: bool) -> tuple:
    """One ZIP entry: (local_header+payload bytes, central_directory
    record bytes). CRC-32 and both sizes are real; method 8 (DEFLATE,
    raw zlib stream) for ``deflate`` else 0 (stored)."""
    import struct
    import zlib

    crc = zlib.crc32(data) & 0xFFFFFFFF
    if deflate:
        comp = zlib.compressobj(6, zlib.DEFLATED, -15)
        payload = comp.compress(data) + comp.flush()
        method = 8
    else:
        payload = data
        method = 0
    local = (struct.pack("<IHHHHHIIIHH", 0x04034B50, 20, 0, method, 0, 0,
                         crc, len(payload), len(data), len(name), 0)
             + name + payload)
    central = (struct.pack("<IHHHHHHIIIHHHHHII", 0x02014B50, 20, 20, 0,
                           method, 0, 0, crc, len(payload), len(data),
                           len(name), 0, 0, 0, 0, 0, offset)
               + name)
    return local, central


def _docs_to_zip_bytes(entries: list) -> bytes:
    """Deterministic ZIP archive: entries = [(name_bytes, data_bytes)],
    alternating stored/DEFLATE by index, real central directory + EOCD."""
    import struct

    locals_ = []
    centrals = []
    offset = 0
    for i, (name, data) in enumerate(entries):
        local, central = _doc_to_zip_entry(name, data, offset, deflate=bool(i % 2))
        locals_.append(local)
        centrals.append(central)
        offset += len(local)
    cd = b"".join(centrals)
    eocd = struct.pack("<IHHHHIIH", 0x06054B50, 0, 0, len(entries),
                       len(entries), len(cd), offset, 0)
    return b"".join(locals_) + cd + eocd


def _parse_zip(blob: bytes) -> list:
    """Strict ZIP reader via the central directory (the authoritative
    index — never a linear scan for signatures): EOCD, CD records, local
    headers, CRC-verified decompression. Returns per-entry
    ``(name, method, n_bytes, payload_sum)``; raises on any structural
    or CRC mismatch."""
    import struct
    import zlib

    eocd_at = blob.rfind(b"\x50\x4b\x05\x06")
    if eocd_at < 0 or eocd_at + 22 > len(blob):
        raise ValueError("ZIP end-of-central-directory missing or truncated")
    (_, _, _, n_here, n_total, cd_size, cd_off, _) = struct.unpack(
        "<IHHHHIIH", blob[eocd_at:eocd_at + 22])
    out = []
    pos = cd_off
    for _ in range(n_total):
        if blob[pos:pos + 4] != b"\x50\x4b\x01\x02":
            raise ValueError("ZIP central-directory signature mismatch")
        (_, _, _, _, method, _, _, crc, csize, usize, nlen, xlen, clen,
         _, _, _, loff) = struct.unpack("<IHHHHHHIIIHHHHHII",
                                        blob[pos:pos + 46])
        name = blob[pos + 46:pos + 46 + nlen].decode("utf-8")
        pos += 46 + nlen + xlen + clen
        if blob[loff:loff + 4] != b"\x50\x4b\x03\x04":
            raise ValueError("ZIP local-header signature mismatch")
        lnlen, lxlen = struct.unpack("<HH", blob[loff + 26:loff + 30])
        dstart = loff + 30 + lnlen + lxlen
        payload = blob[dstart:dstart + csize]
        if len(payload) != csize:
            raise ValueError("ZIP entry payload truncated")
        data = (zlib.decompress(payload, -15) if method == 8
                else payload if method == 0
                else None)
        if data is None:
            raise ValueError(f"unsupported ZIP method {method}")
        if len(data) != usize or (zlib.crc32(data) & 0xFFFFFFFF) != crc:
            raise ValueError("ZIP entry CRC/size mismatch")
        out.append((name, method, usize, sum(data)))
    return out


ZIP_ENTRIES_SCHEMA = T.StructType([
    T.StructField("name", T.StringType()),
    T.StructField("method", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("payload_sum", T.LongType()),
])


def documents_as_zip(docs: DataFrame, *, entries_per_file: int = 50,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Pack documents into ZIP archives (``entries_per_file`` docs each,
    alternating stored/DEFLATE entries — both methods exercised in every
    archive). Returns ``(archive_id, payload)``."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        aid = int(pdf[id_col].iloc[0]) // entries_per_file
        return pd.DataFrame(
            {
                "archive_id": [aid],
                "payload": [_docs_to_zip_bytes([
                    (f"doc_{int(r[id_col])}.txt".encode("ascii"),
                     r[text_col].encode("utf-8"))
                    for _, r in pdf.iterrows()
                ])],
            }
        )

    return (
        docs.select(id_col, text_col)
        .groupBy(F.expr(f"{id_col} div {entries_per_file}"))
        .applyInPandas(pack, schema=T.StructType([
            T.StructField("archive_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]))
    )


def zip_entries(archives: DataFrame) -> DataFrame:
    """Explode every ZIP archive into its entries via the central
    directory, CRC-verified — the bulk-drop ingestion scan."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"name": [], "method": [], "n_bytes": [],
                    "payload_sum": []}
            for payload in pdf["payload"]:
                for name, method, usize, psum in _parse_zip(bytes(payload)):
                    rows["name"].append(name)
                    rows["method"].append(method)
                    rows["n_bytes"].append(usize)
                    rows["payload_sum"].append(psum)
            yield pd.DataFrame(rows)

    return archives.select("payload").mapInPandas(
        run, schema=ZIP_ENTRIES_SCHEMA
    )


def zip_entries_oracle_sql(entries_per_file: int = 50,
                           table: str = "documents",
                           id_col: str = "doc_id") -> str:
    """Per-entry fields recomputed from source rows; the method column
    reproduces the alternating stored/DEFLATE rule (index within the
    archive = doc_id mod entries_per_file since ids are dense)."""
    return f"""
SELECT 'doc_' || {id_col} || '.txt' AS name,
       (CASE WHEN ({id_col} % {entries_per_file}) % 2 = 1 THEN 8
             ELSE 0 END)::INT AS method,
       length(text)::BIGINT AS n_bytes,
       coalesce(list_aggregate(list_transform(
         range(1, (length(text) + 1)::INT), i -> ord(text[i])), 'sum'),
         0)::BIGINT AS payload_sum
FROM {table}
ORDER BY name
"""


# ---------------------------------------------------------------------------
# .warc.gz — each record its own gzip MEMBER (the actual Common Crawl
# on-disk form: per-record members make records independently seekable)
# ---------------------------------------------------------------------------


def _gzip_member(data: bytes) -> bytes:
    """One complete gzip member (RFC 1952): fixed header, raw DEFLATE
    body, CRC-32 + ISIZE trailer."""
    import struct
    import zlib

    comp = zlib.compressobj(6, zlib.DEFLATED, -15)
    body = comp.compress(data) + comp.flush()
    return (b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\xff" + body
            + struct.pack("<II", zlib.crc32(data) & 0xFFFFFFFF,
                          len(data) & 0xFFFFFFFF))


def _split_gzip_members(blob: bytes) -> list:
    """Decompress a concatenation of gzip members into the list of
    member payloads, CRC-checked; raises on malformed structure."""
    import struct
    import zlib

    out = []
    pos = 0
    while pos < len(blob):
        if blob[pos:pos + 3] != b"\x1f\x8b\x08":
            raise ValueError("gzip member magic/method mismatch")
        flg = blob[pos + 3]
        if flg != 0:
            raise ValueError("gzip FLG bits unsupported in this profile")
        d = zlib.decompressobj(-15)
        data = d.decompress(blob[pos + 10:])
        consumed = len(blob) - (pos + 10) - len(d.unused_data)
        trailer_at = pos + 10 + consumed
        if trailer_at + 8 > len(blob):
            raise ValueError("gzip member trailer truncated")
        crc, isize = struct.unpack("<II", blob[trailer_at:trailer_at + 8])
        if (zlib.crc32(data) & 0xFFFFFFFF) != crc or \
                (len(data) & 0xFFFFFFFF) != isize:
            raise ValueError("gzip member CRC/ISIZE mismatch")
        out.append(data)
        pos = trailer_at + 8
    return out


def documents_as_warc_gz(docs: DataFrame, *, records_per_file: int = 50,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """The production crawl shape: each WARC record wrapped in its OWN
    gzip member, members concatenated per archive — records stay
    independently seekable, which is why Common Crawl ships this form."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        aid = int(pdf[id_col].iloc[0]) // records_per_file
        return pd.DataFrame(
            {
                "archive_id": [aid],
                "payload": [b"".join(
                    _gzip_member(_doc_to_warc_bytes(
                        int(r[id_col]), r[text_col].encode("utf-8")))
                    for _, r in pdf.iterrows()
                )],
            }
        )

    return (
        docs.select(id_col, text_col)
        .groupBy(F.expr(f"{id_col} div {records_per_file}"))
        .applyInPandas(pack, schema=T.StructType([
            T.StructField("archive_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]))
    )


def warc_gz_records(archives: DataFrame) -> DataFrame:
    """Explode .warc.gz blobs: split gzip members (CRC-checked), parse
    each member as a WARC record — same output contract as
    :func:`warc_records`, so the two forms share one oracle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"record_id": [], "target_uri": [],
                    "content_length": [], "payload_sum": []}
            for payload in pdf["payload"]:
                for member in _split_gzip_members(bytes(payload)):
                    for rid, uri, clen, psum in _parse_warc(member):
                        rows["record_id"].append(rid)
                        rows["target_uri"].append(uri)
                        rows["content_length"].append(clen)
                        rows["payload_sum"].append(psum)
            yield pd.DataFrame(rows)

    return archives.select("payload").mapInPandas(
        run, schema=WARC_RECORDS_SCHEMA
    )


# ---------------------------------------------------------------------------
# tar (ustar) — the Pile-style bulk-drop container
# ---------------------------------------------------------------------------

def _tar_header(name: bytes, size: int) -> bytes:
    """One POSIX ustar header block (512 bytes): real checksum, octal
    size, fixed mode/uid/gid/mtime so archives are byte-deterministic."""
    if len(name) > 100:
        raise ValueError(
            f"tar member name exceeds the 100-byte ustar name field: "
            f"{name!r} ({len(name)} bytes)")
    h = bytearray(512)
    h[0:len(name)] = name                      # name (<=100)
    h[100:108] = b"0000644\x00"                # mode
    h[108:116] = b"0000000\x00"                # uid
    h[116:124] = b"0000000\x00"                # gid
    h[124:136] = f"{size:011o}".encode() + b"\x00"
    h[136:148] = b"00000000000\x00"            # mtime
    h[148:156] = b" " * 8                      # chksum placeholder
    h[156:157] = b"0"                          # typeflag: regular file
    h[257:263] = b"ustar\x00"                  # magic
    h[263:265] = b"00"                         # version
    chk = sum(h)
    h[148:156] = f"{chk:06o}".encode() + b"\x00 "
    return bytes(h)


def _docs_to_tar_bytes(entries: list) -> bytes:
    """Deterministic ustar archive: entries = [(name_bytes, data_bytes)],
    512-padded payloads, two zero end-blocks — stdlib ``tarfile`` opens
    it (interop-tested)."""
    out = []
    for name, data in entries:
        out.append(_tar_header(name, len(data)))
        out.append(data)
        pad = (-len(data)) % 512
        out.append(b"\x00" * pad)
    out.append(b"\x00" * 1024)
    return b"".join(out)


def _parse_tar(blob: bytes) -> list:
    """Strict ustar walker: magic + checksum verified per header, octal
    size, 512-block advance, terminating zero block. Returns per-entry
    ``(name, n_bytes, payload_sum)``; raises on any structural
    mismatch."""
    out = []
    pos = 0
    while pos + 512 <= len(blob):
        h = blob[pos:pos + 512]
        if h == b"\x00" * 512:
            break
        if h[257:263] != b"ustar\x00":
            raise ValueError(f"tar magic missing at offset {pos}")
        stored = int(h[148:156].rstrip(b"\x00 ").decode() or "0", 8)
        calc = sum(h[:148]) + 8 * 0x20 + sum(h[156:])
        if stored != calc:
            raise ValueError(f"tar header checksum mismatch at {pos}")
        name = h[0:100].rstrip(b"\x00").decode("utf-8")
        size = int(h[124:136].rstrip(b"\x00 ").decode() or "0", 8)
        data = blob[pos + 512:pos + 512 + size]
        if len(data) != size:
            raise ValueError(f"tar entry {name!r} payload truncated")
        out.append((name, size, sum(data)))
        pos += 512 + size + ((-size) % 512)
    else:
        raise ValueError("tar terminator block missing")
    return out


TAR_ENTRIES_SCHEMA = T.StructType([
    T.StructField("name", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("payload_sum", T.LongType()),
])


def documents_as_tar(docs: DataFrame, *, entries_per_file: int = 50,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Pack documents into ustar archives (``entries_per_file`` docs
    each) — the whole-group applyInPandas guarantee as the other archive
    writers. Returns ``(archive_id, payload)``."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        aid = int(pdf[id_col].iloc[0]) // entries_per_file
        return pd.DataFrame(
            {
                "archive_id": [aid],
                "payload": [_docs_to_tar_bytes([
                    (f"doc_{int(r[id_col])}.txt".encode("ascii"),
                     r[text_col].encode("utf-8"))
                    for _, r in pdf.iterrows()
                ])],
            }
        )

    return (
        docs.select(id_col, text_col)
        .groupBy(F.expr(f"{id_col} div {entries_per_file}"))
        .applyInPandas(pack, schema=T.StructType([
            T.StructField("archive_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]))
    )


def tar_entries(archives: DataFrame) -> DataFrame:
    """Explode every tar archive into its entries, header-checksum
    verified — the bulk-drop ingestion scan (mapInPandas record walker,
    blobs parsed where they sit)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"name": [], "n_bytes": [], "payload_sum": []}
            for payload in pdf["payload"]:
                for name, size, psum in _parse_tar(bytes(payload)):
                    rows["name"].append(name)
                    rows["n_bytes"].append(size)
                    rows["payload_sum"].append(psum)
            yield pd.DataFrame(rows)

    return archives.select("payload").mapInPandas(
        run, schema=TAR_ENTRIES_SCHEMA
    )


def tar_entries_oracle_sql(table: str = "documents",
                           id_col: str = "doc_id") -> str:
    """Per-entry fields recomputed straight from the source rows, in
    UTF-8 BYTE semantics to match the tar writer exactly: ``n_bytes`` is
    ``strlen`` (DuckDB's byte length, not character length) and
    ``payload_sum`` expands each code point to its UTF-8 byte values
    (1–4 bytes) before summing — so non-ASCII document text hashes
    identically on both sides."""
    u = f"unicode({table}.text[i])"
    utf8_sum = (
        f"CASE WHEN {u} < 128 THEN {u} "
        f"WHEN {u} < 2048 THEN 320 + {u} // 64 + {u} % 64 "
        f"WHEN {u} < 65536 THEN "
        f"480 + {u} // 4096 + ({u} // 64) % 64 + {u} % 64 "
        f"ELSE 624 + {u} // 262144 + ({u} // 4096) % 64 "
        f"+ ({u} // 64) % 64 + {u} % 64 END"
    )
    return f"""
SELECT 'doc_' || {id_col} || '.txt' AS name,
       strlen(text)::BIGINT AS n_bytes,
       coalesce(list_aggregate(list_transform(
         range(1, (length(text) + 1)::INT), i -> ({utf8_sum})), 'sum'),
         0)::BIGINT AS payload_sum
FROM {table}
ORDER BY name
"""
