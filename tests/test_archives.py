"""WARC and ZIP ingestion: container roundtrips, strictness, interop."""

import pytest

from cassandra_ttl_remover_spark.sources.archives import (
    _docs_to_zip_bytes,
    _parse_warc,
    _parse_zip,
    documents_as_warc,
    documents_as_zip,
    warc_records,
    zip_entries,
)


def test_warc_spark_roundtrip(spark, documents):
    docs = documents.limit(120)
    recs = warc_records(documents_as_warc(docs, records_per_file=25)).collect()
    texts = {r.doc_id: r.text.encode() for r in docs.collect()}
    assert len(recs) == len(texts)
    for r in recs:
        did = int(r.record_id[len("<urn:doc:"):-1])
        assert r.content_length == len(texts[did])
        assert r.payload_sum == sum(texts[did])
        assert r.target_uri.endswith(f"/doc/{did}")


def test_zip_spark_roundtrip_and_stdlib_interop(spark, documents):
    import io
    import zipfile

    docs = documents.limit(60)
    archives = documents_as_zip(docs, entries_per_file=20)
    ents = zip_entries(archives).collect()
    texts = {r.doc_id: r.text.encode() for r in docs.collect()}
    assert len(ents) == len(texts)
    methods = {e.method for e in ents}
    assert methods == {0, 8}  # both stored and DEFLATE exercised
    for e in ents:
        did = int(e.name[len("doc_"):-len(".txt")])
        assert e.n_bytes == len(texts[did]) and e.payload_sum == sum(texts[did])
    # any archive we wrote opens with the stdlib reader
    blob = bytes(archives.limit(1).collect()[0].payload)
    zf = zipfile.ZipFile(io.BytesIO(blob))
    assert len(zf.namelist()) == 20


def test_archive_parsers_strict():
    with pytest.raises(ValueError):
        _parse_warc(b"NOTWARC/1.0\r\n\r\n")
    good = _docs_to_zip_bytes([(b"a.txt", b"hello archive world")])
    with pytest.raises(ValueError):
        _parse_zip(good[:-2])  # truncated EOCD
    bad = bytearray(good)
    bad[40] ^= 0xFF  # flip a stored-payload byte -> CRC mismatch
    # (local header is 30 bytes + 5-byte name, so 40 is inside the data)
    with pytest.raises(ValueError):
        _parse_zip(bytes(bad))


def test_warc_gz_spark_roundtrip(spark, documents):
    import gzip

    from cassandra_ttl_remover_spark.sources.archives import (
        documents_as_warc_gz, warc_gz_records)

    docs = documents.limit(80)
    archives = documents_as_warc_gz(docs, records_per_file=40)
    recs = warc_gz_records(archives).collect()
    assert len(recs) == 80
    # stdlib gzip reads any archive we wrote (multi-member concatenation)
    blob = bytes(archives.limit(1).collect()[0].payload)
    assert gzip.decompress(blob).startswith(b"WARC/1.0\r\n")


def test_tar_roundtrip_interop_and_corruption(spark, documents):
    """Spark pack -> stdlib tarfile reads it; stdlib write -> our walker
    reads it; checksum/magic/truncation corruption all fail loud; the
    Spark explode equals the per-doc recomputation."""
    import io
    import tarfile

    import pytest as _pytest

    from cassandra_ttl_remover_spark.sources.archives import (
        _docs_to_tar_bytes,
        _parse_tar,
        documents_as_tar,
        tar_entries,
    )

    arcs = documents_as_tar(documents, entries_per_file=20)
    [blob] = [bytes(r.payload) for r in arcs.limit(1).collect()]
    names = [m.name for m in tarfile.open(fileobj=io.BytesIO(blob)).getmembers()]
    assert len(names) == 20 and all(n.startswith("doc_") for n in names)

    got = {(r.name, r.n_bytes, r.payload_sum)
           for r in tar_entries(arcs).collect()}
    want = {(f"doc_{r.doc_id}.txt", len(r.text.encode()),
             sum(r.text.encode()))
            for r in documents.collect()}
    assert got == want

    # corruption: flipped checksum digit, wrong magic, truncated payload,
    # missing terminator
    good = _docs_to_tar_bytes([(b"a.txt", b"hello")])
    bad = bytearray(good); bad[150] ^= 0x01
    with _pytest.raises(ValueError, match="checksum"):
        _parse_tar(bytes(bad))
    bad = bytearray(good); bad[257] ^= 0x01
    with _pytest.raises(ValueError, match="magic"):
        _parse_tar(bytes(bad))
    with _pytest.raises(ValueError, match="truncated|terminator"):
        _parse_tar(good[:512 + 2])
