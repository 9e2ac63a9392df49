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
