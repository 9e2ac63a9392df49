"""Simple-cell SSTable source: binary write -> parallel scan roundtrip,
split planning, decode-subset enforcement, and the TTL-strip transform on
the native format (the reference's core e2e —
cassandra-2/.../NoTTLColumnSerializer.java:24-51 decode dispatch)."""

import os
import shutil
import struct
import tempfile
import uuid

import pytest

from cassandra_ttl_remover_spark.sources import sstable as ss


def _tmpdir():
    return os.path.join(tempfile.gettempdir(), f"sst_{uuid.uuid4().hex[:8]}")


def _mixed_partitions():
    return [
        (b"u2", [
            (b"c1", ss.EXPIRATION_MASK, 600, 1_700_000_600, 1_700_000_000_000_000, b"v1"),
            (b"c2", 0, 0, 0, 1_700_000_000_000_001, b"v2"),
        ]),
        (b"u1", [
            (b"c1", ss.DELETION_MASK, 0, 0, 1_700_000_000_000_002,
             struct.pack(">i", 1_700_000_000)),
        ]),
        (b"u3", []),
    ]


def test_write_scan_roundtrip_all_kinds(spark):
    out = _tmpdir()
    ss.write_sstable(_mixed_partitions(), out)
    rows = sorted(
        tuple(r) for r in ss.scan_sstable(spark, out, num_splits=4).collect()
    )
    assert rows == [
        ("u1", "c1", "tombstone", None, 1_700_000_000, 1_700_000_000_000_002, None),
        ("u2", "c1", "expiring", 600, 1_700_000_600, 1_700_000_000_000_000, "v1"),
        ("u2", "c2", "normal", None, None, 1_700_000_000_000_001, "v2"),
    ]
    shutil.rmtree(out)


def test_writer_sorts_partitions_by_key_bytes():
    out = _tmpdir()
    ss.write_sstable(_mixed_partitions(), out)
    keys = [k for k, _ in ss.read_index(os.path.join(out, "Index.db"))]
    assert keys == sorted(keys) == [b"u1", b"u2", b"u3"]
    shutil.rmtree(out)


def test_splits_snap_to_partition_starts_and_cover_all(spark):
    """Every split boundary is a real partition offset from the index, so
    no decode ever starts mid-record; rows are produced exactly once for
    any split count (1, equal to, and far above the partition count)."""
    out = _tmpdir()
    parts = [(f"k{i:04d}".encode(),
              [(b"c", 0, 0, 0, i, str(i).encode())]) for i in range(37)]
    ss.write_sstable(parts, out)
    want = sorted((f"k{i:04d}", str(i)) for i in range(37))
    for n in (1, 5, 37, 200):
        got = sorted(
            (r.pk, r.value)
            for r in ss.scan_sstable(spark, out, num_splits=n).collect()
        )
        assert got == want, n
    shutil.rmtree(out)


def test_unsupported_mask_and_partition_deletion_fail_loud(spark):
    out = _tmpdir()
    ss.write_sstable(
        [(b"k", [(b"c", 0x40, 0, 0, 1, b"v")])], out  # unknown mask bit
    )
    with pytest.raises(Exception, match="not a recognized"):
        list(ss.scan_data_range(os.path.join(out, "Data.db"), 0, 10**9))
    shutil.rmtree(out)


def test_empty_table_scans_to_zero_rows(spark):
    out = _tmpdir()
    ss.write_sstable([], out)
    assert ss.scan_sstable(spark, out).count() == 0
    shutil.rmtree(out)


def test_register_sstable_source_is_unconditional(spark):
    """Registration must not be memoized on id(spark): a reused CPython id
    from a garbage-collected session would silently skip registration.
    Re-registering on every call is idempotent — repeated registration
    plus a scan must behave identically to a single registration."""
    ss.register_sstable_source(spark)
    ss.register_sstable_source(spark)
    out = _tmpdir()
    ss.write_sstable([], out)
    assert ss.scan_sstable(spark, out).count() == 0
    assert spark.conf.get("spark.sql.python.filterPushdown.enabled") == "true"
    shutil.rmtree(out)


def test_strip_ttl_cells_is_the_reference_transform(spark):
    """Expiring -> normal with ttl/expiration dropped; writetime, value,
    tombstones, and normal cells byte-identical — the exact contract of
    the reference's rewrite loop."""
    out = _tmpdir()
    ss.write_sstable(_mixed_partitions(), out)
    cells = ss.scan_sstable(spark, out, num_splits=2)
    stripped = sorted(tuple(r) for r in ss.strip_ttl_cells(cells).collect())
    assert stripped == [
        ("u1", "c1", "tombstone", None, 1_700_000_000, 1_700_000_000_000_002, None),
        ("u2", "c1", "normal", None, None, 1_700_000_000_000_000, "v1"),
        ("u2", "c2", "normal", None, None, 1_700_000_000_000_001, "v2"),
    ]
    # and no expiring cell survives anywhere
    assert ss.strip_ttl_cells(cells).filter("kind = 'expiring'").count() == 0
    shutil.rmtree(out)


def test_key_range_pushdown_prunes_bytes_and_matches_filter(spark):
    """The planner's key-range pruning (select_index_range) reads ONLY the
    selected partitions' byte run: split byte extents cover the exact
    [start-of-first-match, start-of-first-beyond) window, and results
    equal the full scan filtered post-hoc — for interior, prefix-shaped,
    open-ended, and empty ranges."""
    out = _tmpdir()
    parts = [(f"k{i:04d}".encode(),
              [(b"c", 0, 0, 0, i, str(i).encode())]) for i in range(37)]
    ss.write_sstable(parts, out)
    entries = ss.read_index(os.path.join(out, "Index.db"))
    size = os.path.getsize(os.path.join(out, "Data.db"))
    full = sorted((r.pk, r.value)
                  for r in ss.scan_sstable(spark, out).collect())
    for ks, kp in (("k0010", "k0020"), ("k000", "k001"),
                   ("k0030", None), (None, "k0005"), ("zz", None)):
        got = sorted(
            (r.pk, r.value)
            for r in ss.scan_sstable(spark, out, num_splits=4,
                                     key_start=ks, key_stop=kp).collect()
        )
        want = [(pk, v) for pk, v in full
                if (ks is None or pk >= ks) and (kp is None or pk < kp)]
        assert got == want, (ks, kp)
        lo, bs, be = ss.select_index_range(
            entries, size,
            ks.encode() if ks else None, kp.encode() if kp else None)
        # the byte window is exactly the matched run — pruning is real
        assert be - bs <= size
        if want:
            assert entries[lo][0].decode() == want[0][0]
    shutil.rmtree(out)


def test_point_lookup_decodes_one_partition(spark):
    """lookup_partition = index binary search + one seek: exactly the hit
    partition's cells, one split, and a miss is zero rows (not an
    error) — the reference scanner's per-partition access path."""
    out = _tmpdir()
    ss.write_sstable(_mixed_partitions(), out)
    got = sorted(tuple(r)
                 for r in ss.lookup_partition(spark, out, "u2").collect())
    assert [r[:3] for r in got] == [("u2", "c1", "expiring"),
                                    ("u2", "c2", "normal")]
    assert ss.lookup_partition(spark, out, "nope").count() == 0
    # prefix of a real key must not match ("u" is not "u1")
    assert ss.lookup_partition(spark, out, "u").count() == 0
    shutil.rmtree(out)


def test_catalyst_filter_pushdown_prunes_and_matches(spark):
    """df.filter on pk reaches the source as Catalyst pushdown: every
    comparison shape (=, >, >=, <, <=, LIKE-prefix, AND-combined, miss)
    returns exactly the post-hoc-filtered rows while the READER's planned
    splits shrink to the matching byte run; non-pk filters are yielded
    back to Spark."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThanOrEqual,
        StringContains,
        StringStartsWith,
    )

    out = _tmpdir()
    parts = [(f"k{i:04d}".encode(),
              [(b"c", 0, 0, 0, i, str(i).encode())]) for i in range(37)]
    ss.write_sstable(parts, out)
    df = ss.scan_sstable(spark, out)
    full = sorted(r.pk for r in df.collect())
    for pred, keep in [
        ("pk = 'k0007'", lambda k: k == "k0007"),
        ("pk > 'k0034'", lambda k: k > "k0034"),
        ("pk <= 'k0002'", lambda k: k <= "k0002"),
        ("pk >= 'k0010' AND pk < 'k0013'",
         lambda k: "k0010" <= k < "k0013"),
        ("pk LIKE 'k000%'", lambda k: k.startswith("k000")),
        ("pk = 'k0007' AND value = '8'", lambda k: False),
        ("pk = 'nope'", lambda k: False),
    ]:
        got = sorted(r.pk for r in df.filter(pred).collect())
        assert got == [k for k in full if keep(k)], pred

    # reader-level proof that pushdown PRUNES BYTES, not just rows
    def planned_bytes(filters):
        cls = ss._make_datasource_cls()
        reader = cls({"path": out}).reader(None)
        leftover = list(reader.pushFilters(filters))
        splits = reader.partitions()
        return leftover, sum(s.end - s.start for s in splits)

    _, all_bytes = planned_bytes([])
    lo, one = planned_bytes([EqualTo(("pk",), "k0007")])
    assert lo == [] and 0 < one < all_bytes / 10
    lo, pref = planned_bytes([StringStartsWith(("pk",), "k000")])
    assert lo == [] and one < pref < all_bytes / 2
    # unsupported: non-pk attribute and contains both stay with Spark
    lo, b = planned_bytes([EqualTo(("value",), "7"),
                           StringContains(("pk",), "007")])
    assert len(lo) == 2 and b == all_bytes
    # filters intersect with explicit key-range options
    cls = ss._make_datasource_cls()
    reader = cls({"path": out, "key_start": "k0005",
                  "key_stop": "k0030"}).reader(None)
    list(reader.pushFilters([GreaterThanOrEqual(("pk",), "k0020")]))
    assert reader.key_start == b"k0020" and reader.key_stop == b"k0030"
    shutil.rmtree(out)


def test_distributed_write_scan_roundtrip(spark):
    """The reference job's full e2e on the native format: scan -> strip ->
    DISTRIBUTED sharded write -> rescan. Every cell byte-roundtrips, each
    shard is a sorted sstable with non-overlapping key ranges, and the
    multi-shard scan prunes by key across shards."""
    src, dst = _tmpdir(), _tmpdir()
    parts = [(f"k{i:04d}".encode(),
              [(b"a", ss.EXPIRATION_MASK, 60, 1_700_000_060,
                1_000 + i, str(i).encode()),
               (b"b", 0, 0, 0, 2_000 + i, f"x{i}".encode())])
             for i in range(23)]
    ss.write_sstable(parts, src)
    stripped = ss.strip_ttl_cells(ss.scan_sstable(spark, src))
    report = ss.write_sstable_distributed(stripped, dst, shards=4)
    assert sum(r.n_cells for r in report) == 46
    assert 1 < len(report) <= 4
    # shard key ranges must not overlap (global sorted-run invariant)
    ranges = []
    for r in sorted(rr.shard for rr in report):
        keys = [k for k, _ in
                ss.read_index(os.path.join(dst, r, "Index.db"))]
        assert keys == sorted(keys)
        ranges.append((keys[0], keys[-1]))
    for (_, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi1 < lo2
    back = sorted(tuple(r)
                  for r in ss.scan_sstable(spark, dst).collect())
    want = sorted(tuple(r) for r in stripped.collect())
    assert back == want
    # key pruning works across the shard directory too
    one = ss.lookup_partition(spark, dst, "k0011").collect()
    assert sorted(r.cell for r in one) == ["a", "b"]
    shutil.rmtree(src), shutil.rmtree(dst)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _key = st.text(
        alphabet=st.characters(codec="utf-8",
                               blacklist_categories=("Cs",)),
        min_size=1, max_size=12,
    ).map(lambda s: s.encode("utf-8"))
    _name = st.text(min_size=1, max_size=8).map(lambda s: s.encode("utf-8"))
    _wt = st.integers(min_value=0, max_value=2**62)
    _cell = st.one_of(
        st.tuples(_name, st.just(0), st.just(0), st.just(0), _wt,
                  st.text(max_size=16).map(lambda s: s.encode("utf-8"))),
        st.tuples(_name, st.just(ss.EXPIRATION_MASK),
                  st.integers(1, 2**31 - 1), st.integers(0, 2**31 - 1),
                  _wt, st.text(max_size=16).map(lambda s: s.encode("utf-8"))),
        st.tuples(_name, st.just(ss.DELETION_MASK), st.just(0), st.just(0),
                  _wt, st.integers(0, 2**31 - 1).map(
                      lambda v: struct.pack(">i", v))),
    )
    _table = st.dictionaries(_key, st.lists(_cell, max_size=4), max_size=12)

    @given(table=_table, cut=st.tuples(_key, _key))
    @settings(max_examples=60, deadline=None)
    def test_property_binary_roundtrip_and_pruning(table, cut):
        """For ARBITRARY utf-8 keys/names/values (not just the ascii
        fixtures): write -> full decode recovers every cell with exact
        field fidelity, and index pruning for an arbitrary key range
        equals the post-hoc byte-range filter. Pure-Python (no Spark) so
        hypothesis can drive many cases."""
        parts = list(table.items())
        out = _tmpdir()
        try:
            ss.write_sstable(parts, out)
            data = os.path.join(out, "Data.db")
            got = list(ss.scan_data_range(data, 0, os.path.getsize(data)))
            want = []
            for k, cells in parts:
                pk = k.decode("utf-8")
                for n, m, t, e, w, v in cells:
                    if m == ss.EXPIRATION_MASK:
                        want.append((pk, n.decode(), "expiring", t, e, w,
                                     v.decode()))
                    elif m == ss.DELETION_MASK:
                        want.append((pk, n.decode(), "tombstone", None,
                                     struct.unpack(">i", v)[0], w, None))
                    else:
                        want.append((pk, n.decode(), "normal", None, None,
                                     w, v.decode()))
            assert sorted(got, key=repr) == sorted(want, key=repr)

            lo, hi = min(cut), max(cut)
            entries = ss.read_index(os.path.join(out, "Index.db"))
            _, bs, be = ss.select_index_range(
                entries, os.path.getsize(data), lo, hi)
            pruned = (list(ss.scan_data_range(data, bs, be))
                      if bs < be else [])
            want_rng = [r for r in got
                        if lo <= r[0].encode("utf-8") < hi]
            assert sorted(pruned, key=repr) == sorted(want_rng, key=repr)
        finally:
            shutil.rmtree(out, ignore_errors=True)
except ImportError:  # pragma: no cover - hypothesis always present in CI
    pass


def test_stream_source_drains_and_batches_per_shard_arrival(spark):
    """The streaming source: an availableNow drain equals the batch scan,
    and the offset protocol batches exactly the newly-arrived shards —
    consumed shards never replan, an unchanged directory plans nothing,
    and a shard added later shows up alone in the next delta."""
    from cassandra_ttl_remover_spark.streaming.ttl_stream import (
        drain_to_table,
    )

    out = _tmpdir()
    parts = [(f"k{i:04d}".encode(),
              [(b"c", 0, 0, 0, i, str(i).encode())]) for i in range(20)]
    ss.write_sstable(parts[:10], os.path.join(out, "shard=00000"))
    ss.write_sstable(parts[10:], os.path.join(out, "shard=00001"))
    got = drain_to_table(
        ss.stream_sstable(spark, out),
        f"sst_stream_{uuid.uuid4().hex[:6]}",
    )
    want = sorted(tuple(r) for r in ss.scan_sstable(spark, out).collect())
    assert sorted(tuple(r) for r in got.collect()) == want

    cls = ss._make_datasource_cls()
    rd = cls({"path": out}).streamReader(None)
    s0, s1 = rd.initialOffset(), rd.latestOffset()
    assert s0 == {"shards": []} and len(s1["shards"]) == 2
    assert len(rd.partitions(s1, s1)) == 0
    first = rd.partitions(s0, s1)
    ss.write_sstable(parts[:3], os.path.join(out, "shard=00002"))
    s2 = rd.latestOffset()
    assert set(s2["shards"]) - set(s1["shards"]) == {"shard=00002"}
    delta = rd.partitions(s1, s2)
    assert delta and all("shard=00002" in p.data_path for p in delta)
    assert len(rd.partitions(s0, s2)) > len(first)
    shutil.rmtree(out)


def test_events_fixture_scan_matches_duckdb_oracle(spark):
    """Miniature of the driver gate: generate the fixture at sf0.001,
    scan the binary, and value-match the SQL recomputation."""
    import duckdb

    from tests.conftest import SF_DIR

    out = _tmpdir()
    ss.events_sstable_fixture(spark, SF_DIR, out)
    got = sorted(
        tuple(r) for r in ss.scan_sstable(spark, out, num_splits=8).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    )
    want = sorted(tuple(r) for r in
                  con.execute(ss.sstable_scan_oracle_sql()).fetchall())
    assert got == want and len(got) == 3000
    shutil.rmtree(out)


def test_truncated_data_file_fails_loud(spark):
    """A Data.db cut mid-record raises CorruptSSTableError naming the
    file, offset, and field — quarantine semantics (the reference's
    markSuspect analog on the binary path), never partial partitions."""
    out = _tmpdir()
    ss.write_sstable(_mixed_partitions(), out)
    data = os.path.join(out, "Data.db")
    full = open(data, "rb").read()
    # cut inside u2's first cell body (u1 record decodes fine first)
    open(data, "wb").write(full[:len(full) - 7])
    with pytest.raises(ss.CorruptSSTableError, match="truncated"):
        list(ss.scan_data_range(data, 0, len(full)))
    shutil.rmtree(out)


def test_stream_source_applies_key_range_per_shard(spark):
    """The streaming reader prunes each new shard by the same key range
    as the batch planner."""
    out = _tmpdir()
    parts = [(f"k{i:04d}".encode(),
              [(b"c", 0, 0, 0, i, str(i).encode())]) for i in range(20)]
    ss.write_sstable(parts[:10], os.path.join(out, "shard=00000"))
    ss.write_sstable(parts[10:], os.path.join(out, "shard=00001"))
    cls = ss._make_datasource_cls()
    rd = cls({"path": out, "key_start": "k0008",
              "key_stop": "k0012"}).streamReader(None)
    splits = rd.partitions(rd.initialOffset(), rd.latestOffset())
    rows = sorted(r for s in splits
                  for r in ss.scan_data_range(s.data_path, s.start, s.end))
    assert [r[0] for r in rows] == ["k0008", "k0009", "k0010", "k0011"]
    shutil.rmtree(out)


def _atom_partitions():
    """Partitions exercising EVERY atom kind the reference decodes:
    counter (NoTTLColumnSerializer.java:26-32), counter-update (:47-49),
    range tombstone (NoTTLSerializer.java:31-33), plus the v1 kinds."""
    return [
        (b"u1", [
            (b"c0", ss.EXPIRATION_MASK, 600, 1_700_000_600,
             1_700_000_000_000_000, b"exp"),
            (b"c1", ss.COUNTER_MASK, 0, 1_699_999_999_000_000,
             1_700_000_000_000_001, b"42"),
            (b"c2", ss.COUNTER_UPDATE_MASK, 0, 0,
             1_700_000_000_000_002, b"7"),
            (b"c3", ss.RANGE_TOMBSTONE_MASK, 0, 1_700_000_000,
             1_700_000_000_000_003, b"c9"),
            (b"c4", 0, 0, 0, 1_700_000_000_000_004, b"norm"),
        ]),
    ]


def test_counter_and_rt_atoms_roundtrip_and_strip_verbatim(spark):
    """Counter / counter-update / range-tombstone atoms decode, pass
    through strip_ttl_cells BYTE-VERBATIM (counters can't have TTLs —
    the reference preserves them untouched), and survive the distributed
    write -> rescan loop; only the expiring cell is rewritten."""
    src, dst = _tmpdir(), _tmpdir()
    ss.write_sstable(_atom_partitions(), src)
    scanned = ss.scan_sstable(spark, src, num_splits=2)
    rows = sorted(tuple(r) for r in scanned.collect())
    assert rows == [
        ("u1", "c0", "expiring", 600, 1_700_000_600,
         1_700_000_000_000_000, "exp"),
        ("u1", "c1", "counter", None, 1_699_999_999_000_000,
         1_700_000_000_000_001, "42"),
        ("u1", "c2", "counter_update", None, None,
         1_700_000_000_000_002, "7"),
        ("u1", "c3", "range_tombstone", None, 1_700_000_000,
         1_700_000_000_000_003, "c9"),
        ("u1", "c4", "normal", None, None, 1_700_000_000_000_004, "norm"),
    ]
    stripped = ss.strip_ttl_cells(scanned)
    got = sorted(tuple(r) for r in stripped.collect())
    # the expiring cell is rewritten; every other atom is identical
    assert got[0] == ("u1", "c0", "normal", None, None,
                      1_700_000_000_000_000, "exp")
    assert got[1:] == rows[1:]
    # distributed sink -> rescan: byte-fidelity for the new atom kinds
    ss.write_sstable_distributed(stripped, dst, shards=2)
    again = sorted(tuple(r)
                   for r in ss.scan_sstable(spark, dst, num_splits=2).collect())
    assert again == got
    shutil.rmtree(src)
    shutil.rmtree(dst)


def test_generation_mc_scan_prune_and_distributed_roundtrip(spark):
    """Generation dispatch (reference SPI analog): the SAME DataSource
    scans both framings to identical rows; index pruning and the
    distributed sink work on the vint generation; Version.txt is the
    version tag and an unknown tag fails loud."""
    v1, mc, dst = _tmpdir(), _tmpdir(), _tmpdir()
    parts = _atom_partitions() + [
        (b"k" * 200, [(b"n" * 300, 0, 0, 0, 5, b"x" * 400)]),  # multi-byte vints
    ]
    ss.write_sstable(parts, v1, generation="v1")
    ss.write_sstable(parts, mc, generation="mc")
    rows_v1 = sorted(tuple(r)
                     for r in ss.scan_sstable(spark, v1, num_splits=3).collect())
    rows_mc = sorted(tuple(r)
                     for r in ss.scan_sstable(spark, mc, num_splits=3).collect())
    assert rows_v1 == rows_mc and len(rows_mc) == 6
    # key-range pruning consults the vint index identically
    pruned = ss.scan_sstable(spark, mc, num_splits=2,
                             key_start="u1", key_stop="u2").collect()
    assert sorted(r.pk for r in pruned) == ["u1"] * 5
    # distributed sink in the mc generation -> rescan
    ss.write_sstable_distributed(ss.scan_sstable(spark, mc), dst,
                                 shards=2, generation="mc")
    again = sorted(tuple(r) for r in ss.scan_sstable(spark, dst).collect())
    assert again == rows_mc
    # unknown version tag fails loud
    with open(os.path.join(mc, "Version.txt"), "w") as f:
        f.write("zz")
    with pytest.raises(Exception, match="unknown sstable format generation"):
        ss.read_index(os.path.join(mc, "Index.db"))
    for d in (v1, mc, dst):
        shutil.rmtree(d)


def test_compressed_data_file_scan_prune_and_sink_roundtrip(spark):
    """Chunk-compressed Data.db (CompressionInfo.db offsets map, the
    reference's CompressedRandomAccessReader surface): identical rows to
    the plain file, index-planned key-range pruning unchanged (offsets
    are uncompressed coordinates), multi-chunk payloads inflate across
    chunk boundaries, compression composes with the mc generation, and
    the distributed sink round-trips."""
    plain, comp, dst = _tmpdir(), _tmpdir(), _tmpdir()
    # > 64 KiB of data so multiple chunks exist and values span chunks
    parts = [(f"k{i:04d}".encode(),
              [(b"c", 0, 0, 0, i, (f"{i}:" * 400).encode())])
             for i in range(120)] + _atom_partitions()
    ss.write_sstable(parts, plain)
    ss.write_sstable(parts, comp, compressed=True)
    assert os.path.exists(os.path.join(comp, "CompressionInfo.db"))
    assert (os.path.getsize(os.path.join(comp, "Data.db"))
            < os.path.getsize(os.path.join(plain, "Data.db")))
    a = sorted(tuple(r)
               for r in ss.scan_sstable(spark, plain, num_splits=5).collect())
    b = sorted(tuple(r)
               for r in ss.scan_sstable(spark, comp, num_splits=5).collect())
    assert a == b
    pr = ss.scan_sstable(spark, comp, num_splits=3,
                         key_start="k0050", key_stop="k0060").collect()
    assert sorted({r.pk for r in pr}) == [f"k{i:04d}" for i in range(50, 60)]
    # mc + compressed distributed sink -> rescan
    ss.write_sstable_distributed(
        ss.scan_sstable(spark, comp), dst, shards=2,
        generation="mc", compressed=True)
    again = sorted(tuple(r) for r in ss.scan_sstable(spark, dst).collect())
    assert again == a
    for d in (plain, comp, dst):
        shutil.rmtree(d)


def test_partition_deletion_decodes_preserves_and_roundtrips(spark):
    """A partition-deletion header decodes as its own row kind, its cells
    still stream out, strip preserves it verbatim, and the distributed
    sink re-encodes it back into the header (write -> rescan fixpoint)."""
    src, dst = _tmpdir(), _tmpdir()
    parts = [
        (b"u1", [(b"c1", 0, 0, 0, 100, b"v1")],
         (1_700_000_000, 99)),                     # deleted, one live cell
        (b"u2", [(b"c1", ss.EXPIRATION_MASK, 60, 1_700_000_060, 200,
                  b"v2")]),                        # live partition
        (b"u3", [], (1_600_000_000, 50)),          # deleted, empty
    ]
    ss.write_sstable(parts, src)

    def key(t):
        return (t[0], t[1] or "", t[2])

    rows = sorted((tuple(r) for r in
                   ss.scan_sstable(spark, src, num_splits=2).collect()),
                  key=key)
    assert rows == [
        ("u1", None, "partition_tombstone", None, 1_700_000_000, 99, None),
        ("u1", "c1", "normal", None, None, 100, "v1"),
        ("u2", "c1", "expiring", 60, 1_700_000_060, 200, "v2"),
        ("u3", None, "partition_tombstone", None, 1_600_000_000, 50, None),
    ]
    stripped = ss.strip_ttl_cells(ss.scan_sstable(spark, src))
    got = sorted((tuple(r) for r in stripped.collect()), key=key)
    assert got[0] == rows[0] and got[3] == rows[3], "deletions must survive"
    ss.write_sstable_distributed(stripped, dst, shards=2)
    again = sorted((tuple(r) for r in
                    ss.scan_sstable(spark, dst).collect()), key=key)
    assert again == got
    shutil.rmtree(src)
    shutil.rmtree(dst)


def test_mixed_generation_directory_scans_as_one_table(spark):
    """A directory whose shard sstables use DIFFERENT framings (v1 + mc,
    one of them compressed) scans as one frame — the rolling-upgrade
    state a real cluster's data directory is in, and exactly the
    per-table dispatch the reference's SPI models."""
    out = _tmpdir()
    p1 = [(b"a1", [(b"c", 0, 0, 0, 1, b"x")])]
    p2 = [(b"b1", [(b"c", ss.EXPIRATION_MASK, 60, 100, 2, b"y")])]
    p3 = [(b"c1", [(b"c", 0, 0, 0, 3, b"z" * 500)])]
    ss.write_sstable(p1, os.path.join(out, "g1"))
    ss.write_sstable(p2, os.path.join(out, "g2"), generation="mc")
    ss.write_sstable(p3, os.path.join(out, "g3"), generation="mc",
                     compressed=True)
    rows = sorted((r.pk, r.kind, r.value)
                  for r in ss.scan_sstable(spark, out, num_splits=3).collect())
    assert rows == [("a1", "normal", "x"), ("b1", "expiring", "y"),
                    ("c1", "normal", "z" * 500)]
    shutil.rmtree(out)


def test_corrupt_compressed_chunk_fails_loud():
    """A flipped byte inside a compressed chunk surfaces as the module's
    CorruptSSTableError naming the chunk, not a bare zlib traceback."""
    out = _tmpdir()
    parts = [(b"k", [(b"c", 0, 0, 0, 1, b"v" * 100)])]
    ss.write_sstable(parts, out, compressed=True)
    dp = os.path.join(out, "Data.db")
    blob = bytearray(open(dp, "rb").read())
    blob[len(blob) // 2] ^= 0xFF
    open(dp, "wb").write(bytes(blob))
    with pytest.raises(ss.CorruptSSTableError, match="compressed chunk"):
        list(ss.scan_data_range(dp, 0, 10**9))
    shutil.rmtree(out)


def test_bloom_sidecar_no_false_negatives_and_prunes_absent():
    """Filter.db: every written key answers might_contain=True (false
    negatives are impossible by construction — the test pins it anyway),
    and keys from a DISJOINT table are overwhelmingly rejected (at 10
    bits/key, k=7 the expected FP rate is ~0.8%; 200 disjoint probes
    make a fully-permissive regression certain to fail)."""
    out = _tmpdir()
    keys = [f"k{i:05d}".encode() for i in range(300)]
    ss.write_sstable(
        [(k, [(b"c", 0, 0, 0, 1, b"v")]) for k in keys], out
    )
    assert all(ss.bloom_might_contain(out, k) for k in keys)
    other = [f"absent{i:05d}".encode() for i in range(200)]
    fp = sum(ss.bloom_might_contain(out, k) for k in other)
    assert fp <= 20  # ~0.8% expected; 10% is a generous determinism bound
    shutil.rmtree(out)


def test_bloom_prunes_generations_at_plan_time(spark):
    """A point lookup over a directory of generations consults each
    table's Filter.db BEFORE its index (the reference's probe order,
    NoTTLReader.java:1521-1529): the planner emits splits only for
    tables whose bloom passes, and the result rows are identical with
    the sidecar deleted (pruning is invisible to correctness)."""
    out = _tmpdir()
    ss.write_sstable([(b"even0", [(b"c", 0, 0, 0, 1, b"a")]),
                      (b"even2", [(b"c", 0, 0, 0, 2, b"b")])],
                     os.path.join(out, "g1"))
    ss.write_sstable([(b"odd1", [(b"c", 0, 0, 0, 3, b"c")]),
                      (b"odd3", [(b"c", 0, 0, 0, 4, b"d")])],
                     os.path.join(out, "g2"))

    cls = ss._make_datasource_cls()
    reader = cls({"path": out, "key_start": "even2",
                  "key_stop": "even2\x00"}).reader(None)
    list(reader.pushFilters([]))
    dirs = {os.path.basename(os.path.dirname(p.data_path))
            for p in reader.partitions()}
    assert dirs == {"g1"}  # g2 dropped by bloom, its index never planned

    rows = [(r.pk, r.value)
            for r in ss.lookup_partition(spark, out, "even2").collect()]
    assert rows == [("even2", "b")]
    # sidecar absent (pre-bloom table) -> no pruning, same answer
    os.remove(os.path.join(out, "g2", "Filter.db"))
    rows2 = [(r.pk, r.value)
             for r in ss.lookup_partition(spark, out, "even2").collect()]
    assert rows2 == rows
    # range scans never consult the bloom (it answers point questions)
    allrows = ss.scan_sstable(spark, out, num_splits=2).count()
    assert allrows == 4
    shutil.rmtree(out)


def test_corrupt_filter_sidecar_fails_loud():
    out = _tmpdir()
    ss.write_sstable([(b"k1", [(b"c", 0, 0, 0, 1, b"v")])], out)
    fp = os.path.join(out, "Filter.db")
    open(fp, "wb").write(b"\x00\x01")  # truncated header
    with pytest.raises(ss.CorruptSSTableError, match="Filter.db header"):
        ss.bloom_might_contain(out, b"k1")
    open(fp, "wb").write(struct.pack(">QB", 128, 7) + b"\x00" * 3)
    with pytest.raises(ss.CorruptSSTableError, match="Filter.db"):
        ss.bloom_might_contain(out, b"k1")
    # an absurd m (multiple of 64) must hit the quarantine path BEFORE
    # any read attempt sized by it
    open(fp, "wb").write(struct.pack(">QB", 1 << 60, 7) + b"\x00" * 8)
    with pytest.raises(ss.CorruptSSTableError, match="implausible"):
        ss.bloom_might_contain(out, b"k1")
    shutil.rmtree(out)


def test_summary_windowed_index_read_matches_full(spark):
    """Summary-assisted planning: for every probed range the windowed
    index read yields exactly the splits (and rows) the full index read
    yields, while parsing a strictly smaller index window for narrow
    ranges — both framings, including ranges straddling sample
    boundaries, before the first key, and past the last."""
    for gen in ("v1", "mc"):
        out = _tmpdir()
        parts = [(f"k{i:04d}".encode(),
                  [(b"c", 0, 0, 0, i, str(i).encode())])
                 for i in range(300)]
        ss.write_sstable(parts, out, generation=gen, summary_interval=8)
        samples = ss._read_summary(out)
        assert samples is not None and len(samples) == (300 + 7) // 8
        full = ss.read_index(os.path.join(out, "Index.db"))
        size = ss._data_size(out)
        probes = [(b"k0000", b"k0000\x00"), (b"k0007", b"k0009"),
                  (b"k0125", b"k0130\x00"), (b"a", b"k0003"),
                  (b"k0290", b"zzz"), (None, b"k0004"), (b"k0299", None),
                  (b"nope", b"nope\x00")]
        for ks, kp in probes:
            win, wsize = ss._read_index_window(out, samples, ks, kp)
            got = ss.select_index_range(win, wsize, ks, kp)
            want = ss.select_index_range(full, size, ks, kp)
            # same byte run (entry index differs by the window offset)
            assert got[1:] == want[1:], (gen, ks, kp)
            if ks is not None and kp is not None and kp != b"zzz":
                assert len(win) < len(full), (gen, ks, kp)
        # end-to-end: a pushed range scan returns identical rows with
        # and without the summary sidecar
        rows = sorted(
            (r.pk, r.value) for r in
            ss.scan_sstable(spark, out, num_splits=4,
                            key_start="k0100", key_stop="k0200").collect()
        )
        os.remove(os.path.join(out, "Summary.db"))
        rows2 = sorted(
            (r.pk, r.value) for r in
            ss.scan_sstable(spark, out, num_splits=4,
                            key_start="k0100", key_stop="k0200").collect()
        )
        assert rows == rows2
        assert len(rows) == 100
        shutil.rmtree(out)


def test_post_2038_deletion_seconds_saturate_not_crash(spark):
    """ADVICE r8: localDeletionTime is an on-disk int32 of seconds;
    atoms with writetime >= 2^31 seconds (year 2038+) must saturate at
    INT32_MAX — Cassandra's own no-expiry sentinel — instead of raising
    struct.error mid-task. Unit-pins both cell constructors, then runs
    the gc rewrite end-to-end on a future-dated tombstone."""
    wt_2100 = 4_102_444_800 * 1_000_000  # year 2100, epoch µs
    name, mask, ttl, exp, wt, val = ss._status_to_cell(
        "c1", wt_2100, None, "tombstone_retained")
    assert struct.unpack(">i", val)[0] == ss.INT32_MAX
    _, _, _, exp_rt, _, _ = ss._status_to_cell(
        "c1", wt_2100, "c9", "range_tombstone_retained")
    assert exp_rt == ss.INT32_MAX
    cell = ss._row_to_cell("c1", "tombstone", None, wt_2100 // 1_000_000,
                           wt_2100, None)
    assert struct.unpack(">i", cell[5])[0] == ss.INT32_MAX
    cell = ss._row_to_cell("c1", "expiring", 60,
                           wt_2100 // 1_000_000 + 60, wt_2100, "v")
    assert cell[3] == ss.INT32_MAX

    src, dst = _tmpdir(), _tmpdir()
    ss.write_sstable(
        [(b"k1", [
            (b"c1", ss.DELETION_MASK, 0, 0, wt_2100,
             struct.pack(">i", ss.INT32_MAX)),
            (b"c2", 0, 0, 0, wt_2100 + 1, b"v"),
        ])], src)
    # retained (inside grace): rewrite re-encodes the tombstone — the
    # crash site before the clamp
    reports = ss.gc_rewrite_single(spark, src, dst, gc_grace_us=10**15,
                                   now_us=wt_2100 + 2)
    assert reports
    got = sorted(tuple(r) for r in ss.scan_sstable(spark, dst).collect())
    kinds = [(r[1], r[2]) for r in got]
    assert ("c1", "tombstone") in kinds and ("c2", "normal") in kinds
    shutil.rmtree(src), shutil.rmtree(dst)


def test_merge_planner_ships_cut_keys_as_opaque_bytes(spark):
    """ADVICE r8: non-UTF-8 partition keys must not crash the merge
    PLANNER (cut points now travel as hex, compared as bytes). The data
    format's row decode is string-typed by declared convention, so this
    pins exactly the planner boundary: plan construction over binary
    keys succeeds without a UnicodeDecodeError."""
    base = _tmpdir()
    keys = [bytes([b, 0xFF, 0xFE]) for b in range(64)]  # invalid UTF-8
    for gen, sl in (("gen1", keys[0::2]), ("gen2", keys[1::2])):
        ss.write_sstable(
            [(k, [(b"c", 0, 0, 0, 1, b"v")]) for k in sl],
            os.path.join(base, gen), summary_interval=4)
    dirs = ss._resolve_table_dirs(base)
    cuts = ss._plan_merge_cuts(dirs, num_splits=4)
    assert cuts and all(isinstance(c, bytes) for c in cuts)
    # planner construction (driver side) must not UnicodeDecodeError
    df = ss.merge_compact_sorted(spark, base, gc_grace_us=0,
                                 now_us=10, num_splits=4)
    assert df.schema.fieldNames() == [
        "pk", "cell", "writetime", "value", "status"]
    shutil.rmtree(base)


def test_first_key_beyond_successor_and_bounded_window(spark):
    """Native S5 (firstKeyBeyond, NoTTLReader.java:1680-1715): for every
    probe position — before the first key, at a key, between keys, at a
    sample boundary, at/past the last key — the successor equals the
    exhaustive index answer, the probe parses ONLY the covering
    Summary.db-resolved Index.db window (strictly fewer bytes than the
    full index), and a table with no Summary.db falls back to the full
    parse with the same answer. Directory-level min over the
    per-generation frame resolves the multi-table successor."""
    for gen in ("v1", "mc"):
        out = _tmpdir()
        parts = [(f"k{i:04d}".encode(),
                  [(b"c", 0, 0, 0, i, str(i).encode())])
                 for i in range(300)]
        ss.write_sstable(parts, out, generation=gen, summary_interval=8)
        keys = [k for k, _ in ss.read_index(os.path.join(out, "Index.db"))]
        import bisect
        probes = [b"a", b"k0000", b"k0007", b"k0007\x00", b"k0125",
                  b"k0128", b"k0240", b"k0298", b"k0299", b"zzz"]
        for p in probes:
            nxt, parsed, total = ss._successor_in_dir(out, p)
            i = bisect.bisect_right(keys, p)
            want = keys[i] if i < len(keys) else None
            assert nxt == want, (gen, p)
            assert parsed < total, (gen, p, parsed, total)
        # no-Summary fallback: full parse, same successor
        os.remove(os.path.join(out, "Summary.db"))
        nxt, parsed, total = ss._successor_in_dir(out, b"k0125")
        assert nxt == b"k0126" and parsed == total
        shutil.rmtree(out)

    # distributed directory shape: per-generation rows + NULL contract
    base = _tmpdir()
    ss.write_sstable([(b"a1", [(b"c", 0, 0, 0, 1, b"v")]),
                      (b"a3", [(b"c", 0, 0, 0, 1, b"v")])],
                     os.path.join(base, "gen1"))
    ss.write_sstable([(b"a2", [(b"c", 0, 0, 0, 1, b"v")])],
                     os.path.join(base, "gen2"))
    rows = {r.generation: r.next_key
            for r in ss.first_key_beyond(spark, base, "a2").collect()}
    assert rows == {"gen1": "a3", "gen2": None}
    shutil.rmtree(base)


def test_resample_summary_both_paths_and_invariance(spark):
    """Adaptive summary resample (NoTTLReader.java:1062-1140 analog):
    (a) the DOWNSAMPLE path (dense -> keep every f-th existing sample)
    produces a Summary.db BYTE-IDENTICAL to a fresh write at the lifted
    interval — the phase-alignment property the docstring claims; (b)
    the REBUILD path (sparse -> walk Index.db) likewise; (c) in-band
    intervals are a noop; (d) a table with no Summary.db rebuilds at
    the min; (e) the per-table byte budget lifts the interval until the
    summary fits; (f) pushed range scans return identical rows before
    and after every resample. Both generations exercise the index walk
    framing."""
    def _summary_bytes(d):
        return open(os.path.join(d, "Summary.db"), "rb").read()

    parts = [(f"k{i:04d}".encode(), [(b"c", 0, 0, 0, i, str(i).encode())])
             for i in range(300)]
    for gen in ("v1", "mc"):
        # (a) downsample: interval 2 -> min 8 (f=4)
        dn, ref = _tmpdir(), _tmpdir()
        ss.write_sstable(parts, dn, generation=gen, summary_interval=2)
        before = sorted(
            (r.pk, r.value) for r in ss.scan_sstable(
                spark, dn, key_start="k0050", key_stop="k0150").collect())
        rep = ss.resample_summary_dir(dn, min_index_interval=8,
                                      max_index_interval=64)
        assert (rep["action"], rep["interval_after"]) == ("downsample", 8)
        assert rep["entries_before"] == 150 and rep["entries_after"] == 38
        ss.write_sstable(parts, ref, generation=gen, summary_interval=8)
        assert _summary_bytes(dn) == _summary_bytes(ref)
        # (b) rebuild: interval 8 -> max 4
        rep = ss.resample_summary_dir(dn, min_index_interval=2,
                                      max_index_interval=4)
        assert (rep["action"], rep["interval_after"]) == ("rebuild", 4)
        ref4 = _tmpdir()
        ss.write_sstable(parts, ref4, generation=gen, summary_interval=4)
        assert _summary_bytes(dn) == _summary_bytes(ref4)
        # (c) noop in band
        rep = ss.resample_summary_dir(dn, min_index_interval=2,
                                      max_index_interval=64)
        assert rep["action"] == "noop" and rep["entries_after"] == 75
        # (f) scans unchanged through all of it
        after = sorted(
            (r.pk, r.value) for r in ss.scan_sstable(
                spark, dn, key_start="k0050", key_stop="k0150").collect())
        assert after == before and len(after) == 100
        shutil.rmtree(dn), shutil.rmtree(ref), shutil.rmtree(ref4)

    # (d) no summary -> rebuild at min
    d = _tmpdir()
    ss.write_sstable(parts, d, summary_interval=8)
    os.remove(os.path.join(d, "Summary.db"))
    rep = ss.resample_summary_dir(d, min_index_interval=16,
                                  max_index_interval=64)
    assert (rep["action"], rep["interval_before"],
            rep["interval_after"]) == ("rebuild", None, 16)
    assert rep["entries_after"] == (300 + 15) // 16
    # (e) budget: current summary is ~19 entries; cap to fit ~5
    size = os.path.getsize(os.path.join(d, "Summary.db"))
    per_entry = (size - 8) / rep["entries_after"]
    rep = ss.resample_summary_dir(
        d, min_index_interval=16, max_index_interval=1024,
        summary_budget_bytes=int(8 + 5 * per_entry))
    assert rep["action"] == "downsample" and rep["entries_after"] <= 5
    assert os.path.getsize(os.path.join(d, "Summary.db")) <= 8 + 5 * per_entry
    shutil.rmtree(d)


def test_corrupt_summary_fails_loud():
    out = _tmpdir()
    ss.write_sstable([(b"k1", [(b"c", 0, 0, 0, 1, b"v")])], out)
    sp = os.path.join(out, "Summary.db")
    open(sp, "wb").write(struct.pack(">II", 64, 5) + b"\x00\x02")
    with pytest.raises(ss.CorruptSSTableError, match="Summary.db"):
        ss._read_summary(out)
    shutil.rmtree(out)


def test_stats_sidecar_counts_and_bounds():
    """Statistics.db mirrors exactly what the scan emits: cell counts,
    expiring counts, writetime bounds (including tombstone and
    partition-deletion timestamps), ttl bounds; empty tables write the
    inverted no-rows sentinel."""
    out = _tmpdir()
    ss.write_sstable(_mixed_partitions(), out)
    st = ss.read_stats(out)
    assert st == {
        "n_partitions": 3, "n_cells": 3, "n_expiring": 1,
        "min_writetime": 1_700_000_000_000_000,
        "max_writetime": 1_700_000_000_000_002,
        "min_ttl": 600, "max_ttl": 600,
    }
    shutil.rmtree(out)
    ss.write_sstable([], out)
    st = ss.read_stats(out)
    assert st["min_writetime"] > st["max_writetime"]  # no-rows sentinel
    shutil.rmtree(out)
    # a partition-deletion's markedForDeleteAt widens the bounds
    ss.write_sstable(
        [(b"k", [(b"c", 0, 0, 0, 500, b"v")], (1_600_000_000, 99))], out
    )
    st = ss.read_stats(out)
    assert (st["min_writetime"], st["max_writetime"]) == (99, 500)
    shutil.rmtree(out)


def test_stats_census_reports_ttl_debt_and_strip_clears_it(spark):
    """The census answers the reference tool's question from sidecars
    alone, and after the distributed strip the output generations
    report n_expiring = 0 — the operational 'TTL debt paid' check,
    without scanning a byte of data."""
    out = _tmpdir()
    ss.write_sstable(_mixed_partitions(), os.path.join(out, "g1"))
    ss.write_sstable(
        [(b"z1", [(b"c", ss.EXPIRATION_MASK, 60, 100, 7, b"v")])],
        os.path.join(out, "g2"))
    rows = {r.generation: r for r in ss.stats_census(spark, out).collect()}
    assert rows["g1"].n_expiring == 1 and rows["g2"].n_expiring == 1
    assert rows["g2"].min_ttl == 60
    stripped = ss.strip_ttl_cells(ss.scan_sstable(spark, out))
    dst = _tmpdir()
    ss.write_sstable_distributed(stripped, dst, shards=2)
    after = ss.stats_census(spark, dst).collect()
    assert after and all(r.n_expiring == 0 for r in after)
    assert sum(r.n_cells for r in after) == 4
    shutil.rmtree(out)
    shutil.rmtree(dst)


def test_stats_census_missing_sidecar_fails_loud(spark):
    out = _tmpdir()
    ss.write_sstable(_mixed_partitions(), os.path.join(out, "g1"))
    os.remove(os.path.join(out, "g1", "Statistics.db"))
    with pytest.raises(Exception, match="no Statistics.db"):
        ss.stats_census(spark, out).collect()
    shutil.rmtree(out)


def test_writetime_filter_skips_disjoint_generations(spark):
    """A pushed writetime predicate prunes non-intersecting generations
    at PLAN time via Statistics.db (min/max skip) while Spark still
    applies the filter exactly; without the sidecar, no pruning, same
    rows. All comparison shapes."""
    out = _tmpdir()
    old = [(f"a{i}".encode(), [(b"c", 0, 0, 0, 1000 + i, b"old")])
           for i in range(5)]
    new = [(f"b{i}".encode(), [(b"c", 0, 0, 0, 3000 + i, b"new")])
           for i in range(5)]
    ss.write_sstable(old, os.path.join(out, "g_old"))
    ss.write_sstable(new, os.path.join(out, "g_new"))

    cls = ss._make_datasource_cls()
    from pyspark.sql.datasource import GreaterThan, LessThanOrEqual

    reader = cls({"path": out}).reader(None)
    leftover = list(reader.pushFilters([GreaterThan(("writetime",), 2000)]))
    assert len(leftover) == 1  # inspect-only: Spark keeps the filter
    dirs = {os.path.basename(os.path.dirname(p.data_path))
            for p in reader.partitions()}
    assert dirs == {"g_new"}

    reader = cls({"path": out}).reader(None)
    list(reader.pushFilters([LessThanOrEqual(("writetime",), 1004)]))
    dirs = {os.path.basename(os.path.dirname(p.data_path))
            for p in reader.partitions()}
    assert dirs == {"g_old"}

    # e2e through Catalyst: rows equal the post-hoc filter, with and
    # without the sidecars
    want = sorted((r.pk, r.writetime) for r in
                  ss.scan_sstable(spark, out).collect()
                  if r.writetime > 2000)
    got = sorted((r.pk, r.writetime) for r in
                 ss.scan_sstable(spark, out)
                 .filter("writetime > 2000").collect())
    assert got == want and len(got) == 5
    os.remove(os.path.join(out, "g_old", "Statistics.db"))
    got2 = sorted((r.pk, r.writetime) for r in
                  ss.scan_sstable(spark, out)
                  .filter("writetime > 2000").collect())
    assert got2 == want
    shutil.rmtree(out)


def test_digest_and_toc_sidecars_written_and_exact():
    """Every write emits Digest.crc32 (= zlib CRC of Data.db as stored,
    ASCII decimal) and TOC.txt naming exactly the component files."""
    import zlib

    out = _tmpdir()
    ss.write_sstable(_mixed_partitions(), out)
    with open(os.path.join(out, "Data.db"), "rb") as f:
        want = zlib.crc32(f.read()) & 0xFFFFFFFF
    with open(os.path.join(out, "Digest.crc32")) as f:
        assert int(f.read().strip()) == want
    with open(os.path.join(out, "TOC.txt")) as f:
        named = sorted(ln.strip() for ln in f if ln.strip())
    assert named == sorted(os.listdir(out))
    assert "TOC.txt" in named and "Digest.crc32" in named
    shutil.rmtree(out)


def test_digest_covers_stored_bytes_for_compressed_tables():
    out = _tmpdir()
    ss.write_sstable(_mixed_partitions(), out, compressed=True)
    import zlib

    with open(os.path.join(out, "Data.db"), "rb") as f:
        want = zlib.crc32(f.read()) & 0xFFFFFFFF
    with open(os.path.join(out, "Digest.crc32")) as f:
        assert int(f.read().strip()) == want
    shutil.rmtree(out)


def test_verify_digests_detects_any_single_byte_flip(spark):
    """Healthy dir verifies clean; flipping one byte at several offsets
    (first, mid, last) fails digest_ok for exactly that generation; a
    file missing from / extra beyond TOC fails toc_ok."""
    base = _tmpdir()
    for gen, where_mod in (("gen1", 0), ("gen2", 1)):
        ss.write_sstable(
            [(f"u{i}".encode(),
              [(b"c", 0, 0, 0, 1_700_000_000_000_000 + i,
                str(i).encode())])
             for i in range(20) if i % 2 == where_mod],
            os.path.join(base, gen),
        )
    healthy = {r.generation: (r.digest_ok, r.toc_ok, r.data_length)
               for r in ss.verify_digests(spark, base).collect()}
    assert healthy["gen1"][:2] == (True, True)
    assert healthy["gen2"][:2] == (True, True)
    data_path = os.path.join(base, "gen2", "Data.db")
    assert healthy["gen2"][2] == os.path.getsize(data_path)

    size = os.path.getsize(data_path)
    for off in (0, size // 2, size - 1):
        with open(data_path, "r+b") as f:
            f.seek(off)
            b = f.read(1)
            f.seek(off)
            f.write(bytes([b[0] ^ 0x5A]))
        got = {r.generation: r.digest_ok
               for r in ss.verify_digests(spark, base).collect()}
        assert got == {"gen1": True, "gen2": False}
        with open(data_path, "r+b") as f:  # restore
            f.seek(off)
            f.write(b)
    # restored file verifies again
    got = {r.generation: r.digest_ok
           for r in ss.verify_digests(spark, base).collect()}
    assert got == {"gen1": True, "gen2": True}

    # TOC divergence: extra untracked file
    extra = os.path.join(base, "gen1", "Stray.db")
    with open(extra, "w") as f:
        f.write("x")
    got = {r.generation: r.toc_ok
          for r in ss.verify_digests(spark, base).collect()}
    assert got == {"gen1": False, "gen2": True}
    os.remove(extra)
    # missing component named by TOC
    os.remove(os.path.join(base, "gen2", "Summary.db"))
    got = {r.generation: r.toc_ok
           for r in ss.verify_digests(spark, base).collect()}
    assert got == {"gen1": True, "gen2": False}
    shutil.rmtree(base)


def test_verify_digests_missing_sidecar_fails_not_skips(spark):
    base = _tmpdir()
    ss.write_sstable(_mixed_partitions(), os.path.join(base, "g1"))
    os.remove(os.path.join(base, "g1", "Digest.crc32"))
    [r] = ss.verify_digests(spark, base).collect()
    assert r.digest_ok is False and r.toc_ok is False
    shutil.rmtree(base)


def _wide_partitions(n_cells=40):
    cells = []
    for i in range(n_cells):
        name = f"{i:06d}:c".encode()
        if i % 7 == 0:
            cells.append((name, ss.DELETION_MASK, 0, 0,
                          1_700_000_000_000_000 + i,
                          struct.pack(">i", 1_700_000_000)))
        elif i % 3 == 0:
            cells.append((name, ss.EXPIRATION_MASK, 600,
                          1_700_000_600, 1_700_000_000_000_000 + i,
                          f"v{i}".encode()))
        else:
            cells.append((name, 0, 0, 0,
                          1_700_000_000_000_000 + i, f"v{i}".encode()))
    return [(b"wide", cells), (b"narrow", cells[:2])]


def test_column_index_slice_equals_filtered_scan(spark):
    """Slice through the promoted column index == the full-scan filter,
    across all cell kinds and both generations, with and without
    compression."""
    for gen in ("v1", "mc"):
        for comp in (False, True):
            out = _tmpdir()
            ss.write_sstable(_wide_partitions(), out, generation=gen,
                             compressed=comp, colindex_every=8)
            full = ss.scan_sstable(spark, out)
            want = sorted(
                tuple(r) for r in full.collect()
                if r.pk == "wide" and "000005:" <= r.cell < "000030:"
            )
            got = sorted(tuple(r) for r in ss.scan_partition_slice(
                spark, out, "wide", "000005:", "000030:").collect())
            assert got == want and len(got) == 25, (gen, comp, len(got))
            shutil.rmtree(out)


def test_column_index_plan_prunes_blocks():
    """A late slice must seek past the early blocks (the O(slice) claim);
    the no-sidecar fallback plans from the partition head; a bloom-
    excluded key plans to None."""
    out = _tmpdir()
    ss.write_sstable(_wide_partitions(), out, colindex_every=8)
    # a start BEFORE the first block name plans from the partition head
    # (equivalent bytes; the first block begins at the first cell)
    pre = ss.plan_partition_slice(out, b"wide", b"000000:")
    assert pre is not None and pre[1] is False
    early = ss.plan_partition_slice(out, b"wide", b"000001:")
    late = ss.plan_partition_slice(out, b"wide", b"000035:")
    assert early is not None and late is not None
    assert late[1] and early[1] and late[0] > early[0]
    assert ss.plan_partition_slice(out, b"absent-key", b"x") is None
    os.remove(os.path.join(out, "ColumnIndex.db"))
    head = ss.plan_partition_slice(out, b"wide", b"000035:")
    assert head is not None and head[1] is False
    shutil.rmtree(out)


def test_column_index_fallback_without_sidecar_still_correct(spark):
    out = _tmpdir()
    ss.write_sstable(_wide_partitions(), out, colindex_every=8)
    want = sorted(tuple(r) for r in ss.scan_partition_slice(
        spark, out, "wide", "000010:", "000020:").collect())
    os.remove(os.path.join(out, "ColumnIndex.db"))
    got = sorted(tuple(r) for r in ss.scan_partition_slice(
        spark, out, "wide", "000010:", "000020:").collect())
    assert got == want and len(got) == 10
    shutil.rmtree(out)


def test_corrupt_column_index_fails_loud():
    out = _tmpdir()
    ss.write_sstable(_wide_partitions(), out, colindex_every=8)
    p = os.path.join(out, "ColumnIndex.db")
    with open(p, "r+b") as f:
        f.truncate(os.path.getsize(p) - 3)
    with pytest.raises(ss.CorruptSSTableError, match="ColumnIndex"):
        ss._read_column_index(out)
    shutil.rmtree(out)


def test_slice_reemits_open_range_tombstones(spark):
    """An RT opened in an earlier block must reach a slice that starts
    past it (via the block's open-RT marker); RTs opening inside the
    covering block before the slice are kept too; RTs whose range ends
    before the slice are not re-emitted."""
    cells = []
    # RT covering 000005..000025, written early (block 0)
    cells.append((b"000002:", ss.RANGE_TOMBSTONE_MASK, 0,
                  1_700_000_000, 1_700_000_000_000_500, b"000025:"))
    # RT fully before the slice window
    cells.append((b"000003:", ss.RANGE_TOMBSTONE_MASK, 0,
                  1_700_000_000, 1_700_000_000_000_501, b"000004:"))
    for i in range(40):
        cells.append((f"{i:06d}:c".encode(), 0, 0, 0,
                      1_700_000_000_000_000 + i, f"v{i}".encode()))
    # writer sorts partitions, not cells — order cells ourselves
    cells.sort(key=lambda c: c[0])
    out = _tmpdir()
    ss.write_sstable([(b"wide", cells)], out, colindex_every=8)
    got = sorted(
        (r.cell, r.kind, r.value)
        for r in ss.scan_partition_slice(
            spark, out, "wide", "000020:", "000030:").collect()
    )
    kinds = [k for _, k, _ in got]
    # the open RT from block 0 is re-emitted; the dead one is not
    assert ("000002:", "range_tombstone", "000025:") in got
    assert not any(c == "000003:" for c, _, _ in got)
    assert kinds.count("range_tombstone") == 1
    # plain cells of the slice all present
    plain = [c for c, k, _ in got if k == "normal"]
    assert plain == [f"{i:06d}:c" for i in range(20, 30)]
    # the plan really started past block 0 (marker path, not full decode)
    plan = ss.plan_partition_slice(out, b"wide", b"000020:")
    assert plan[1] is True and plan[2], "expected open-RT marker in plan"
    shutil.rmtree(out)


def test_scrub_healthy_and_each_corruption_isolated(spark):
    """A healthy table is all-green (shallow and deep); each corruption
    flips ONLY its own verdict: data byte -> digest, stray file -> toc,
    summary drift -> summary, stats count -> stats(deep)."""
    base = _tmpdir()
    d = os.path.join(base, "g1")
    ss.write_sstable(
        [(f"k{i:03d}".encode(),
          [(b"c", 0, 0, 0, 1_700_000_000_000_000 + i, str(i).encode())])
         for i in range(20)],
        d,
    )
    def scrub(deep=False):
        [r] = ss.scrub_tables(spark, base, deep=deep).collect()
        return r
    r = scrub(deep=True)
    assert all([r.digest_ok, r.toc_ok, r.index_ok, r.summary_ok,
                r.bloom_ok, r.stats_ok])
    assert r.n_partitions == 20 and r.n_cells == 20

    # summary drift
    p = os.path.join(d, "Summary.db")
    orig = open(p, "rb").read()
    buf = bytearray(orig); buf[-1] ^= 1
    open(p, "wb").write(bytes(buf))
    r = scrub()
    assert r.summary_ok is False and r.digest_ok and r.index_ok
    open(p, "wb").write(orig)

    # data corruption -> digest only (shallow)
    dp = os.path.join(d, "Data.db")
    db = bytearray(open(dp, "rb").read()); db[5] ^= 0xFF
    open(dp, "wb").write(bytes(db))
    r = scrub()
    assert r.digest_ok is False and r.toc_ok and r.summary_ok
    db[5] ^= 0xFF
    open(dp, "wb").write(bytes(db))

    # stats count lie -> stats_ok False only under deep
    sp = os.path.join(d, "Statistics.db")
    st = bytearray(open(sp, "rb").read())
    st[12:20] = (21).to_bytes(8, "big")  # n_cells field
    open(sp, "wb").write(bytes(st))
    assert scrub().stats_ok is True  # shallow checks partitions only
    assert scrub(deep=True).stats_ok is False
    shutil.rmtree(base)


def test_merge_compact_sorted_equals_argmax_form(spark):
    """Cross-plan equivalence on the FULL atom surface (counters, range
    tombstones, partition deletes across three generations): the
    zero-shuffle k-way sorted merge must produce exactly compact_atoms'
    rows, for any split count (1, 3, 8 — boundary partitions must not
    drop/duplicate, and deletion atoms must travel with their pk)."""
    from cassandra_ttl_remover_spark.operators.compact import (
        compact_atoms,
    )

    base = _tmpdir()
    ss.events_sstable_fixture_v2(spark, "/root/testdata/sf0.001",
                                 os.path.join(base, "gen1"),
                                 with_partition_deletes=True)
    ss.events_sstable_update_fixture_v2(spark, "/root/testdata/sf0.001",
                                        os.path.join(base, "gen2"))
    ss.events_sstable_delete_fixture_v2(spark, "/root/testdata/sf0.001",
                                        os.path.join(base, "gen3"))
    kw = dict(gc_grace_us=10 * 86400 * 1_000_000,
              now_us=1706745600 * 1_000_000)
    want = sorted(tuple(r) for r in compact_atoms(
        ss.scan_sstable(spark, base, num_splits=8), **kw).collect())
    assert {r[4] for r in want} >= {"live", "counter_live",
                                    "range_tombstone_retained"}
    for n in (1, 3, 8):
        got = sorted(tuple(r) for r in ss.merge_compact_sorted(
            spark, base, num_splits=n, **kw).collect())
        assert got == want, n
    # bounded planner: a tiny decimation cap must not change the rows
    got = sorted(tuple(r) for r in ss.merge_compact_sorted(
        spark, base, num_splits=5, max_planner_keys=2, **kw).collect())
    assert got == want
    shutil.rmtree(base)


def test_merge_compact_sorted_moves_no_cell_bytes(spark):
    """The merge plan's only exchange is the tiny key-range table — the
    cell stream itself never shuffles (the 100 TB claim)."""
    from cassandra_ttl_remover_spark.plans import exchange_count

    base = _tmpdir()
    ss.events_sstable_fixture(spark, "/root/testdata/sf0.001",
                              os.path.join(base, "gen1"))
    df = ss.merge_compact_sorted(
        spark, base, gc_grace_us=0, now_us=0, num_splits=4)
    assert exchange_count(df) <= 1  # the n-row range-table repartition
    shutil.rmtree(base)


def test_rewrite_stripped_zero_shuffle_and_digest_clean(spark):
    """The 1:1 strip rewrite: output scan == strip_ttl_cells of the
    source, every output shard passes the digest sweep, partition-level
    deletions and all atom kinds survive, and the job plan contains no
    corpus exchange (the report frame's tiny spec repartition only)."""
    import struct as _struct

    base = _tmpdir()
    src = os.path.join(base, "src")
    cells = []
    cells.append((b"000001:rt", ss.RANGE_TOMBSTONE_MASK, 0,
                  1_700_000_000, 1_700_000_000_000_400, b"000005:"))
    for i in range(30):
        name = f"{i:06d}:c".encode()
        if i % 5 == 0:
            cells.append((name, ss.EXPIRATION_MASK, 600, 1_700_000_600,
                          1_700_000_000_000_000 + i, f"v{i}".encode()))
        elif i % 7 == 0:
            cells.append((name, ss.DELETION_MASK, 0, 0,
                          1_700_000_000_000_000 + i,
                          _struct.pack(">i", 1_700_000_000)))
        else:
            cells.append((name, 0, 0, 0, 1_700_000_000_000_000 + i,
                          f"v{i}".encode()))
    cells.sort(key=lambda c: c[0])
    ss.write_sstable(
        [(b"alive", cells),
         (b"gone", [(b"c", 0, 0, 0, 5, b"x")],
          (1_700_000_000, 1_700_000_000_000_999))],
        src,
    )
    out = os.path.join(base, "out")
    report = ss.rewrite_stripped(spark, src, out, num_splits=4)
    assert sum(r.n_cells for r in report) == 33  # 31 cells + RT + pt-del
    want = sorted((tuple(r) for r in
                   ss.strip_ttl_cells(
                       ss.scan_sstable(spark, src)).collect()), key=repr)
    got = sorted((tuple(r) for r in
                  ss.scan_sstable(spark, out).collect()), key=repr)
    assert got == want
    assert not any(r[2] == "expiring" for r in got)
    assert any(r[2] == "partition_tombstone" for r in got)
    assert any(r[2] == "range_tombstone" for r in got)
    checks = ss.verify_digests(spark, out).collect()
    assert checks and all(r.digest_ok and r.toc_ok for r in checks)
    shutil.rmtree(base)


def test_merge_compact_random_generations_match_ground_truth(spark):
    """Randomized (seeded) generations with overlapping keys, writetime
    TIES between live and tombstone versions, and uneven key coverage:
    the zero-shuffle merge must equal a direct dict ground truth (LWW,
    tombstone wins ties, purge past grace) for several split counts."""
    import random

    for seed in (7, 23):
        rng = random.Random(seed)
        base = _tmpdir()
        truth: dict[tuple, tuple] = {}
        for g in range(3):
            parts: dict[bytes, list] = {}
            for _ in range(rng.randint(30, 60)):
                pk = f"k{rng.randint(0, 19):03d}"
                cell = f"c{rng.randint(0, 4)}"
                wt = 1_000_000 + rng.randint(0, 9) * 100  # forced ties
                tomb = rng.random() < 0.3
                if tomb:
                    c = (cell.encode(), ss.DELETION_MASK, 0, 0, wt,
                         struct.pack(">i", 1))
                else:
                    c = (cell.encode(), 0, 0, 0, wt, b"v")
                parts.setdefault(pk.encode(), []).append(c)
                key = (pk, cell)
                cand = (wt, 1 if tomb else 0)
                if key not in truth or cand > truth[key]:
                    truth[key] = cand
            ss.write_sstable(parts.items(), os.path.join(base, f"g{g}"),
                             summary_interval=4)
        grace, now = 500, 1_001_000  # threshold between tie groups
        want = sorted(
            (pk, cell, wt, None if tomb else "v",
             "tombstone_retained" if tomb else "live")
            for (pk, cell), (wt, tomb) in truth.items()
            if not tomb or wt > now - grace
        )
        for n in (1, 5):
            got = sorted(
                tuple(r) for r in ss.merge_compact_sorted(
                    spark, base, gc_grace_us=grace, now_us=now,
                    num_splits=n).collect()
            )
            assert got == want, (seed, n)
        shutil.rmtree(base)


def test_compact_rewrite_roundtrip_and_digests(spark):
    """Major compaction e2e: merge -> re-encode -> sharded sink. The
    rewritten output must (a) pass the digest/TOC sweep, (b) scan back
    to exactly the merged state mapped through the documented atom
    reconstruction, and (c) retain every deletion granularity under a
    wide grace window."""
    from cassandra_ttl_remover_spark.operators.compact import (
        compact_atoms,
    )

    base = _tmpdir()
    ss.events_sstable_fixture_v2(spark, "/root/testdata/sf0.001",
                                 os.path.join(base, "gen1"),
                                 with_partition_deletes=True)
    ss.events_sstable_update_fixture_v2(spark, "/root/testdata/sf0.001",
                                        os.path.join(base, "gen2"))
    ss.events_sstable_delete_fixture_v2(spark, "/root/testdata/sf0.001",
                                        os.path.join(base, "gen3"))
    kw = dict(gc_grace_us=100 * 365 * 86400 * 1_000_000,
              now_us=1706745600 * 1_000_000)
    out = os.path.join(base, "compacted")
    report = ss.compact_rewrite(spark, base, out, shards=3, **kw)
    assert len(report) == 3
    checks = ss.verify_digests(spark, out).collect()
    assert checks and all(r.digest_ok and r.toc_ok for r in checks)

    # scan_sstable(base) sees gen1..gen3 only: the compacted output nests
    # one level deeper (out/shard=N), below _resolve_table_dirs' reach
    merged = {(r.pk, r.cell, r.status): (r.writetime, r.value)
              for r in compact_atoms(
                  ss.scan_sstable(spark, base, num_splits=4),
                  **kw).collect()}
    # wide grace: every deletion granularity survives the merge
    assert {s for _, _, s in merged} == {
        "live", "counter_live", "tombstone_retained",
        "range_tombstone_retained", "partition_tombstone_retained"}
    back = {}
    kind_to_status = {"normal": "live", "counter": "counter_live",
                      "tombstone": "tombstone_retained",
                      "range_tombstone": "range_tombstone_retained",
                      "partition_tombstone":
                          "partition_tombstone_retained"}
    for r in ss.scan_sstable(spark, out).collect():
        back[(r.pk, r.cell, kind_to_status[r.kind])] = (
            r.writetime, r.value)
    assert back == merged
    shutil.rmtree(base)


def _model_compact(gens, *, grace, now):
    """Independent straight-line resolution of the one shadowing rule
    (written from compact_atoms' spec, not its code): gens is a list of
    {pk: (cells, deletion|None)} where cells are writer tuples. Returns
    the expected (pk, cell, writetime, value, status) set."""
    thr = now - grace
    pd_wt: dict = {}
    rts: dict = {}
    cell_atoms: dict = {}
    for parts in gens:
        for pk, (cells, deletion) in parts.items():
            if deletion is not None:
                _, mfda = deletion
                pd_wt[pk] = max(pd_wt.get(pk, mfda), mfda)
            for name, mask, ttl, exp, wt, val in cells:
                if mask & ss.RANGE_TOMBSTONE_MASK:
                    span = (name.decode(), val.decode())
                    d = rts.setdefault(pk, {})
                    d[span] = max(d.get(span, wt), wt)
                else:
                    kind = ("tombstone" if mask & ss.DELETION_MASK
                            else "counter" if mask & ss.COUNTER_MASK
                            else "counter_update"
                            if mask & ss.COUNTER_UPDATE_MASK else "live")
                    v = None if kind == "tombstone" else val.decode()
                    cell_atoms.setdefault((pk, name), []).append(
                        (wt, kind, v))
    want = set()
    for (pk, name), versions in cell_atoms.items():
        pw = pd_wt.get(pk)
        cover = [m for (s, e), m in rts.get(pk, {}).items()
                 if s <= name.decode() <= e]
        surv = [(wt, k, v) for wt, k, v in versions
                if (pw is None or wt > pw)
                and all(wt > m for m in cover)]
        if not surv:
            continue
        shards = [(wt, int(v)) for wt, k, v in surv
                  if k in ("counter", "counter_update")]
        tomb = [wt for wt, k, _ in surv if k == "tombstone"]
        if shards:
            live = [(wt, v) for wt, v in shards
                    if not tomb or wt > max(tomb)]
            if live:
                want.add((pk.decode(), name.decode(),
                          max(w for w, _ in live),
                          str(sum(v for _, v in live)), "counter_live"))
            elif max(tomb) > thr:
                want.add((pk.decode(), name.decode(), max(tomb), None,
                          "tombstone_retained"))
            continue
        wt, k, v = max(surv, key=lambda a: (a[0], a[1] == "tombstone",
                                            a[2] or ""))
        if k == "tombstone":
            if wt > thr:
                want.add((pk.decode(), name.decode(), wt, None,
                          "tombstone_retained"))
        else:
            want.add((pk.decode(), name.decode(), wt, v, "live"))
    for pk, spans in rts.items():
        pw = pd_wt.get(pk)
        for (s, e), m in spans.items():
            if (pw is None or m > pw) and m > thr:
                want.add((pk.decode(), s, m, e,
                          "range_tombstone_retained"))
    for pk, pwt in pd_wt.items():
        if pwt > thr:
            want.add((pk.decode(), None, pwt, None,
                      "partition_tombstone_retained"))
    return want


@pytest.mark.slow  # seal-gate tier (heavy equality/e2e sweep)
def test_full_atom_merge_random_generations_match_model(spark):
    """Randomized (seeded) generations over the FULL atom surface —
    normal/tombstone cells with forced writetime ties, counter shards
    and counter deletes, range tombstones with random bounds, partition
    deletions — must equal an independently-written straight-line model
    of the one shadowing rule, through BOTH plans and across split
    counts (encode -> plan -> distribute -> merge all exercised)."""
    import random

    from cassandra_ttl_remover_spark.operators.compact import (
        compact_atoms,
    )

    for seed in (11, 42):
        rng = random.Random(seed)
        base = _tmpdir()
        gens = []
        for g in range(3):
            parts: dict = {}
            for _ in range(rng.randint(25, 45)):
                pk = f"k{rng.randint(0, 11):03d}".encode()
                cells, _ = parts.setdefault(pk, ({}, None))
                wt = 1_000_000 + rng.randint(0, 9) * 100
                r = rng.random()
                if r < 0.15:  # counter shard on a dedicated cnt cell
                    name = f"n{rng.randint(0, 2)}".encode()
                    cells[name] = (name, ss.COUNTER_MASK, 0, wt - 10, wt,
                                   str(rng.randint(1, 9)).encode())
                elif r < 0.25:  # range tombstone over random bounds
                    lo, hi = sorted((rng.randint(0, 5), rng.randint(0, 5)))
                    name = f"c{lo}".encode()
                    cells[name] = (name, ss.RANGE_TOMBSTONE_MASK, 0, 1,
                                   wt, f"c{hi}".encode())
                elif r < 0.45:  # cell tombstone
                    name = f"c{rng.randint(0, 5)}".encode()
                    cells[name] = (name, ss.DELETION_MASK, 0, 0, wt,
                                   struct.pack(">i", 1))
                else:  # live cell
                    name = f"c{rng.randint(0, 5)}".encode()
                    cells[name] = (name, 0, 0, 0, wt,
                                   f"v{rng.randint(0, 3)}".encode())
            out_parts = {}
            for pk, (cells, _) in parts.items():
                deletion = ((1, 1_000_000 + rng.randint(0, 9) * 100)
                            if rng.random() < 0.1 else None)
                out_parts[pk] = (sorted(cells.values()), deletion)
            gens.append(out_parts)
            ss.write_sstable(
                [(pk, cells, deletion) if deletion else (pk, cells)
                 for pk, (cells, deletion) in out_parts.items()],
                os.path.join(base, f"g{g}"), summary_interval=4)
        grace, now = 500, 1_001_000  # threshold inside the tie groups
        want = _model_compact(gens, grace=grace, now=now)
        kw = dict(gc_grace_us=grace, now_us=now)
        got_a = {tuple(r) for r in compact_atoms(
            ss.scan_sstable(spark, base, num_splits=4), **kw).collect()}
        assert got_a == want, f"compact_atoms diverged (seed {seed})"
        for n in (1, 5):
            got_b = {tuple(r) for r in ss.merge_compact_sorted(
                spark, base, num_splits=n, **kw).collect()}
            assert got_b == want, f"merge diverged (seed {seed}, {n})"
        shutil.rmtree(base)


def test_compaction_strategy_planners(spark):
    """STCS/TWCS planning over Statistics.db alone: exact bit-length
    size classes, integer-div time windows, min_threshold nomination,
    and the empty-table NULL-window path."""
    base = _tmpdir()
    mk = lambda name, parts: ss.write_sstable(parts, os.path.join(base, name))  # noqa: E731
    cell = lambda i, wt: (f"c{i:04d}".encode(), 0, 0, 0, wt, b"v")  # noqa: E731
    # two ~32-cell tables (class 5), two 7-cell tables (class 2), one empty
    mk("a1", [(b"k1", [cell(i, 1_700_000_000_000_000 + i)
                       for i in range(32)])])
    mk("a2", [(b"k1", [cell(i, 1_700_000_000_000_000 + i)
                       for i in range(33)])])
    mk("b1", [(b"k1", [cell(i, 1_705_000_000_000_000 + i)
                       for i in range(7)])])
    mk("b2", [(b"k1", [cell(i, 1_705_000_000_000_000 + i)
                       for i in range(7)])])
    mk("e0", [])
    got = {r.generation: (r.size_class, r.group_n, r.compact)
           for r in ss.plan_compaction_stcs(spark, base,
                                            min_threshold=2).collect()}
    assert got["a1"] == (5, 2, True) and got["a2"] == (5, 2, True)
    assert got["b1"] == (2, 2, True) and got["b2"] == (2, 2, True)
    assert got["e0"][0] == 0 and got["e0"][2] is False

    w = 1_000_000_000_000  # ~11.6 days in µs
    tw = {r.generation: (r.time_window, r.group_n, r.compact)
          for r in ss.plan_compaction_twcs(spark, base, window_us=w,
                                           min_threshold=2).collect()}
    assert tw["a1"] == (1700, 2, True) and tw["a2"] == (1700, 2, True)
    assert tw["b1"] == (1705, 2, True) and tw["b2"] == (1705, 2, True)
    assert tw["e0"] == (None, 0, False)
    shutil.rmtree(base)


def test_diff_replicas_identical_and_divergent(spark):
    """Repair digests: identical replicas match on every bucket;
    removing one partition from replica B flips exactly the buckets
    holding the removed keys, and row counts localize the loss."""
    base = _tmpdir()
    ss.events_sstable_fixture(spark, "/root/testdata/sf0.001",
                              os.path.join(base, "ra"))
    ss.events_sstable_fixture(spark, "/root/testdata/sf0.001",
                              os.path.join(base, "rb"))
    same = ss.diff_replicas(spark, os.path.join(base, "ra"),
                            os.path.join(base, "rb")).collect()
    assert same and all(r.match for r in same)
    ss.events_sstable_fixture(spark, "/root/testdata/sf0.001",
                              os.path.join(base, "rc"),
                              where="user_id % 97 <> 0")
    diff = ss.diff_replicas(spark, os.path.join(base, "ra"),
                            os.path.join(base, "rc")).collect()
    bad = [r for r in diff if not r.match]
    assert bad and len(bad) < len(diff)
    assert all(r.n_rows_a > (r.n_rows_b or 0) for r in bad)
    shutil.rmtree(base)


def test_droppable_census_grace_window(spark):
    """Droppable counts respect the grace window: with now far in the
    future everything deleted/expired is droppable; with a 100-year
    grace nothing is."""
    base = _tmpdir()
    ss.events_sstable_fixture_v2(spark, "/root/testdata/sf0.001",
                                 os.path.join(base, "gen1"),
                                 with_partition_deletes=True)
    ss.events_sstable_delete_fixture_v2(spark, "/root/testdata/sf0.001",
                                        os.path.join(base, "gen3"))
    far = 4_000_000_000 * 1_000_000  # ~2096
    all_drop = {r.generation: r for r in ss.droppable_census(
        spark, base, gc_grace_us=0, now_us=far).collect()}
    assert all(r.n_droppable_deletes == r.n_deletes
               for r in all_drop.values())
    assert all_drop["gen1"].n_expired > 0  # every TTL has lapsed by 2096
    none_drop = {r.generation: r for r in ss.droppable_census(
        spark, base, gc_grace_us=100 * 365 * 86400 * 1_000_000,
        now_us=1706745600 * 1_000_000).collect()}
    assert all(r.n_droppable_deletes == 0 and r.n_expired == 0
               for r in none_drop.values())
    assert none_drop["gen3"].n_deletes > 0  # deletes exist, just retained
    shutil.rmtree(base)


def test_summary_window_equals_bisect_window(spark):
    """The streaming O(1)-memory summary-window pass (the executor-side
    review fix) must resolve exactly the same Index.db byte window as
    the list-based bisect (_read_index_window) for random layouts and
    probes — including open ends, probes before the first / after the
    last key, and exact sample-boundary hits."""
    import random

    for seed in (3, 17):
        rng = random.Random(seed)
        base = _tmpdir()
        n = rng.randint(40, 120)
        keys = sorted({f"k{rng.randint(0, 500):04d}".encode()
                       for _ in range(n)})
        ss.write_sstable(
            [(k, [(b"c", 0, 0, 0, 1, b"v")]) for k in keys],
            base, summary_interval=rng.choice((2, 4, 7)))
        samples = ss._read_summary(base)
        probes = [(None, None), (None, keys[0]), (keys[-1], None),
                  (b"k0000", b"zzzz")]
        for _ in range(25):
            a = f"k{rng.randint(0, 500):04d}".encode()
            b = f"k{rng.randint(0, 500):04d}".encode()
            probes.append((min(a, b), max(a, b)))
        # exact sample-boundary probes
        for k, _, _ in samples[:3]:
            probes.append((k, k))
            probes.append((k, keys[-1]))
        for start, stop in probes:
            want, want_end = ss._read_index_window(
                base, samples, start, stop)
            win = ss._summary_window(base, start, stop)
            assert win is not None
            ix_start, ix_end, win_end = win
            index_path = os.path.join(base, "Index.db")
            with open(index_path, "rb") as f:
                f.seek(ix_start)
                buf = (f.read(ix_end - ix_start)
                       if ix_end is not None else f.read())
            got = ss._parse_index_entries(
                buf, "v1", index_path, base_off=ix_start)
            got_end = (win_end if win_end is not None
                       else ss._data_size(base))
            assert got == want and got_end == want_end, (seed, start,
                                                         stop)
        shutil.rmtree(base)


def test_merge_raises_on_truncated_generation(spark):
    """Quarantine convention under the k-way merge: a generation whose
    Data.db is truncated mid-record must fail the job with a descriptive
    CorruptSSTableError — never emit a silently partial merge."""
    import pytest

    base = _tmpdir()
    ss.events_sstable_fixture(spark, "/root/testdata/sf0.001",
                              os.path.join(base, "gen1"),
                              where="user_id % 2 = 0")
    ss.events_sstable_fixture(spark, "/root/testdata/sf0.001",
                              os.path.join(base, "gen2"),
                              where="user_id % 2 = 1")
    p = os.path.join(base, "gen2", "Data.db")
    with open(p, "r+b") as f:
        f.truncate(os.path.getsize(p) - 7)
    with pytest.raises(Exception, match="truncated|Corrupt"):
        ss.merge_compact_sorted(
            spark, base, gc_grace_us=0, now_us=0, num_splits=2).collect()
    shutil.rmtree(base)


def test_gc_single_table_equals_compact_rewrite_on_one_generation(spark):
    """Cross-dataflow equality on a single generation: the zero-shuffle
    within-table GC rewrite and the full compaction rewrite must produce
    byte-identical scan-back rows (same _resolve_atoms semantics, same
    reconstruction mapping), and the GC output is digest-clean."""
    base = _tmpdir()
    ss.events_sstable_fixture_v2(spark, "/root/testdata/sf0.001",
                                 os.path.join(base, "gen1"),
                                 with_partition_deletes=True)
    kw = dict(gc_grace_us=10 * 86400 * 1_000_000,
              now_us=1706745600 * 1_000_000)
    ss.gc_rewrite_single(spark, os.path.join(base, "gen1"),
                         os.path.join(base, "gc"), **kw)
    ss.compact_rewrite(spark, os.path.join(base, "gen1"),
                       os.path.join(base, "cr"), **kw)
    a = sorted(tuple(r) for r in
               ss.scan_sstable(spark, os.path.join(base, "gc")).collect())
    b = sorted(tuple(r) for r in
               ss.scan_sstable(spark, os.path.join(base, "cr")).collect())
    assert a and a == b
    checks = ss.verify_digests(spark, os.path.join(base, "gc")).collect()
    assert checks and all(r.digest_ok and r.toc_ok for r in checks)
    shutil.rmtree(base)
