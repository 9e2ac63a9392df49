import pyspark.sql.functions as F

from cassandra_ttl_remover_spark.operators import compact
from cassandra_ttl_remover_spark.operators.liveness import annotate_events


def test_merge_runs_lww_picks_newest(spark):
    r1 = spark.createDataFrame(
        [(1, 10, 100, "a"), (1, 11, 100, "b"), (2, 10, 100, "c")],
        "pk long, ck long, writetime long, v string",
    )
    r2 = spark.createDataFrame(
        [(1, 10, 200, "A"), (2, 10, 50, "C_old"), (3, 10, 100, "d")],
        "pk long, ck long, writetime long, v string",
    )
    out = {(r.pk, r.ck): (r.writetime, r.v)
           for r in compact.merge_runs_lww([r1, r2], ["pk", "ck"]).collect()}
    assert out == {
        (1, 10): (200, "A"),     # update wins
        (1, 11): (100, "b"),     # untouched
        (2, 10): (100, "c"),     # stale update loses
        (3, 10): (100, "d"),     # new key appears
    }


def test_compact_small_files_shrinks_file_count(spark, events, tmp_path):
    from cassandra_ttl_remover_spark.sinks.writer import compact_small_files

    frag = str(tmp_path / "frag")
    out = str(tmp_path / "compact")
    events.select("event_id", "user_id", "event_type").repartition(
        32
    ).write.parquet(frag)
    n_frag = len(list((tmp_path / "frag").glob("*.parquet")))
    assert n_frag >= 30  # genuinely fragmented input
    n_target = compact_small_files(spark, frag, out,
                                   target_file_bytes=64 << 20)
    n_out = len(list((tmp_path / "compact").glob("*.parquet")))
    assert n_out == n_target < n_frag
    back = spark.read.parquet(out)
    src = events.select("event_id", "user_id", "event_type")
    assert back.exceptAll(src).count() == 0
    assert src.exceptAll(back).count() == 0


def test_compact_runs_roundtrip_sorted(spark, events, tmp_path):
    from cassandra_ttl_remover_spark.sinks.writer import write_sorted
    base = annotate_events(events).select("user_id", "event_id", "writetime", "value")
    upd = base.filter(F.col("event_id") % 5 == 0).withColumn(
        "writetime", F.col("writetime") + 1
    ).withColumn("value", F.col("value") * 2)
    d1, d2, do = str(tmp_path / "r1"), str(tmp_path / "r2"), str(tmp_path / "out")
    write_sorted(base, d1, pk="user_id", clustering=["event_id"], num_files=4)
    write_sorted(upd, d2, pk="user_id", clustering=["event_id"], num_files=4)
    merged = compact.compact_runs(
        spark, [d1, d2], keys=["user_id", "event_id"], out=do, num_files=4
    ).cache()
    # one row per key, count preserved vs the base run
    assert merged.count() == base.count()
    assert merged.groupBy("user_id", "event_id").count().filter("count > 1").count() == 0
    # every updated key carries the bumped writetime
    joined = merged.join(upd.select("user_id", "event_id",
                                    F.col("writetime").alias("wt_upd")),
                         ["user_id", "event_id"])
    assert joined.filter(F.col("writetime") != F.col("wt_upd")).count() == 0
    # single shuffle for the merge itself (pre-write): union adds none
    plan_df = compact.merge_runs_lww(
        [spark.read.parquet(d1), spark.read.parquet(d2)], ["user_id", "event_id"]
    )
    plan = plan_df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_apply_changes_delete_semantics(spark):
    from cassandra_ttl_remover_spark.operators.compact import apply_changes

    snap = spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "b"), (3, 10, "c"), (4, 10, "d")],
        "k long, writetime long, v string",
    )
    changes = spark.createDataFrame(
        [
            (1, 20, "a2", "U"),   # newer update wins
            (2, 20, None, "D"),   # newer delete removes the key
            (3, 10, None, "D"),   # equal-writetime delete LOSES to the write
            (5, 20, "e", "I"),    # insert of a new key
            (5, 30, None, "D"),   # ...then deleted again
        ],
        "k long, writetime long, v string, op string",
    )
    got = {(r.k): (r.writetime, r.v)
           for r in apply_changes(snap, changes, ["k"]).collect()}
    assert got == {1: (20, "a2"), 3: (10, "c"), 4: (10, "d")}


def test_compact_with_gc_semantics(spark):
    """LWW + grace rules on a hand-built cell set: tombstones win ties,
    retained inside grace, purged past it; shadowed live cells gone."""
    from cassandra_ttl_remover_spark.operators.compact import compact_with_gc

    NOW, GRACE = 1_000_000, 100_000
    cells = spark.createDataFrame(
        [
            (1, 10, 500_000, False),   # live, shadowed by newer live
            (1, 10, 600_000, False),   # winner -> live
            (2, 20, 500_000, False),   # shadowed by newer tombstone
            (2, 20, 950_000, True),    # tombstone inside grace -> retained
            (3, 30, 500_000, False),   # shadowed by OLD tombstone
            (3, 30, 800_000, True),    # tombstone past grace -> purged
            (4, 40, 700_000, False),   # tie: tombstone wins
            (4, 40, 700_000, True),
        ],
        "user_id long, cell long, writetime long, is_tombstone boolean")
    got = {(r.user_id, r.cell): (r.writetime, r.status)
           for r in compact_with_gc(cells, ["user_id", "cell"],
                                    gc_grace_us=GRACE,
                                    now_us=NOW).collect()}
    assert got == {
        (1, 10): (600_000, "live"),
        (2, 20): (950_000, "tombstone_retained"),
        # (3, 30) purged entirely: winning tombstone older than grace
        # (4, 40): tie -> tombstone wins -> 700k < 900k threshold -> purged
    }


def test_expire_then_compact_lifecycle(spark):
    """write -> expire -> tombstone -> grace -> purge, plus the shadowing
    rule: a live rewrite AFTER the expiry instant wins over the synthetic
    tombstone."""
    from cassandra_ttl_remover_spark.operators.compact import (
        expire_then_compact,
    )

    NOW = 1_000_000            # seconds
    cells = spark.createDataFrame(
        [
            # key A: expired long ago (expiry 100k << now-grace 900k) -> purged
            (1, 1, 50_000 * 1_000_000, 100_000),
            # key B: expired recently (950k > 900k) -> tombstone_retained
            (2, 2, 940_000 * 1_000_000, 950_000),
            # key C: expired at 300k BUT rewritten live at 400k -> live
            (3, 3, 200_000 * 1_000_000, 300_000),
            (3, 3, 400_000 * 1_000_000, None),
            # key D: no ttl -> live
            (4, 4, 500_000 * 1_000_000, None),
        ],
        "user_id long, cell long, writetime long, expires_at long")
    got = {(r.user_id, r.cell): r.status
           for r in expire_then_compact(
               cells, ["user_id", "cell"],
               now_s=NOW, gc_grace_s=100_000).collect()}
    assert got == {(2, 2): "tombstone_retained",
                   (3, 3): "live",
                   (4, 4): "live"}


def test_sstable_two_generation_compaction_e2e(spark):
    """Two binary generations in one directory scan as one cell frame;
    LWW resolves overlaps (update wins, delete shadows), gc_grace
    retains-or-purges the winning tombstones."""
    import os
    import shutil
    import struct
    import tempfile
    import uuid

    from cassandra_ttl_remover_spark.operators.compact import compact_with_gc
    from cassandra_ttl_remover_spark.sources import sstable as ss

    out = os.path.join(tempfile.gettempdir(), f"cge2e_{uuid.uuid4().hex[:8]}")
    ss.write_sstable(
        [(b"u1", [(b"a", 0, 0, 0, 100, b"old"),
                  (b"b", 0, 0, 0, 100, b"keep")])],
        os.path.join(out, "gen1"))
    ss.write_sstable(
        [(b"u1", [(b"a", 0, 0, 0, 200, b"new"),           # update wins
                  (b"c", ss.DELETION_MASK, 0, 0, 250,     # fresh tombstone
                   struct.pack(">i", 1)),
                  (b"d", ss.DELETION_MASK, 0, 0, 50,      # ancient tombstone
                   struct.pack(">i", 1))])],
        os.path.join(out, "gen2"))
    import pyspark.sql.functions as F
    cells = ss.scan_sstable(spark, out).select(
        "pk", "cell", "writetime",
        (F.col("kind") == "tombstone").alias("is_tombstone"))
    got = {(r.pk, r.cell): (r.writetime, r.status)
           for r in compact_with_gc(cells, ["pk", "cell"],
                                    gc_grace_us=100, now_us=300).collect()}
    assert got == {
        ("u1", "a"): (200, "live"),                 # LWW: update wins
        ("u1", "b"): (100, "live"),                 # untouched survives
        ("u1", "c"): (250, "tombstone_retained"),   # 250 > 300-100
    }                                               # d purged: 50 <= 200
    shutil.rmtree(out)


_ATOM_CASES = [
    # pk, cell, kind, ttl, expiration, writetime, value — one row per rule
    ("p1", "c1", "normal", None, None, 100, "a"),
    ("p1", "c1", "normal", None, None, 200, "b"),          # LWW
    ("p1", "c2", "normal", None, None, 100, "x"),
    ("p1", "c2", "tombstone", None, 90, 100, None),        # tie -> tombstone
    ("p1", "c3", "normal", None, None, 300, "y"),
    ("p1", "c3", "tombstone", None, 90, 200, None),        # newer live wins
    ("p1", "c4", "range_tombstone", None, 90, 250, "c6"),
    ("p1", "c5", "normal", None, None, 250, "s"),          # RT tie -> dead
    ("p1", "c55", "normal", None, None, 260, "alive"),     # above RT
    ("p1", "c7", "tombstone", None, 5, 10, None),          # purged by grace
    ("p1", "c8", "normal", None, None, 100, "x"),
    ("p1", "c8", "normal", None, None, 100, "y"),          # value tiebreak
    ("p2", None, "partition_tombstone", None, 4, 500, None),
    ("p2", "c1", "normal", None, None, 400, "dead"),       # <= pd
    ("p2", "c2", "normal", None, None, 600, "alive"),      # > pd
    ("p2", "a", "range_tombstone", None, 4, 450, "b"),     # RT <= pd: dead
    ("p2", "c", "range_tombstone", None, 6, 700, "d"),     # RT > pd: kept
    ("p3", "k1", "counter", None, 99, 100, "5"),
    ("p3", "k1", "counter", None, 199, 200, "7"),
    ("p3", "k1", "counter_update", None, None, 150, "2"),  # sum = 14
    ("p3", "k2", "counter", None, 99, 100, "5"),
    ("p3", "k2", "tombstone", None, 1, 150, None),         # partial delete
    ("p3", "k2", "counter", None, 199, 200, "7"),          # sum = 7
    ("p3", "k3", "counter", None, 99, 100, "5"),
    ("p3", "k3", "tombstone", None, 1, 100, None),         # full delete
]

_ATOM_WANT = {
    ("p1", "c1"): (200, "b", "live"),
    ("p1", "c2"): (100, None, "tombstone_retained"),
    ("p1", "c3"): (300, "y", "live"),
    ("p1", "c4"): (250, "c6", "range_tombstone_retained"),
    ("p1", "c55"): (260, "alive", "live"),
    ("p1", "c8"): (100, "y", "live"),
    ("p2", None): (500, None, "partition_tombstone_retained"),
    ("p2", "c"): (700, "d", "range_tombstone_retained"),
    ("p3", "k1"): (200, "14", "counter_live"),
    ("p3", "k2"): (200, "7", "counter_live"),
    ("p3", "k3"): (100, None, "tombstone_retained"),
}


def test_compact_atoms_every_rule(spark):
    """One hand-built atom per semantic rule — the one shadowing rule
    (ties die), LWW with tombstones-win-ties and value tiebreak,
    partition deletes shadowing cells AND range tombstones, additive
    counter shards with partial/full counter deletes, and the uniform
    retain/purge threshold — checked against a closed-form expectation
    AND the DuckDB oracle string."""
    import duckdb

    df = spark.createDataFrame(
        _ATOM_CASES,
        "pk string, cell string, kind string, ttl bigint, "
        "expiration bigint, writetime bigint, value string",
    )
    out = compact.compact_atoms(df, gc_grace_us=0, now_us=50)
    got = {(r.pk, r.cell): (r.writetime, r.value, r.status)
           for r in out.collect()}
    assert got == _ATOM_WANT

    atoms_sql = "SELECT * FROM (VALUES " + ",".join(
        "(" + ",".join(
            "NULL" if v is None else repr(v) if isinstance(v, str) else str(v)
            for v in r) + ")"
        for r in _ATOM_CASES
    ) + ") AS t(pk, cell, kind, ttl, expiration, writetime, value)"
    rows = duckdb.sql(compact.compact_atoms_oracle_sql(
        atoms_sql, gc_grace_us=0, now_us=50)).fetchall()
    assert {(r[0], r[1]): (r[2], r[3], r[4]) for r in rows} == _ATOM_WANT
