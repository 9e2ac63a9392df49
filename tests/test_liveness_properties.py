"""Property-based tests for the liveness/tombstone semantics (SURVEY.md §5:
the reference's own tests never cover collections, tombstone interplay, or
randomized streams — this is the engine's answer).

Strategy: hypothesis generates random annotated tables (cells with arbitrary
writetime/ttl/expiry/deletion combinations, row-level liveness, row
tombstones); an independent pure-Python model implements the §1.2 visibility
rules; the Spark operators must agree EXACTLY with the model, before and
after the TTL strip.

Model rules (SURVEY.md §1.2, operators/liveness.py):
  * cell visible at `now` iff not cell-deleted, not expired, and strictly
    newer than a covering row tombstone (equal timestamps: delete wins);
  * row visible iff pk-liveness is live (not expired, newer than the row
    tombstone) or any cell survives;
  * strip: ttl/expires_at cleared everywhere (cells + pk liveness), values,
    writetimes and ALL deletions preserved verbatim.
"""

from __future__ import annotations

import pytest

pytest.importorskip("hypothesis")

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cassandra_ttl_remover_spark.operators.liveness import (
    live_view_cells,
    strip_ttl_cells,
)

# two-tier suite (pytest.ini): property/cross-engine sweeps are the
# seal gate, not the per-commit gate
pytestmark = pytest.mark.slow

NOW = 10
CELL = "struct<value:string,writetime:bigint,ttl:bigint,expires_at:bigint,deleted_ts:bigint>"
SCHEMA = (
    f"id bigint, name {CELL}, surname {CELL}, "
    "pk_writetime bigint, pk_ttl bigint, pk_expires_at bigint, row_deletion_ts bigint"
)

ts = st.integers(min_value=0, max_value=20)
opt_ts = st.none() | ts

cell = st.none() | st.tuples(
    st.sampled_from(["a", "b"]),  # value
    ts,                           # writetime
    st.none() | st.integers(min_value=1, max_value=5),  # ttl
    opt_ts,                       # expires_at
    opt_ts,                       # deleted_ts
)

row = st.tuples(cell, cell, opt_ts, st.none() | st.integers(1, 5), opt_ts, opt_ts)

tables = st.lists(row, min_size=1, max_size=20)


def _rows(table):
    return [
        (i, name, surname, pk_wt, pk_ttl, pk_exp, row_del)
        for i, (name, surname, pk_wt, pk_ttl, pk_exp, row_del) in enumerate(table)
    ]


# ---------------------------------------------------------------------------
# Independent model of §1.2
# ---------------------------------------------------------------------------

def _model_cell_visible(c, now, row_del):
    if c is None:
        return None
    _value, wt, _ttl, exp, dts = c
    alive = dts is None and (exp is None or exp > now)
    if row_del is not None:
        alive = alive and wt > row_del
    return c if alive else None


def _model_live(rows, now):
    out = []
    for (i, name, surname, pk_wt, _pk_ttl, pk_exp, row_del) in rows:
        vis_name = _model_cell_visible(name, now, row_del)
        vis_surname = _model_cell_visible(surname, now, row_del)
        pk_live = pk_wt is not None and (pk_exp is None or pk_exp > now)
        if pk_live and row_del is not None:
            pk_live = row_del < pk_wt
        if pk_live or vis_name is not None or vis_surname is not None:
            out.append((i, vis_name, vis_surname))
    return sorted(out)


def _model_strip(rows):
    def strip_cell(c):
        if c is None:
            return None
        value, wt, _ttl, _exp, dts = c
        return (value, wt, None, None, dts)

    return [
        (i, strip_cell(name), strip_cell(surname), pk_wt, None, None, row_del)
        for (i, name, surname, pk_wt, _pk_ttl, _pk_exp, row_del) in rows
    ]


def _collect(df):
    out = []
    for r in df.select("id", "name", "surname").collect():
        out.append((r.id, tuple(r.name) if r.name else None,
                    tuple(r.surname) if r.surname else None))
    return sorted(out)


# ---------------------------------------------------------------------------
# Properties
# ---------------------------------------------------------------------------

@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
@given(table=tables)
def test_live_view_matches_model(spark, table):
    rows = _rows(table)
    df = spark.createDataFrame(rows, SCHEMA)
    assert _collect(live_view_cells(df, NOW)) == _model_live(rows, NOW)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
@given(table=tables)
def test_strip_matches_model_and_preserves_deletes(spark, table):
    rows = _rows(table)
    df = spark.createDataFrame(rows, SCHEMA)
    stripped = strip_ttl_cells(df)

    # the stripped table, viewed at ANY now, equals the model of the
    # model-stripped rows: expiry is gone, deletions still apply
    model_rows = _model_strip(rows)
    assert _collect(live_view_cells(stripped, NOW)) == _model_live(model_rows, NOW)

    # §2.3.1 invariants, checked structurally on the full (unfiltered) frame:
    got = sorted(
        (r.id, tuple(r.name) if r.name else None, tuple(r.surname) if r.surname else None,
         r.pk_writetime, r.pk_ttl, r.pk_expires_at, r.row_deletion_ts)
        for r in stripped.collect()
    )
    assert got == sorted(model_rows)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow])
@given(table=tables)
def test_strip_is_idempotent_and_monotone(spark, table):
    rows = _rows(table)
    df = spark.createDataFrame(rows, SCHEMA)
    once = strip_ttl_cells(df)
    twice = strip_ttl_cells(once)
    assert _collect(once) == _collect(twice)
    # monotone visibility: everything visible pre-strip stays visible
    pre = {t[0] for t in _collect(live_view_cells(df, NOW))}
    post = {t[0] for t in _collect(live_view_cells(once, NOW))}
    assert pre <= post
