"""Driver-harness contract guards over the declared query surface.

The external correctness gate canonicalizes every query result via pandas
``sort_values`` — list/dict cells raise ``unhashable type`` there (this was
CORRECTNESS_r02's only red row, q_x13's raw ``array<bigint>`` column). These
tests enforce the contract locally so a complex-typed output can never ship
again, and pin the declared-order rotation that feeds the driver's
first-~50-queries grading window.
"""

from __future__ import annotations

from pathlib import Path

import pytest

from tests.conftest import SF_DIR
from tests.oracle_parity import check_scalar_outputs


def _batch_query_items():
    import __spark_entry__ as entry_mod

    # q_st* execute a real availableNow streaming drain when built; they are
    # covered by tests/oracle_parity.py (which runs everything) — here we
    # keep the per-commit pytest loop fast with the lazy batch surface only.
    return [
        (name, fn)
        for name, fn in entry_mod.queries().items()
        if not name.startswith("q_st")
    ]


@pytest.mark.slow  # builds all ~290 batch plans — seal-gate tier
def test_all_batch_queries_emit_scalar_columns(spark):
    errs = []
    for name, fn in _batch_query_items():
        df = fn(spark, SF_DIR)
        err = check_scalar_outputs(df, name)
        if err:
            errs.append(err)
    assert not errs, "\n".join(errs)


def test_driver_priority_names_all_resolve():
    # a typo in _DRIVER_PRIORITY silently drops the query out of the
    # prioritized grading window — fail loudly instead
    import __spark_entry__ as entry_mod

    declared = set(entry_mod.queries().keys())
    missing = [k for k in entry_mod._DRIVER_PRIORITY if k not in declared]
    assert not missing, f"_DRIVER_PRIORITY names not declared: {missing}"
    # duplicate slots are silent no-ops under _driver_order's dict
    # comprehension (dedupes on first occurrence) and mislead rotation
    # edits about window composition — r10 ADVICE finding
    dupes = [k for k in set(entry_mod._DRIVER_PRIORITY)
             if entry_mod._DRIVER_PRIORITY.count(k) > 1]
    assert not dupes, f"duplicate _DRIVER_PRIORITY slots: {sorted(dupes)}"


def _last_green_rounds() -> dict[str, int]:
    """Per-query latest round with a driver-green row. Green = hash-proven,
    or a rows-only check (no hash recorded) that passed cleanly. An
    explicit hash_match=False is RED even when rows/schema matched."""
    import glob
    import json
    import re

    last: dict[str, int] = {}
    for path in glob.glob(str(Path(__file__).resolve().parent.parent
                              / "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", Path(path).name).group(1))
        for k, v in json.load(open(path)).items():
            if v.get("hash_match") or (v.get("hash_match") is None
                                       and v.get("rows_match")
                                       and v.get("err") is None):
                last[k] = max(last.get(k, 0), rnd)
    assert last, "no correctness files found"
    return last


def test_stale_regrade_window():
    # ROUND-8 ROTATION CONTRACT. As of r7 all 291 declared queries have a
    # driver-green row, so the old "never-graded queries lead" contract is
    # exhausted (any window would contain greens). The successor contract
    # keeps driver rows honest against code drift: the graded window (the
    # first ~50 dict entries) must lead with
    #   (a) _REGRADE_FIRST — queries whose implementation/fixture/oracle
    #       changed since their last green row (their old rows no longer
    #       certify HEAD), in list order at the very front; then
    #   (b) stalest-evidence-first — never-graded (new this round) and
    #       oldest-green queries before fresher ones: no window slot may
    #       hold a query strictly FRESHER than a query left outside.
    # (When a new round's correctness file lands, (b) fails until the next
    # rotation commit — by design: rotation IS the first task of a round.)
    import __spark_entry__ as entry_mod

    last = _last_green_rounds()
    ordered = list(entry_mod.queries().keys())
    regrade = list(entry_mod._REGRADE_FIRST)
    assert len(set(regrade)) == len(regrade), "duplicate _REGRADE_FIRST"
    missing = [k for k in regrade if k not in ordered]
    assert not missing, f"_REGRADE_FIRST names not declared: {missing}"
    assert ordered[: len(regrade)] == regrade, (
        "changed-implementation queries must open the graded window"
    )
    window = [k for k in ordered[:50] if k not in regrade]
    outside = [k for k in ordered[50:] if k not in regrade]
    if not window or not outside:
        return
    freshest_in = max(last.get(k, 0) for k in window)
    stalest_out = min(last.get(k, 0) for k in outside)
    assert freshest_in <= stalest_out, (
        f"window holds a round-{freshest_in} green while a round-"
        f"{stalest_out} green (staler evidence) waits outside — reorder "
        "_DRIVER_PRIORITY oldest-green-first"
    )


def test_red_rows_reenter_the_window():
    # a query whose LATEST driver row is red must sit in the graded window
    # (after its fix) — red rows re-certify, they are never "done"
    import glob
    import json
    import re

    import __spark_entry__ as entry_mod

    latest: dict[str, tuple[int, bool]] = {}
    for path in glob.glob(str(Path(__file__).resolve().parent.parent
                              / "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", Path(path).name).group(1))
        for k, v in json.load(open(path)).items():
            green = bool(
                v.get("hash_match") or (v.get("hash_match") is None
                                        and v.get("rows_match")
                                        and v.get("err") is None))
            if k not in latest or rnd > latest[k][0]:
                latest[k] = (rnd, green)
    red = {k for k, (_, green) in latest.items() if not green}
    first50 = set(list(entry_mod.queries().keys())[:50])
    stranded = sorted(red - first50)
    assert not stranded, f"red rows outside the graded window: {stranded}"


def test_oracle_keys_subset_of_queries():
    import __spark_entry__ as entry_mod

    qs = set(entry_mod.queries().keys())
    extra = [k for k in entry_mod.oracle_sql() if k not in qs]
    assert not extra, f"oracle_sql() keys without a queries() entry: {extra}"


@pytest.mark.slow  # runs every oracle through DuckDB — seal-gate tier
def test_no_pandas_bridge_dtype_divergence(spark):
    """The driver canonicalizes BOTH sides through pandas, so a column can
    hash-mismatch on dtype alone even when every value matches: DuckDB's
    HUGEINT (any sum(BIGINT), plain or windowed) and ALL DECIMALs reach
    pandas as float64, while Spark's ints stay int64 and DecimalType
    becomes object — CORRECTNESS_r05's only red row (q_n47) and nine
    would-be-red round-6 queries (q_ml1–ml7, q_n50, q_v8) were exactly
    this class. This test runs EVERY oracle through the same duckdb.df()
    bridge and compares per-column dtype kinds against the Spark result
    schema. Building the Spark side is mostly lazy, but a few queries
    execute jobs at construction (two-level prefix sums, ANN index
    builds) and the sstable/archive queries write temp fixtures — those
    are swept up afterwards; expect this test to take minutes."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    import __spark_entry__ as entry_mod
    from oracle_dtype_audit import audit_query
    from oracle_parity import duck_connection

    from tests.conftest import SF_DIR

    import glob
    import os
    import shutil
    import tempfile

    before = set(glob.glob(os.path.join(tempfile.gettempdir(), "ctrs_*")))
    con = duck_connection(SF_DIR)
    oracles = entry_mod.oracle_sql()
    bad = {}
    try:
        for name, fn in entry_mod.queries().items():
            if name not in oracles:
                continue
            findings = audit_query(fn(spark, SF_DIR), oracles[name], con)
            if findings:
                bad[name] = findings
    finally:
        for d in set(glob.glob(os.path.join(tempfile.gettempdir(),
                                            "ctrs_*"))) - before:
            shutil.rmtree(d, ignore_errors=True)
    assert not bad, f"dtype divergence through the pandas bridge: {bad}"
