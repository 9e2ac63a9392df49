"""Property tests for the pure-Python REFERENCE implementations of the
text-fingerprint operators (the same rules the Spark HOF forms encode —
the Spark==reference equality is pinned separately in test_text.py /
test_dedup.py on fixed cases; here hypothesis hammers the RULES)."""

import hashlib

import pytest

pytest.importorskip("hypothesis")

from hypothesis import given, settings, strategies as st  # noqa: E402

# two-tier suite (pytest.ini): property/cross-engine sweeps are the
# seal gate, not the per-commit gate
pytestmark = pytest.mark.slow

TOKEN = st.sampled_from(["a", "b", "c", "d", "e", "f", "g", "h"])
DOC = st.lists(TOKEN, min_size=0, max_size=40)


def _winnow_sel(tokens, w=4):
    grams = ([" ".join(tokens[i:i + 3]) for i in range(len(tokens) - 2)]
             if len(tokens) >= 3 else [])
    h = [hashlib.md5(g.encode()).hexdigest() for g in grams]
    sel = set()
    for j in range(max(len(h) - w + 1, 1) if h else 0):
        win = h[j:j + w]
        sel.add(min(win))
    return sel


@settings(max_examples=150, deadline=None)
@given(DOC, DOC, st.lists(TOKEN, min_size=6, max_size=10))
def test_winnowing_guarantee(prefix_a, prefix_b, shared):
    """Any two docs sharing a run of >= w+2 tokens share a fingerprint
    (the winnowing guarantee, w=4: shared runs of 6+ tokens produce >= 1
    common window whose min must be selected in both)."""
    da = prefix_a + shared
    db = shared + prefix_b
    assert _winnow_sel(da) & _winnow_sel(db)


@settings(max_examples=150, deadline=None)
@given(DOC)
def test_winnowing_density_bound(tokens):
    """Selected count never exceeds window count and is >= 1 when any
    gram exists (every window selects something)."""
    sel = _winnow_sel(tokens, 4)
    n_grams = max(len(tokens) - 2, 0)
    if n_grams == 0:
        assert sel == set()
    else:
        assert 1 <= len(sel) <= max(n_grams - 4 + 1, 1)


def _span_removal(docs, n=4, min_docs=2):
    """Reference implementation of dedup.remove_duplicate_spans' rule."""
    windows = {}
    for did, toks in docs.items():
        for i in range(len(toks) - n + 1):
            key = tuple(toks[i:i + n])
            windows.setdefault(key, set()).add(did)
    dup = {k: min(v) for k, v in windows.items() if len(v) >= min_docs}
    out = {}
    for did, toks in docs.items():
        covered = set()
        for i in range(len(toks) - n + 1):
            key = tuple(toks[i:i + n])
            if key in dup and dup[key] != did:
                covered.update(range(i, i + n))
        out[did] = [t for j, t in enumerate(toks) if j not in covered]
    return out


@settings(max_examples=100, deadline=None)
@given(st.dictionaries(st.integers(0, 5), DOC, min_size=2, max_size=5))
def test_span_removal_invariants(docs):
    """(1) cleaned docs never grow; (2) a doc that is canon of (or absent
    from) EVERY duplicated window it contains is untouched; (3) a doc
    containing no duplicated window is untouched. (The stronger claim —
    'the canon keeps each of its duplicated windows' — is FALSE under
    overlapping windows with different canons; the operator docstring
    documents that caveat, and hypothesis found the counterexample.)"""
    n = 4
    cleaned = _span_removal(docs, n=n)
    windows = {}
    for did, toks in docs.items():
        for i in range(len(toks) - n + 1):
            windows.setdefault(tuple(toks[i:i + n]), set()).add(did)
    dup = {k: min(v) for k, v in windows.items() if len(v) >= 2}
    for did, toks in docs.items():
        assert len(cleaned[did]) <= len(toks)
        own = [tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)]
        if all(k not in dup or dup[k] == did for k in own):
            assert cleaned[did] == toks, did
