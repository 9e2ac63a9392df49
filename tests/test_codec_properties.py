"""Property tests for the pure-Python codec pairs (PNG/DEFLATE+filters,
GIF/LZW): any byte string must round-trip exactly through encode->decode,
and the decoded statistics must equal direct computation on the source.
These are driver-side pure functions — no Spark session needed — so
hypothesis can hammer them cheaply."""

import math

import pytest

pytest.importorskip("hypothesis")

from hypothesis import given, settings, strategies as st  # noqa: E402

from cassandra_ttl_remover_spark.operators.multimodal import (  # noqa: E402
    _lzw_compress,
    _lzw_decompress,
    _parse_gif,
    _parse_png,
    _text_to_gif_bytes,
    _text_to_png_bytes,
)

payloads = st.binary(min_size=0, max_size=4000)


@settings(max_examples=60, deadline=None)
@given(payloads)
def test_lzw_roundtrip_property(data):
    assert _lzw_decompress(_lzw_compress(data)) == data


def test_lzw_eoi_width_boundary():
    """EOI width parity at the decoder's growth point. The decoder adds a
    dictionary entry on the FINAL data code (the encoder has no matching
    add), so when a segment has exactly 2^w - eoi - 1 adds the decoder
    grows width before reading EOI; the encoder must emit EOI one bit
    wider to match. Pre-fix this raised 'LZW stream truncated before EOI'
    whenever the stream ended on a byte boundary."""
    # pinned pre-fix failure (min_code_size=2, found by fuzzing)
    data = bytes.fromhex("020101020201010000030301")
    assert _lzw_decompress(_lzw_compress(data, 2), 2) == data
    # the ADVICE-named case at min_code_size=8: exactly 254 adds since
    # the initial CLEAR puts next_code at 512 == 2^9 when EOI is emitted
    d2 = bytes(range(255))
    assert _lzw_decompress(_lzw_compress(d2, 8), 8) == d2


@settings(max_examples=80, deadline=None)
@given(st.integers(2, 5), st.data())
def test_lzw_roundtrip_small_alphabet_property(mcs, data):
    """Small alphabets + small min_code_size cross the width-growth
    boundaries (2^w - eoi - 1 adds) orders of magnitude faster than
    8-bit payloads, so this is the variant that actually exercises the
    EOI parity path and mid-stream dictionary resets."""
    raw = bytes(
        data.draw(st.lists(st.integers(0, (1 << mcs) - 1), max_size=300))
    )
    assert _lzw_decompress(_lzw_compress(raw, mcs), mcs) == raw


@settings(max_examples=40, deadline=None)
@given(payloads, st.sampled_from([1, 3, 8, 32, 101]))
def test_png_roundtrip_property(data, width):
    w, h, n, s, mx = _parse_png(_text_to_png_bytes(data, width))
    assert w == width
    assert h == max(1, math.ceil(len(data) / width))
    assert n == w * h
    assert s == sum(data)
    assert mx == (max(data) if data else 0)


@settings(max_examples=40, deadline=None)
@given(payloads, st.sampled_from([1, 8, 32, 64]))
def test_gif_roundtrip_property(data, width):
    w, h, n, s, mx = _parse_gif(_text_to_gif_bytes(data, width))
    assert (w, n) == (width, w * h)
    assert h == max(1, math.ceil(len(data) / width))
    assert s == sum(data)
    assert mx == (max(data) if data else 0)
