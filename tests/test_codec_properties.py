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
