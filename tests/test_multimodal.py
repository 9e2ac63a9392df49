"""Multimodal plumbing: binary columns, Arrow UDF feature extraction (stub),
frame-sample planning."""

import hashlib

import pytest

from cassandra_ttl_remover_spark.operators.multimodal import (
    decode_stub,
    documents_as_media,
    extract_features,
    frame_sample,
)


def test_decode_stub_gates_without_fake():
    # non-RIFF payloads still hit the stub boundary without fake=True
    with pytest.raises(NotImplementedError):
        decode_stub(b"abc", {})


def test_decode_stub_real_wav_branch():
    # RIFF/WAVE payloads decode for REAL (stdlib wave) — no stub, no fake
    from cassandra_ttl_remover_spark.operators.multimodal import _text_to_wav_bytes

    payload = _text_to_wav_bytes(b"hello", 8000)
    sr, nch, sw, n, dur, ssq_lo, ssq_hi = (
        decode_stub(payload, {})[i] for i in range(7)
    )
    assert (sr, nch, sw, n) == (8000.0, 1.0, 2.0, 5.0)
    want_ssq = sum(((b - 128) * 256) ** 2 for b in b"hello")
    assert int(ssq_lo) + (int(ssq_hi) << 32) == want_ssq


def test_wav_roundtrip_exact():
    # encoder -> stdlib decoder round-trip: every header field and sample
    # statistic must match the integer model the oracle recomputes
    from cassandra_ttl_remover_spark.operators.multimodal import (
        _parse_wav,
        _text_to_wav_bytes,
    )

    data = bytes(range(256))
    sr, nch, sw, n, dur, ssq, peak = _parse_wav(_text_to_wav_bytes(data, 16_000))
    assert (sr, nch, sw, n) == (16_000, 1, 2, 256)
    assert dur == 256 * 1000 // 16_000
    assert ssq == sum(((b - 128) * 256) ** 2 for b in data)
    assert peak == max(abs((b - 128) * 256) for b in data)
    # empty payload: zero samples, zero stats, valid container
    assert _parse_wav(_text_to_wav_bytes(b"", 16_000))[3:] == (0, 0, 0, 0)


def test_wav_decode_features_distributed(documents):
    from cassandra_ttl_remover_spark.operators.multimodal import (
        documents_as_wav,
        wav_decode_features,
    )

    docs = documents.limit(10)
    out = {r.media_id: r for r in
           wav_decode_features(documents_as_wav(docs)).collect()}
    src = {r.doc_id: r.text.encode("utf-8") for r in docs.collect()}
    assert out.keys() == src.keys()
    for mid, data in src.items():
        r = out[mid]
        assert r.n_samples == len(data)
        assert r.ssq == sum(((b - 128) * 256) ** 2 for b in data)
        assert r.sample_rate == 16_000 and r.n_channels == 1


def test_wav_frame_energies_match_python_replica(documents):
    """Frame f covers samples [f*hop, f*hop+win); trailing partials drop;
    sub-window clips emit nothing — checked against a pure-Python STFT
    framing replica over the same generator mapping."""
    from cassandra_ttl_remover_spark.operators.multimodal import (
        documents_as_wav,
        wav_frame_energies,
    )

    win, hop = 64, 48
    docs = documents.limit(12)
    got = {(r.media_id, r.frame_idx): (r.ssq, r.peak)
           for r in wav_frame_energies(
               documents_as_wav(docs), win=win, hop=hop).collect()}
    want = {}
    for r in docs.collect():
        s = [(b - 128) * 256 for b in r.text.encode("utf-8")]
        nf = (len(s) - win) // hop + 1 if len(s) >= win else 0
        for f in range(nf):
            seg = s[f * hop:f * hop + win]
            want[(r.doc_id, f)] = (sum(x * x for x in seg),
                                   max(abs(x) for x in seg))
    assert got == want and len(got) > 0


def test_wav_frame_energies_short_clip_yields_no_rows(spark, documents):
    from cassandra_ttl_remover_spark.operators.multimodal import (
        documents_as_wav,
        wav_frame_energies,
    )

    docs = documents.limit(3)
    assert wav_frame_energies(documents_as_wav(docs), win=10**6).count() == 0


def test_decode_stub_fake_deterministic():
    f1 = decode_stub(b"hello world", {}, fake=True)
    f2 = decode_stub(b"hello world", {}, fake=True)
    assert f1 == f2 and len(f1) == 8 and abs(sum(f1) - 1.0) < 1e-9


def test_media_frame_schema(documents):
    media = documents_as_media(documents)
    assert dict(media.dtypes)["payload"] == "binary"
    row = media.first()
    assert 1 <= row.meta.width <= 64 and row.meta.kind == "image"


def test_extract_features_arrow_path(documents):
    media = documents_as_media(documents.limit(20))
    feats = extract_features(media, fake=True).collect()
    assert len(feats) == 20
    by_id = {r.media_id: r for r in feats}
    src = {r.media_id: bytes(r.payload) for r in media.collect()}
    for mid, payload in src.items():
        assert by_id[mid].sha256 == hashlib.sha256(payload).hexdigest()
        assert by_id[mid].n_bytes == len(payload)
        assert len(by_id[mid].features) == 8


def test_frame_sample_plan(documents):
    import pyspark.sql.functions as F

    media = documents_as_media(documents.limit(5)).withColumn(
        "meta", F.expr("named_struct('kind','video','mime','v','width',int(1),"
                       "'height',int(1),'n_frames',int(25),'sample_rate',cast(null as int),"
                       "'duration_ms',cast(null as bigint))")
    )
    out = frame_sample(media, every_nth=10).first()
    assert list(out.sample_frames) == [0, 10, 20]


def test_frame_sample_plan_exploded(spark):
    from cassandra_ttl_remover_spark.operators.multimodal import (
        documents_as_video,
        frame_sample_plan,
    )

    # 400 chars -> 25 frames; 10 chars -> clamped to 1 frame
    docs = spark.createDataFrame(
        [(1, "x" * 400), (2, "y" * 10)], "doc_id long, text string"
    )
    media = documents_as_video(docs)
    metas = {r.media_id: r.meta for r in media.collect()}
    assert metas[1].n_frames == 25 and metas[2].n_frames == 1
    rows = [(r.media_id, r.frame_idx, r.frame_ms)
            for r in frame_sample_plan(media, every_nth=10, fps=24)
            .orderBy("media_id", "frame_idx").collect()]
    # frame_ms = frame_idx*1000 div 24, truncated integer division
    assert rows == [(1, 0, 0), (1, 10, 416), (1, 20, 833), (2, 0, 0)]


def test_resize_fake_path(documents):
    from cassandra_ttl_remover_spark.operators.multimodal import resize

    media = documents_as_media(documents.limit(10))
    out = resize(media, 16, 8, fake=True).collect()
    assert len(out) == 10
    for r in out:
        assert len(bytes(r.payload)) == 16 * 8
        assert r.meta.width == 16 and r.meta.height == 8


def test_audio_chunks_layout(spark, documents):
    import pyspark.sql.functions as F

    from cassandra_ttl_remover_spark.operators.multimodal import (
        audio_chunks,
        documents_as_audio,
    )

    media = documents_as_audio(documents)
    ch = audio_chunks(media, chunk_ms=1000).cache()
    # chunk layout: idx dense from 0, windows tile [0, duration] exactly
    assert ch.filter(F.col("start_ms") != F.col("chunk_idx") * 1000).count() == 0
    assert ch.filter(F.col("end_ms") <= F.col("start_ms")).count() == 0
    per = ch.groupBy("media_id").agg(
        F.count("*").alias("n"), F.max("chunk_idx").alias("mx"),
        F.max("end_ms").alias("last_end"),
    )
    assert per.filter(F.col("n") != F.col("mx") + 1).count() == 0
    dur = media.select(
        "media_id", F.col("meta.duration_ms").alias("d")
    )
    assert per.join(dur, "media_id").filter(F.col("last_end") != F.col("d")).count() == 0
    # metadata-only plan: no shuffle
    plan = audio_chunks(media)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_patch_grid_plan_tiles_and_edges(spark):
    from cassandra_ttl_remover_spark.operators.multimodal import patch_grid_plan
    import pyspark.sql.functions as F

    media = spark.createDataFrame(
        [(1, 40, 33), (2, 15, 100), (3, 16, 16)],
        "media_id long, w int, h int",
    ).select(
        "media_id",
        F.expr("named_struct('kind','image','mime','i','width',w,'height',h,"
               "'n_frames',int(1),'sample_rate',cast(null as int),"
               "'duration_ms',cast(null as bigint))").alias("meta"),
    )
    rows = {(r.media_id, r.px, r.py, r.x0, r.y0)
            for r in patch_grid_plan(media, patch=16).collect()}
    # 40x33 -> 2x2 tiles (partial edges cropped); 15-wide -> none; 16x16 -> 1
    assert rows == {
        (1, 0, 0, 0, 0), (1, 0, 1, 0, 16), (1, 1, 0, 16, 0), (1, 1, 1, 16, 16),
        (3, 0, 0, 0, 0),
    }


def test_pgm_roundtrip_exact(spark):
    """P5 encode -> strict parse recovers dimensions and exact pixel
    stats; padding affects n_pixels only."""
    from cassandra_ttl_remover_spark.operators.multimodal import (
        _parse_pgm,
        _text_to_pgm_bytes,
    )

    data = b"hello world"
    b = _text_to_pgm_bytes(data, width=4)
    w, h, n, s, mx = _parse_pgm(b)
    assert (w, h, n) == (4, 3, 12)
    assert s == sum(data)
    assert mx == max(data)
    # empty payload: one zero row
    w, h, n, s, mx = _parse_pgm(_text_to_pgm_bytes(b"", width=4))
    assert (w, h, n, s, mx) == (4, 1, 4, 0, 0)


def test_pgm_parser_rejects_corrupt(spark):
    import pytest as _pytest

    from cassandra_ttl_remover_spark.operators.multimodal import (
        _parse_pgm,
        _text_to_pgm_bytes,
    )

    good = _text_to_pgm_bytes(b"abc", width=2)
    with _pytest.raises(ValueError):
        _parse_pgm(good[:-1])  # truncated raster
    with _pytest.raises(ValueError):
        _parse_pgm(b"P6" + good[2:])  # wrong magic


def test_decode_stub_real_pgm_branch(spark):
    from cassandra_ttl_remover_spark.operators.multimodal import (
        _text_to_pgm_bytes,
        decode_stub,
    )

    feats = decode_stub(_text_to_pgm_bytes(b"abc", 2), {}, fake=False)
    assert feats[:4] == [2.0, 2.0, 1.0, 4.0]
    assert feats[5] == float(sum(b"abc"))


def test_ppm_roundtrip_exact(spark):
    """P6 encode -> strict parse recovers dimensions and exact per-channel
    sums; padding affects n_pixels only."""
    from cassandra_ttl_remover_spark.operators.multimodal import (
        _parse_ppm,
        _text_to_ppm_bytes,
    )

    data = b"hello world"  # 11 bytes -> 4 pixels
    b = _text_to_ppm_bytes(data, width=3)
    w, h, n, sr, sg, sb, mx = _parse_ppm(b)
    assert (w, h, n) == (3, 2, 6)
    assert sr == sum(data[0::3])
    assert sg == sum(data[1::3])
    assert sb == sum(data[2::3])
    assert mx == max(data)
    # empty payload: one zero pixel row
    w, h, n, sr, sg, sb, mx = _parse_ppm(_text_to_ppm_bytes(b"", width=3))
    assert (w, h, n, sr, sg, sb, mx) == (3, 1, 3, 0, 0, 0, 0)


def test_ppm_parser_rejects_corrupt(spark):
    import pytest as _pytest

    from cassandra_ttl_remover_spark.operators.multimodal import (
        _parse_ppm,
        _text_to_ppm_bytes,
    )

    good = _text_to_ppm_bytes(b"abcdef", width=2)
    with _pytest.raises(ValueError):
        _parse_ppm(good[:-1])  # truncated raster
    with _pytest.raises(ValueError):
        _parse_ppm(b"P5" + good[2:])  # wrong magic


def test_ppm_decode_features_frame(spark):
    from cassandra_ttl_remover_spark.operators.multimodal import (
        documents_as_ppm,
        ppm_decode_features,
    )

    docs = spark.createDataFrame(
        [(1, "abc"), (2, ""), (3, "x" * 100)], "doc_id long, text string"
    )
    got = {r.media_id: r for r in
           ppm_decode_features(documents_as_ppm(docs, width=4)).collect()}
    assert got[1].n_pixels == 4 and got[1].sum_r == ord("a") + 0
    assert got[2].n_pixels == 4 and (got[2].sum_r, got[2].max_px) == (0, 0)
    # 100 bytes -> 34 pixels -> ceil(34/4)=9 rows
    assert (got[3].width, got[3].height, got[3].n_pixels) == (4, 9, 36)
    assert got[3].sum_r == ord("x") * 34  # bytes 0,3,...,99 -> 34 of them


def test_pbm_roundtrip_exact_bits():
    from cassandra_ttl_remover_spark.operators.multimodal import (
        _parse_pbm,
        _text_to_pbm_bytes,
    )

    data = bytes(range(256))
    w, h, npx, nb = _parse_pbm(_text_to_pbm_bytes(data, 16))
    assert (w, h, npx) == (16, 128, 2048)
    assert nb == sum(b.bit_count() for b in data) == 1024
    # empty payload: one zero-padded row, no black pixels
    assert _parse_pbm(_text_to_pbm_bytes(b"", 16)) == (16, 1, 16, 0)
    import pytest

    with pytest.raises(ValueError, match="byte-aligned"):
        _text_to_pbm_bytes(b"x", 12)
    with pytest.raises(ValueError, match="not a P4"):
        _parse_pbm(b"P5\n1 1\n255\n\x00")


def test_pbm_decode_features_distributed(documents):
    from cassandra_ttl_remover_spark.operators.multimodal import (
        documents_as_pbm,
        pbm_decode_features,
    )

    docs = documents.limit(10)
    out = {r.media_id: r for r in
           pbm_decode_features(documents_as_pbm(docs, width=16)).collect()}
    src = {r.doc_id: r.text.encode("utf-8") for r in docs.collect()}
    assert out.keys() == src.keys()
    for mid, data in src.items():
        r = out[mid]
        nb = sum(b.bit_count() for b in data)
        assert r.n_black == nb
        assert r.height == max(1, -(-len(data) // 2))
        assert r.fill_permille == nb * 1000 // r.n_pixels

def test_png_roundtrip_all_filters():
    """The encoder cycles all five scanline filters by row, so a >=5-row
    payload proves every reconstruction path (None/Sub/Up/Average/Paeth)
    recovers the exact raster through real DEFLATE."""
    from cassandra_ttl_remover_spark.operators.multimodal import (
        _parse_png,
        _text_to_png_bytes,
    )

    data = bytes(range(256)) * 2          # 64 rows at width 8: filters cycle
    w, h, npx, s, mx = _parse_png(_text_to_png_bytes(data, 8))
    assert (w, h, npx) == (8, 64, 512)
    assert s == sum(data) and mx == 255
    # empty payload: one zero row
    assert _parse_png(_text_to_png_bytes(b"", 8)) == (8, 1, 8, 0, 0)


def test_png_parser_rejects_corrupt():
    from cassandra_ttl_remover_spark.operators.multimodal import (
        _parse_png,
        _text_to_png_bytes,
    )
    import pytest

    good = _text_to_png_bytes(b"some pixels here", 4)
    with pytest.raises(ValueError, match="not a PNG"):
        _parse_png(b"GIF89a" + good)
    # flip a raster byte inside IDAT: CRC must catch it
    bad = bytearray(good)
    bad[len(bad) // 2] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        _parse_png(bytes(bad))


def test_png_decode_features_distributed(documents):
    from cassandra_ttl_remover_spark.operators.multimodal import (
        documents_as_png,
        png_decode_features,
    )

    docs = documents.limit(10)
    out = {r.media_id: r for r in
           png_decode_features(documents_as_png(docs, width=32)).collect()}
    src = {r.doc_id: r.text.encode("utf-8") for r in docs.collect()}
    assert out.keys() == src.keys()
    for mid, data in src.items():
        r = out[mid]
        assert r.sum_px == sum(data)
        assert r.max_px == (max(data) if data else 0)
        assert r.height == max(1, -(-len(data) // 32))


def test_lzw_roundtrip_hard_cases():
    """Width growth across 512/1024/2048, the 4096-entry CLEAR reset,
    the KwKwK special case (low-alphabet input), and high-repetition
    compression all round-trip exactly."""
    import random

    from cassandra_ttl_remover_spark.operators.multimodal import (
        _lzw_compress,
        _lzw_decompress,
    )

    rnd = random.Random(13)
    cases = [
        b"", b"x", b"aaaaaaaaaa", b"abcabcabc",
        bytes(rnd.randrange(256) for _ in range(20000)),  # cap + reset
        bytes(rnd.randrange(4) for _ in range(30000)),    # KwKwK chains
        b"the quick brown fox " * 1000,
    ]
    for c in cases:
        assert _lzw_decompress(_lzw_compress(c)) == c
    comp = _lzw_compress(b"the quick brown fox " * 1000)
    assert len(comp) < 2000          # repetition actually compresses
    import pytest

    with pytest.raises(ValueError, match="truncated"):
        _lzw_decompress(b"\x00\x01")


def test_gif_roundtrip_and_rejects(documents):
    import pytest

    from cassandra_ttl_remover_spark.operators.multimodal import (
        _parse_gif,
        _text_to_gif_bytes,
        documents_as_gif,
        gif_decode_features,
    )

    data = bytes(range(256)) * 2
    w, h, npx, s, mx = _parse_gif(_text_to_gif_bytes(data, 32))
    assert (w, h, npx, s, mx) == (32, 16, 512, sum(data), 255)
    assert _parse_gif(_text_to_gif_bytes(b"", 32)) == (32, 1, 32, 0, 0)
    with pytest.raises(ValueError, match="not a GIF"):
        _parse_gif(b"PNG..")
    # distributed path against source bytes
    docs = documents.limit(8)
    out = {r.media_id: r for r in
           gif_decode_features(documents_as_gif(docs, width=32)).collect()}
    src = {r.doc_id: r.text.encode() for r in docs.collect()}
    for k, d in src.items():
        assert out[k].sum_px == sum(d) and out[k].max_px == max(d)


def test_decode_census_quarantines_torn_blobs(spark, documents):
    from cassandra_ttl_remover_spark.operators.multimodal import (
        _parse_jpeg, corrupt_every_nth, decode_census, documents_as_jpeg)

    docs = documents.limit(50)
    media = corrupt_every_nth(documents_as_jpeg(docs, width=32), n=5)
    row = decode_census(media, _parse_jpeg).collect()[0]
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    want_bad = sum(1 for i in ids if i % 5 == 0)
    assert row.n_total == 50
    assert row.n_quarantined == want_bad
    assert row.n_decoded == 50 - want_bad
    # survivors decode exactly
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    want_sum = sum(64 * sum(texts[i].encode()) for i in ids if i % 5 != 0)
    assert row.sum_px_decoded == want_sum


def test_decode_census_all_clean(spark, documents):
    from cassandra_ttl_remover_spark.operators.multimodal import (
        _parse_jpeg, decode_census, documents_as_jpeg)

    row = decode_census(
        documents_as_jpeg(documents.limit(20), width=32), _parse_jpeg
    ).collect()[0]
    assert (row.n_total, row.n_quarantined) == (20, 0)


def test_animated_gif_frames_roundtrip(spark, documents):
    """Every frame of every blob decodes to the exact text segment's
    stats; sampling keeps exactly the frames with idx % n == 0."""
    import math

    from cassandra_ttl_remover_spark.operators.multimodal import (
        animated_gif_frames, documents_as_animated_gif)

    docs = documents.limit(30)
    media = documents_as_animated_gif(docs, width=16, frame_rows=2)
    per = 32
    texts = {r.doc_id: r.text.encode() for r in docs.collect()}
    all_frames = animated_gif_frames(media, every_nth=1).collect()
    by_doc = {}
    for r in all_frames:
        by_doc.setdefault(r.media_id, []).append(r)
    for mid, frames in by_doc.items():
        t = texts[mid]
        assert len(frames) == max(1, math.ceil(len(t) / per))
        for r in frames:
            seg = t[r.frame_idx * per:(r.frame_idx + 1) * per]
            assert r.sum_px == sum(seg)
    sampled = animated_gif_frames(media, every_nth=3).collect()
    assert {(r.media_id, r.frame_idx) for r in sampled} == \
           {(r.media_id, r.frame_idx) for r in all_frames
            if r.frame_idx % 3 == 0}


def test_animated_gif_malformed_raises(spark):
    import pytest

    from cassandra_ttl_remover_spark.operators.multimodal import (
        _parse_animated_gif, _text_to_animated_gif_bytes)

    blob = _text_to_animated_gif_bytes(b"some reasonable text" * 10, 16, 2)
    with pytest.raises(ValueError):
        _parse_animated_gif(blob[:-4])  # truncated before trailer
    with pytest.raises(ValueError):
        _parse_animated_gif(b"NOTGIF89a")


def test_jpeg_meta_height_matches_decoded_raster(spark, documents):
    """Regression: meta.height must equal the SOF/decoded height (one
    byte per 8x8 BLOCK, not per pixel)."""
    from cassandra_ttl_remover_spark.operators.multimodal import (
        documents_as_jpeg, jpeg_decode_features)

    docs = documents.limit(20)
    media = documents_as_jpeg(docs, width=32)
    metas = {r.media_id: r.meta for r in media.collect()}
    for r in jpeg_decode_features(media).collect():
        m = metas[r.media_id]
        assert (int(m["width"]), int(m["height"])) == (r.width, r.height)


def test_jpeg_corrupt_sof_quarantines_not_oom(spark):
    """A torn HEADER (absurd SOF dimensions) must raise ValueError at the
    sanity bound -- and the census must count it, not fail the task."""
    import struct

    import pandas as pd
    import pytest

    from cassandra_ttl_remover_spark.operators.multimodal import (
        _parse_jpeg, _text_to_jpeg_bytes)

    blob = bytearray(_text_to_jpeg_bytes(b"hello corrupt sof", 16))
    i = bytes(blob).index(b"\xff\xc0")
    # SOF body: len(2) prec(1) H(2) W(2) ... -> overwrite H and W
    struct.pack_into(">HH", blob, i + 5, 65500, 65500)
    with pytest.raises(ValueError, match="sanity bound"):
        _parse_jpeg(bytes(blob))


def test_pgm_dhash_gradient_and_duplicates(spark):
    """dHash bits follow row-sum gradients exactly; byte-identical
    texts collide (n_same counts them), brightness-shifted-but-
    gradient-equal rasters collide too (the perceptual property),
    different gradients do not."""
    from cassandra_ttl_remover_spark.operators.multimodal import (
        _pgm_row_dhash, _text_to_pgm_bytes, documents_as_pgm, pgm_dhash,
    )

    # 4-wide: rows 'aaaa'(388) 'bbbb'(392) 'aaaa'(388) -> bits '01'... wait
    h, bits = _pgm_row_dhash(_text_to_pgm_bytes(b"aaaabbbbaaaa", 4))
    assert (h, bits) == (3, "01")  # 388<392 -> '0', 392>388 -> '1'
    # brightness shift preserves the gradient -> same hash
    _, bits2 = _pgm_row_dhash(_text_to_pgm_bytes(b"ccccddddcccc", 4))
    assert bits2 == bits
    # single-row image -> empty hash
    assert _pgm_row_dhash(_text_to_pgm_bytes(b"xy", 4))[1] == ""

    docs = spark.createDataFrame(
        [(1, "aaaabbbbaaaa"), (2, "aaaabbbbaaaa"), (3, "ccccddddcccc"),
         (4, "zzzzaaaazzzz")],
        "doc_id long, text string",
    )
    rows = {r.media_id: r for r in
            pgm_dhash(documents_as_pgm(docs, width=4)).collect()}
    assert rows[1].dhash == rows[2].dhash == rows[3].dhash == "01"
    assert rows[1].n_same == 3
    assert rows[4].dhash == "10" and rows[4].n_same == 1


def test_wav_decimate_block_math_and_edges(spark):
    """Boxcar decimation: block sums, trailing-partial drop, and the
    shorter-than-one-block edge — verified against a hand computation."""
    from cassandra_ttl_remover_spark.operators.multimodal import (
        _text_to_wav_bytes,
        documents_as_wav,
        wav_decimate_features,
    )

    docs = spark.createDataFrame(
        [(1, "ABCDE"), (2, "xy"), (3, "abc")],
        "doc_id long, text string",
    )
    media = documents_as_wav(docs)
    rows = {r.media_id: r for r in
            wav_decimate_features(media, factor=3).collect()}
    # doc 1: samples (b-128)*256 for A..E; blocks of 3 -> one block,
    # trailing 2 dropped
    s = [(b - 128) * 256 for b in b"ABCDE"]
    b0 = sum(s[:3])
    assert rows[1].n_blocks == 1 and rows[1].ssq == b0 * b0
    assert rows[1].peak == abs(b0)
    assert rows[1].out_rate == 16_000 // 3
    # doc 2: 2 chars < one block -> zero blocks, zero stats
    assert rows[2].n_blocks == 0 and rows[2].ssq == 0 and rows[2].peak == 0
    # factor=1 is the identity decimator: ssq equals the plain decode ssq
    from cassandra_ttl_remover_spark.operators.multimodal import (
        wav_decode_features,
    )
    ident = {r.media_id: r.ssq for r in
             wav_decimate_features(media, factor=1).collect()}
    full = {r.media_id: r.ssq for r in
            wav_decode_features(media).collect()}
    assert ident == full


def test_pgm_resize_nearest_neighbor_exact(spark):
    """NN resize: identity dims reproduce the decode stats; a 2x
    downscale picks exactly the even rows/cols; upscale replicates
    pixels; degenerate 1x1 output = top-left source pixel."""
    from cassandra_ttl_remover_spark.operators.multimodal import (
        documents_as_pgm,
        pgm_decode_features,
        pgm_resize_features,
    )

    docs = spark.createDataFrame(
        [(1, "ABCDEFGHIJKLMNOP"), (2, "xy")],
        "doc_id long, text string",
    )
    media = documents_as_pgm(docs, width=4)  # doc1: 4x4, doc2: 4x1
    dec = {r.media_id: r for r in pgm_decode_features(media).collect()}
    ident = {r.media_id: r for r in
             pgm_resize_features(media, 4, dec[1].height).collect()}
    assert ident[1].px_sum == dec[1].sum_px
    half = {r.media_id: r for r in
            pgm_resize_features(media, 2, 2).collect()}
    # doc1 4x4 raster rows 'ABCD','EFGH','IJKL','MNOP'; NN(2,2) picks
    # (0,0),(0,2),(2,0),(2,2) = A,C,I,K
    assert half[1].px_sum == sum(b"ACIK")
    assert half[1].px_max == max(b"ACIK")
    one = {r.media_id: r for r in
           pgm_resize_features(media, 1, 1).collect()}
    assert one[1].px_sum == ord("A") and one[2].px_sum == ord("x")
    up = {r.media_id: r for r in
          pgm_resize_features(media, 8, 2).collect()}
    # upscale replicates: each of A..D twice on row0, I..L twice on row1
    assert up[1].px_sum == 2 * (sum(b"ABCD") + sum(b"IJKL"))
