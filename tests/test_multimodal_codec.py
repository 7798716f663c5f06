"""Real multimodal codecs (PPM image / WAV audio, stdlib+numpy only).

Pixel-exact assertions against independent numpy references, plus the
Arrow-kernel integration (magic sniffing: real codec for PPM/WAV, digest
stub for opaque bytes)."""

from __future__ import annotations

import io
import wave

import numpy as np
import pytest

from btrdb_spark.functions import multimodal as mm


def _img(w=7, h=5, seed=3):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_ppm_roundtrip_exact():
    px = _img()
    assert np.array_equal(mm.decode_ppm(mm.encode_ppm(px)), px)


def test_ppm_header_grammar_comments_and_whitespace():
    px = _img(3, 2)
    blob = b"P6\n# a comment\n  3\t2\n# another\n255\n" + px.tobytes()
    assert np.array_equal(mm.decode_ppm(blob), px)


def test_resize_nearest_matches_reference():
    px = _img(8, 6)
    out = mm.resize_nearest(px, 5, 4)
    ref = np.empty((4, 5, 3), dtype=np.uint8)
    for y in range(4):
        for x in range(5):
            ref[y, x] = px[(y * 6) // 4, (x * 8) // 5]
    assert np.array_equal(out, ref)


def test_resize_identity_and_upscale():
    px = _img(4, 4)
    assert np.array_equal(mm.resize_nearest(px, 4, 4), px)
    up = mm.resize_nearest(px, 8, 8)
    assert up.shape == (8, 8, 3)
    assert np.array_equal(up[::2, ::2], px)  # each src pixel survives


def test_wav_decode_exact():
    samples = (np.arange(-100, 100) * 50).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(8000)
        f.writeframes(samples.tobytes())
    dec, rate = mm.decode_wav(buf.getvalue())
    assert rate == 8000 and dec.shape == (200, 1)
    assert np.array_equal((dec[:, 0] * 32768.0).astype(np.int64), samples.astype(np.int64))


def test_sniff_and_dispatch():
    assert mm.sniff_media_format(mm.encode_ppm(_img())) == "ppm"
    assert mm.sniff_media_format(b"not media at all") == "opaque"
    # corrupt PPM (magic but truncated raster) must fall back, not raise
    feats = mm._decode_any(b"P6\n4 4\n255\nxx", "image")
    assert feats == mm._decode_stub(b"P6\n4 4\n255\nxx", "image")


def test_ppm_features_integer_exact():
    px = _img(6, 4, seed=9)
    w, h, sr, sg, sb, lo, hi, n = mm._ppm_features(mm.encode_ppm(px))
    assert (w, h, n) == (6.0, 4.0, 24.0)
    assert sr == float(px[:, :, 0].astype(int).sum())
    assert sb == float(px[:, :, 2].astype(int).sum())
    assert lo == float(px.min()) and hi == float(px.max())


def test_spark_kernels_run_real_codecs(spark):
    docs = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    media = mm.synthetic_ppm_media(docs)
    feats = {r["media_id"]: r for r in mm.extract_features(media).collect()}
    assert len(feats) == 20
    # independent recomputation of doc 7's statistics from the closed form
    w, h = 8 + 7 % 5, 6 + 7 % 3
    raster = (7 * 31 + np.arange(w * h * 3)) % 256
    f = feats[7]["feature"]
    assert f[0] == w and f[1] == h
    assert f[2] == float(raster[0::3].sum())
    resized = mm.resize(media, 5, 4)
    sums = {r["media_id"]: r["byte_sum"] for r in mm.raster_byte_sum(resized).collect()}
    ys = (np.arange(4) * h) // 4
    xs = (np.arange(5) * w) // 5
    expect = sum(
        int((7 * 31 + (sy * w * 3 + sx * 3 + c)) % 256)
        for sy in ys
        for sx in xs
        for c in range(3)
    )
    assert sums[7] == expect
    wavs = mm.synthetic_wav_media(docs)
    wf = {r["media_id"]: r["feature"] for r in mm.extract_features(wavs).collect()}
    n = 200 + 7 % 7 * 40
    s = (7 * 7 + np.arange(n) * 13) % 65536 - 32768
    assert wf[7][1] == n and wf[7][3] == float(s.sum())
