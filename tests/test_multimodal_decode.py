"""Stdlib PNG decode + the probe-gated real-decoder hook (SURVEY.md §2.12e).

The encoder here is test-only: it writes a known pixel buffer through
each of the five PNG scanline filters (one per row), so the decoder's
un-filtering is checked byte-for-byte against ground truth rather than
roundtripping a single trivial filter.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from discogs_etl_spark.multimodal import (
    PNG_MAGIC,
    REAL_DECODE_CONF,
    _decode_one,
    decode_features,
    decode_png,
    real_decode_requested,
)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)


def _encode_png(pixels: np.ndarray, filters: list[int]) -> bytes:
    """Minimal PNG writer with a CHOSEN filter type per row (the sandbox
    has no imaging library, so the test brings its own encoder)."""
    h, w, ch = pixels.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = bytearray()
    prev = bytes(w * ch)
    for y in range(h):
        row = pixels[y].reshape(-1).tobytes()
        f = filters[y % len(filters)]
        raw.append(f)
        for x in range(w * ch):
            a = row[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if f == 0:
                filt = row[x]
            elif f == 1:
                filt = (row[x] - a) & 0xFF
            elif f == 2:
                filt = (row[x] - b) & 0xFF
            elif f == 3:
                filt = (row[x] - ((a + b) >> 1)) & 0xFF
            else:
                filt = (row[x] - _paeth(a, b, c)) & 0xFF
            raw.append(filt)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def _golden_pixels(h: int, w: int, ch: int) -> np.ndarray:
    rng = np.random.default_rng(42)
    return rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_decode_png_all_filters_all_color_types(ch):
    px = _golden_pixels(5, 7, ch)
    data = _encode_png(px, filters=[0, 1, 2, 3, 4])
    w, h, out = decode_png(data)
    assert (w, h) == (7, 5)
    assert out.shape == px.shape
    assert np.array_equal(out, px)


def test_decode_png_rejects_garbage_and_exotics():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")
    px = _golden_pixels(2, 2, 3)
    data = bytearray(_encode_png(px, [0]))
    data[8 + 8 + 8] = 16  # IHDR bit depth byte -> 16-bit
    with pytest.raises(NotImplementedError):
        decode_png(bytes(data))


def test_decode_one_real_png_true_dimensions():
    px = _golden_pixels(3, 9, 3)
    payload = _encode_png(px, [0, 4])
    feats = _decode_one(payload, "image", real=True)
    # REAL dimensions from the bytes, not the md5-derived fake ones
    assert (feats["width"], feats["height"]) == (9, 3)
    assert feats["duration_ms"] is None and feats["n_frames"] is None
    fake = _decode_one(payload, "image", real=False)
    assert (fake["width"], fake["height"]) != (9, 3)


def test_decode_one_real_non_png_still_gated():
    with pytest.raises(NotImplementedError):
        _decode_one(b"\xff\xd8\xff jpeg-ish", "image", real=True)
    with pytest.raises(NotImplementedError):
        _decode_one(b"RIFF....WAVE", "audio", real=True)


def test_real_decode_probe_env_wins(monkeypatch):
    monkeypatch.setenv("DISCOGS_ETL_SPARK_REAL_DECODE", "1")
    assert real_decode_requested() is True
    monkeypatch.setenv("DISCOGS_ETL_SPARK_REAL_DECODE", "false")
    assert real_decode_requested() is False


def test_decode_features_real_path_via_conf(spark, monkeypatch):
    monkeypatch.delenv("DISCOGS_ETL_SPARK_REAL_DECODE", raising=False)
    px = _golden_pixels(4, 6, 3)
    payload = _encode_png(px, [0, 1, 2, 3])
    df = spark.createDataFrame(
        [(1, bytearray(payload), "image")], "doc_id long, payload binary, media_type string"
    )
    spark.conf.set(REAL_DECODE_CONF, "true")
    try:
        row = decode_features(df).collect()[0]
    finally:
        spark.conf.set(REAL_DECODE_CONF, "false")
    assert (row["width"], row["height"]) == (6, 4)
    # and the default (conf off) stays on the deterministic fake
    fake_row = decode_features(df).collect()[0]
    assert (fake_row["width"], fake_row["height"]) != (6, 4)
