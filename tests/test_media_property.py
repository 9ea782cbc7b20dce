"""Property-based media-decoder fidelity tests (SURVEY.md §5.2 style).

Hypothesis-generated pixel buffers / PCM headers / AVI headers →
test-only golden encoders (tests/test_multimodal_decode.py) → stdlib
decoders → field-exact round-trip.  Spark is deliberately NOT in the
loop — the decoders are pure Python and the property is about byte-level
parse semantics, not distribution.  The adversarial properties pin the
hardening contracts: arbitrary byte noise must only ever raise
ValueError / NotImplementedError (never struct.error, zlib.error, or an
index crash), and the PNG inflate bound must hold for any IHDR-claimed
geometry.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from discogs_etl_spark.multimodal import decode_avi, decode_png, decode_wav
from tests.test_multimodal_decode import _encode_avi, _encode_png, _encode_wav

# keep per-case work bounded: dims to 12, five filter choices per row
_dims = st.integers(min_value=1, max_value=12)
_filters = st.lists(st.integers(min_value=0, max_value=4), min_size=1, max_size=5)


@settings(max_examples=60, deadline=None)
@given(h=_dims, w=_dims, ch=st.sampled_from([1, 2, 3, 4]), filters=_filters, seed=st.integers(0, 2**31 - 1))
def test_png_roundtrip_any_shape_any_filters(h, w, ch, filters, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    ww, hh, out = decode_png(_encode_png(px, filters))
    assert (ww, hh) == (w, h)
    assert np.array_equal(out, px)


@settings(max_examples=60, deadline=None)
@given(h=_dims, w=_dims, ch=st.sampled_from([1, 2, 3, 4]), filters=_filters, seed=st.integers(0, 2**31 - 1))
def test_ahash_total_on_any_valid_png(h, w, ch, filters, seed):
    """The real perceptual hash is TOTAL over valid 8-bit PNGs of any
    shape (the NN index map (i*H)//8 is in range even for 1-pixel
    axes), always lands in BIGINT range, and is invariant to the alpha
    channel (gray+alpha hashes like gray, RGBA like RGB) — alpha is
    excluded from the grayscale by construction."""
    from discogs_etl_spark.multimodal import ahash64_png

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    hv = ahash64_png(_encode_png(px, filters))
    assert -(1 << 63) <= hv < (1 << 63)
    if ch in (2, 4):
        color = px[:, :, : ch - 1]
        assert ahash64_png(_encode_png(color, filters)) == hv


@settings(max_examples=60, deadline=None)
@given(
    n_frames=st.integers(min_value=0, max_value=20_000),
    rate=st.integers(min_value=1, max_value=384_000),
    channels=st.integers(min_value=1, max_value=8),
    bits=st.sampled_from([8, 16, 24, 32]),
    tag=st.sampled_from([1, 3]),
    extensible=st.booleans(),
    extra=st.booleans(),
)
def test_wav_roundtrip_any_pcm_shape(n_frames, rate, channels, bits, tag, extensible, extra):
    data = _encode_wav(
        n_frames=n_frames,
        sample_rate=rate,
        channels=channels,
        bits=bits,
        tag=tag,
        extensible=extensible,
        extra_chunk=extra,
    )
    got_rate, got_ch, got_frames, got_ms = decode_wav(data)
    assert (got_rate, got_ch, got_frames) == (rate, channels, n_frames)
    assert got_ms == (n_frames * 1000) // rate


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=8192),
    h=st.integers(min_value=1, max_value=8192),
    n=st.integers(min_value=0, max_value=10**6),
    usec=st.integers(min_value=1, max_value=10**6),
)
def test_avi_roundtrip_any_header(w, h, n, usec):
    assert decode_avi(_encode_avi(w, h, n, usec)) == (w, h, n, (n * usec) // 1000)


# ------------------------------------------------ adversarial noise ----

_noise = st.binary(min_size=0, max_size=512)


@settings(max_examples=120, deadline=None)
@given(data=_noise)
def test_png_noise_never_escapes_error_contract(data):
    # prefix with the magic so the chunk walker actually runs
    try:
        decode_png(b"\x89PNG\r\n\x1a\n" + data)
    except (ValueError, NotImplementedError):
        pass  # the documented contract


@settings(max_examples=120, deadline=None)
@given(data=_noise)
def test_wav_noise_never_escapes_error_contract(data):
    try:
        decode_wav(b"RIFF" + data[:4] + b"WAVE" + data[4:])
    except (ValueError, NotImplementedError):
        pass


@settings(max_examples=120, deadline=None)
@given(data=_noise)
def test_avi_noise_never_escapes_error_contract(data):
    try:
        decode_avi(b"RIFF" + data[:4] + b"AVI " + data[4:])
    except (ValueError, NotImplementedError):
        pass


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=2**20),
    h=st.integers(min_value=1, max_value=2**20),
    payload_kb=st.integers(min_value=1, max_value=64),
)
def test_png_inflate_bound_holds_for_any_claimed_geometry(w, h, payload_kb):
    # an IDAT that inflates to far more than ANY claimed geometry allows
    # must raise without materializing the full expansion
    import struct
    import zlib

    from tests.test_multimodal_decode import _chunk

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    bomb = zlib.compress(bytes(payload_kb * 1024 * 1024), 9)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", bomb)
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(data)


@settings(max_examples=300, deadline=None)
@given(
    hv=st.integers(min_value=0, max_value=2**64 - 1),
    flips=st.sets(st.integers(min_value=0, max_value=63), max_size=7),
)
def test_phash_banding_pigeonhole_has_zero_false_negatives(hv, flips):
    """The r15 phash rewrite's correctness hinge: with 8 bands of 8
    bits, ANY pair of 64-bit hashes within Hamming distance <= 7 MUST
    agree on at least one band — flipping at most 7 bits cannot touch
    all 8 disjoint bytes.  This is the property that lets the banded
    equi-join replace the all-pairs compare with zero recall loss.
    The band extraction mirrors the query's expression
    (shiftright(hv, (8-b)*8) & 255 on the two's-complement BIGINT)."""
    other = hv
    for bit in flips:
        other ^= 1 << bit

    def signed(v):  # the BIGINT the Spark column carries
        return v - (1 << 64) if v >= 1 << 63 else v

    def bands(v):
        s = signed(v)
        # arithmetic shift on negatives, & 255 strips the sign fill —
        # byte-for-byte what the registered query computes
        return [(s >> (8 - b) * 8) & 255 for b in range(1, 9)]

    assert bin(hv ^ other).count("1") <= 7
    assert any(a == b for a, b in zip(bands(hv), bands(other))), (
        f"hamming-{bin(hv ^ other).count('1')} pair shares no band: "
        f"{hv:#x} vs {other:#x}"
    )
    # and the Hamming verify the join applies is exact popcount
    assert bin(hv ^ other).count("1") == len(flips)


@settings(max_examples=100, deadline=None)
@given(
    hv=st.integers(min_value=0, max_value=2**64 - 1),
    flips=st.sets(st.integers(min_value=0, max_value=63), min_size=8, max_size=8),
)
def test_phash_banding_eight_flips_can_escape(hv, flips):
    """The guarantee is TIGHT: 8 flips, one per band, share no band —
    pinning that the threshold 7 is the maximum the 8-band scheme
    supports (a silent threshold bump without a band change would be a
    recall bug the pigeonhole test above cannot see)."""
    if sorted(b // 8 for b in flips) != list(range(8)):
        return  # only the one-flip-per-band worst case demonstrates escape
    other = hv
    for bit in flips:
        other ^= 1 << bit

    def bands(v):
        return [(v >> (8 - b) * 8) & 0xFF for b in range(1, 9)]

    assert all(a != b for a, b in zip(bands(hv), bands(other)))
