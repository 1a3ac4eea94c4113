"""Fuji lossless-compressed codec (imagepipe_tpu/fujic.py).

Strategy mirrors the other vendor codecs: the canonical encoder walks
the identical pass/line structure as the decoder, so round-trips pin
every mechanism (gradient contexts, adaptive mantissa widths, the
escape, residual wrap-around, X-Trans interpolation positions, stripe
splits, band carry). Container integration lives in test_raf.py; the
real-file harness (test_realfiles.py) is the external fidelity check.
The reference reaches this codec through rawloader
(/root/reference/src/pipeline.rs:264)."""

import numpy as np
import pytest

from imagepipe_tpu import native
from imagepipe_tpu.fujic import (FujiHeader, _bit_diff, _decode_python,
                                 decode_fuji, encode_fuji)

_HAVE_NATIVE = native.have_native() and hasattr(native._lib, "fuji_decode")


def _roundtrip(img, **kw):
    blob, snapped = encode_fuji(img, **kw)
    out, hdr = decode_fuji(blob)
    np.testing.assert_array_equal(out[: img.shape[0]], snapped)
    return blob, snapped


def _smooth(h, w, seed=0, lo=1100, amp=16):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    return (lo + (yy * 37 + xx * 11) % 9000
            + rng.integers(0, amp, (h, w))).astype(np.uint16)


def test_bit_diff_reference_semantics():
    # Smallest d with (v2 << d) >= v1, via the reference's pre-increment
    # loop (returns 13 when even 12 shifts cannot reach).
    assert _bit_diff(256, 1) == 8
    assert _bit_diff(257, 1) == 9
    assert _bit_diff(2, 1) == 1
    assert _bit_diff(1, 1) == 0
    assert _bit_diff(0, 5) == 0
    assert _bit_diff(1 << 20, 1) == 13  # capped


def test_header_roundtrip_and_validation():
    h = FujiHeader(16, 14, 36, 48, 48, 48, 1, 6)
    h2 = FujiHeader.parse(h.pack())
    assert (h2.raw_type, h2.raw_bits, h2.raw_height, h2.raw_width,
            h2.block_size, h2.blocks_in_row, h2.total_lines) == \
        (16, 14, 36, 48, 48, 1, 6)
    with pytest.raises(ValueError, match="signature"):
        FujiHeader.parse(b"\0" * 16)
    bad = bytearray(h.pack())
    bad[3] = 7  # unknown raw type
    with pytest.raises(ValueError, match="raw type"):
        FujiHeader.parse(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        FujiHeader.parse(b"\x49\x53")


@pytest.mark.parametrize("bits", [12, 14])
def test_xtrans_roundtrip_smooth(bits):
    img = _smooth(18, 24, seed=bits, lo=300,
                  amp=8) % ((1 << bits) - 1)
    _roundtrip(img.astype(np.uint16), raw_type=16, raw_bits=bits)


def test_xtrans_roundtrip_rough_random():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 1 << 14, (24, 30), dtype=np.uint16)
    blob, snapped = _roundtrip(img, raw_type=16, raw_bits=14,
                               block_size=15)
    # Only interpolated X-Trans positions may snap.
    diff = (snapped != img).sum()
    assert diff < img.size // 8


def test_xtrans_extremes_wrap():
    # Alternating extremes force wrap-around residuals and escapes.
    img = np.zeros((12, 18), np.uint16)
    img[::2, ::2] = (1 << 14) - 1
    img[1::2, 1::2] = 3
    _roundtrip(img, raw_type=16, raw_bits=14)


def test_bayer_roundtrip():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 1 << 14, (18, 40), dtype=np.uint16)
    blob, snapped = _roundtrip(img, raw_type=0, raw_bits=14,
                               block_size=20)
    # Bayer has no interpolated positions: nothing snaps.
    np.testing.assert_array_equal(snapped, img)


def test_bayer_16bit_roundtrip():
    # The GFX-class 16-bit stream flavor: total_values 65536, escapes
    # read 16 raw bits, values span the full u16 range.
    rng = np.random.default_rng(3)
    img = rng.integers(0, 1 << 16, (12, 20), dtype=np.uint16)
    blob, snapped = _roundtrip(img, raw_type=0, raw_bits=16)
    np.testing.assert_array_equal(snapped, img)


def test_multi_stripe_and_partial_band():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 1 << 14, (15, 45), dtype=np.uint16)
    blob, snapped = _roundtrip(img, raw_type=16, raw_bits=14,
                               block_size=18)
    hdr = FujiHeader.parse(blob)
    assert hdr.blocks_in_row == 3 and hdr.total_lines == 3


def test_gradient_adaptation_compresses_smooth_data():
    # The adaptive mantissa must make smooth data much smaller than the
    # raw plane (this is what the format exists for).
    rng = np.random.default_rng(4)
    yy, xx = np.mgrid[0:72, 0:96]
    img = (1100 + yy * 13 + xx * 7
           + rng.integers(0, 16, (72, 96))).astype(np.uint16)
    blob, _ = encode_fuji(img, raw_type=16, raw_bits=14)
    # Large enough to amortize the warmup of the 41 gradient contexts
    # (they start at maxDiff and adapt toward the data's statistics).
    assert len(blob) < img.size * 2 * 0.6


def test_truncated_and_garbage_raise():
    img = _smooth(12, 18, seed=5)
    blob, _ = encode_fuji(img, raw_type=16, raw_bits=14)
    for cut in (4, 17, len(blob) // 2, len(blob) - 2):
        with pytest.raises(ValueError):
            decode_fuji(blob[:cut])
    with pytest.raises(ValueError, match="too narrow"):
        encode_fuji(img[:, :9], raw_type=16, raw_bits=14)


@pytest.mark.skipif(not _HAVE_NATIVE, reason="native library not built")
def test_native_matches_python_differential():
    rng = np.random.default_rng(9)
    for trial in range(6):
        h = int(rng.integers(7, 26))
        xt = trial % 2 == 0
        w = (3 if xt else 2) * int(rng.integers(10, 16))
        bits = int(rng.choice([12, 14]))
        img = rng.integers(0, 1 << bits, (h, w), dtype=np.uint16)
        blob, snapped = encode_fuji(img, raw_type=16 if xt else 0,
                                    raw_bits=bits)
        a, _ = _decode_python(blob)
        b, _ = decode_fuji(blob)
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a[:h], snapped)


def test_byte_fuzz_never_crashes_and_decoders_agree():
    rng = np.random.default_rng(6)
    img = _smooth(12, 18, seed=7)
    blob, _ = encode_fuji(img, raw_type=16, raw_bits=14)
    for _ in range(30):
        b = bytearray(blob)
        for _ in range(int(rng.integers(1, 4))):
            b[int(rng.integers(16, len(b)))] = int(rng.integers(0, 256))
        try:
            py = _decode_python(bytes(b))[0]
        except ValueError:
            py = None
        if _HAVE_NATIVE:
            try:
                nat = decode_fuji(bytes(b))[0]
            except ValueError:
                nat = None
            assert (py is None) == (nat is None)
            if py is not None:
                np.testing.assert_array_equal(py, nat)


def test_band_carry_across_bands():
    # Vertically-correlated data exercises the R3/R4 -> R0/R1 carry: a
    # column gradient must round-trip across many bands.
    yy = np.arange(36)[:, None]
    img = (800 + yy * 113 % 6000 + np.zeros((1, 24), int)).astype(np.uint16)
    _roundtrip(img, raw_type=16, raw_bits=14)
