"""Full-size demosaic stencil vs the scalar oracle, for Bayer and X-Trans."""

import numpy as np
import jax.numpy as jnp

from imagepipe_tpu.buffer import OpBuffer
from imagepipe_tpu.kernels.demosaic_full import demosaic_full, neighbor_color_lookup
from imagepipe_tpu.raw import CFA

import oracle

XTRANS = "GBGGRG" "RGRBGB" "GBGGRG" "GRGGBG" "BGBRGR" "GRGGBG"


def test_lookup_matches_oracle():
    for name in ["RGGB", "GRBG", "BGGR", "GBRG", XTRANS]:
        cfa = CFA(name)
        lut = neighbor_color_lookup(cfa)
        # Re-derive with the oracle's inline loop.
        got = oracle.demosaic_full(cfa, np.zeros((4, 4), np.float32), 4, 4)
        assert lut.shape == (48, 48, 9)
        # Center offset keeps own color.
        for row in range(8):
            for col in range(8):
                assert lut[row, col, 4] == cfa.color_at(row, col)


def test_demosaic_full_bayer_matches_oracle():
    rng = np.random.default_rng(0)
    for name in ["RGGB", "GRBG", "BGGR", "GBRG"]:
        cfa = CFA(name)
        h, w = 22, 30
        plane = rng.random((h, w), dtype=np.float32)
        buf = OpBuffer(w, h, 1, False, jnp.asarray(plane[None]))
        got = demosaic_full(cfa, buf).to_hwc()
        want = oracle.demosaic_full(cfa, plane, w, h)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_demosaic_full_xtrans_matches_oracle():
    rng = np.random.default_rng(1)
    cfa = CFA(XTRANS)
    h, w = 24, 36
    plane = rng.random((h, w), dtype=np.float32)
    buf = OpBuffer(w, h, 1, False, jnp.asarray(plane[None]))
    got = demosaic_full(cfa, buf).to_hwc()
    want = oracle.demosaic_full(cfa, plane, w, h)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_demosaic_constant_plane_is_constant():
    """A uniform sensor plane demosaics to a uniform image in channels the
    CFA contains (interpolation must not invent structure)."""
    cfa = CFA("RGGB")
    h = w = 16
    buf = OpBuffer(w, h, 1, False, jnp.full((1, h, w), 0.5, jnp.float32))
    out = demosaic_full(cfa, buf).to_hwc()
    for c in range(3):
        np.testing.assert_allclose(out[..., c], 0.5, atol=1e-7)
    np.testing.assert_allclose(out[..., 3], 0.0, atol=0)  # no E plane in RGGB
