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


def test_demosaic_8x2_cfa_matches_oracle():
    """Canon Pro70-style 8x2 CFA (demosaic.rs:36): generic stencil must
    handle the 16-char pattern."""
    name = "RGBERGBE" "GBERGBER"  # 8 wide, 2 tall, all four colors
    cfa = CFA(name)
    assert (cfa.width, cfa.height) == (8, 2)
    rng = np.random.default_rng(2)
    h, w = 16, 32
    plane = rng.random((h, w), dtype=np.float32)
    buf = OpBuffer(w, h, 1, False, jnp.asarray(plane[None]))
    got = demosaic_full(cfa, buf).to_hwc()
    want = oracle.demosaic_full(cfa, plane, w, h)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_demosaic_minscale_dispatch():
    """Path selection thresholds per CFA period width (demosaic.rs:33-39)."""
    from imagepipe_tpu.ops.demosaic import OpDemosaic
    from imagepipe_tpu.pipeline import Pipeline, PipelineGlobals, PipelineSettings
    from imagepipe_tpu.sources import ImageSource
    from imagepipe_tpu.raw import synthetic_bayer, synthetic_xtrans

    # Bayer at scale 2 -> fused scaled demosaic (output 4ch at target size);
    # X-Trans at scale 2 (< minscale 3) -> full demosaic then downscale.
    for make, scale_is_fused in ((synthetic_bayer, True), (synthetic_xtrans, False)):
        raw = make(96, 96)
        src = ImageSource.from_raw(raw)
        p = Pipeline.new_from_source(src)
        p.globals.settings.maxwidth = 48
        p.globals.settings.use_fastpath = False
        out = p.output_8bit(None)
        assert (out.width, out.height) == (48, 48)
