"""Resampler and size-planning tests.

Device kernels are cross-checked against the scalar oracle (tests/oracle.py)
on small images; size math mirrors scaling.rs:8-32 and its no-op test
(scaling.rs:184-204).
"""

import numpy as np
import jax.numpy as jnp

from imagepipe_tpu import scaling
from imagepipe_tpu.buffer import OpBuffer
from imagepipe_tpu.raw import CFA

import oracle


def test_scaling_size_basics():
    assert scaling.scaling_size(128, 64, 0, 0) == (128, 64)
    assert scaling.scaling_size(128, 64, 256, 0) == (128, 64)  # no upscale
    assert scaling.scaling_size(128, 64, 64, 0) == (64, 32)
    assert scaling.scaling_size(128, 64, 0, 32) == (64, 32)
    assert scaling.scaling_size(4000, 6000, 1000, 1000) == (666, 1000)


def test_scaling_noop_identity():
    # scaling.rs:188-203: same-size scale is the identity (u16 path).
    w = h = 150
    data = np.arange(w * h * 3, dtype=np.uint16).reshape(h, w, 3) % 65535
    out = np.asarray(scaling.scale_down_srgb16(data, w, h))
    np.testing.assert_array_equal(out, data)


def _rand_buf(rng, w, h, c):
    data = rng.random((h, w, c), dtype=np.float32)
    return OpBuffer.from_hwc(data), data


def test_scale_down_matches_oracle():
    rng = np.random.default_rng(42)
    for (w, h, nw, nh) in [(64, 48, 31, 23), (64, 48, 64, 48), (33, 57, 8, 14), (40, 40, 39, 40)]:
        buf, data = _rand_buf(rng, w, h, 4)
        got = scaling.scale_down_opbuf(buf, nw, nh).to_hwc()
        want = oracle.transform_buffer(
            data.ravel(), w, h, (0, 0), (w - 1, 0), (0, h - 1), nw, nh, 4
        ).reshape(nh, nw, 4)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_scaled_demosaic_matches_oracle():
    rng = np.random.default_rng(7)
    for cfa_name in ["RGGB", "GBGGRGRGRBGBGBGGRGRGRBGBGBGGRGGRGGBG"]:
        cfa = CFA(cfa_name)
        w, h, nw, nh = 48, 36, 12, 9
        plane = rng.random((h, w), dtype=np.float32)
        buf = OpBuffer(w, h, 1, False, jnp.asarray(plane[None]))
        got = scaling.scaled_demosaic(cfa, buf, nw, nh).to_hwc()
        want = oracle.transform_buffer(
            plane.ravel(), w, h, (0, 0), (w - 1, 0), (0, h - 1), nw, nh, 4, cfa
        ).reshape(nh, nw, 4)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_affine_transform_matches_oracle():
    """Rotated-corner resampling (the rotatecrop path) against the oracle."""
    rng = np.random.default_rng(3)
    w, h = 50, 40
    buf, data = _rand_buf(rng, w, h, 3)
    # Corner triple for a mild rotation, as rotate_point_reverse would give.
    topleft, topright, bottomleft = (5, 2), (44, 12), (-3, 33)
    nw, nh = 37, 29
    got = np.asarray(scaling.transform_buffer(
        jnp.asarray(data), w, h, topleft, topright, bottomleft, nw, nh, 3))
    want = oracle.transform_buffer(
        data.ravel(), w, h, topleft, topright, bottomleft, nw, nh, 3
    ).reshape(nh, nw, 3)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_srgb8_downscale_matches_oracle_quantized():
    rng = np.random.default_rng(9)
    w, h, nw, nh = 64, 48, 20, 15
    data = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    got = np.asarray(scaling.scale_down_srgb(data, nw, nh))
    want_f = oracle.transform_buffer(
        data.astype(np.float32).ravel(), w, h, (0, 0), (w - 1, 0), (0, h - 1), nw, nh, 3
    ).reshape(nh, nw, 3)
    want = np.clip(np.trunc(want_f), 0, 255).astype(np.uint8)
    # f32 summation-order differences may move a value across the truncation
    # edge; allow 1 LSB there.
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
    assert (got != want).mean() < 0.02


def test_banded_selection_bitexact_vs_global():
    """The block-banded column selection (near-full-size resizes: static
    per-output-block source bands -> block-local one-hot dots) must be
    BIT-equal to the global one-hot form: both select the same values by
    0/1 matmuls and added zeros are exact in f32. Covers downscale,
    near-unit scale, a crop region, and CFA mode; forces both forms via
    the `banded` static so the auto heuristic can't dodge the comparison."""
    rng = np.random.default_rng(11)
    cases = [
        # (w, h, nw, nh, cfa_name)
        (512, 40, 384, 30, None),     # near-unit downscale (fulldown shape)
        (640, 32, 160, 24, None),     # 4x downscale
        (520, 36, 500, 30, None),     # ~1.0x
        (512, 40, 384, 30, "RGGB"),   # CFA fused demosaic-downscale
    ]
    for (w, h, nw, nh, cfa_name) in cases:
        C = 1 if cfa_name else 4
        src = jnp.asarray(rng.random((C, h, w), dtype=np.float32))
        cfa_tile, cfa_key = scaling._cfa_args(
            CFA(cfa_name) if cfa_name else None)
        kw = dict(width=w, height=h, topleft=(0, 0), topright=(w - 1, 0),
                  bottomleft=(0, h - 1), nwidth=nw, nheight=nh,
                  components=4, cfa_key=cfa_key, out_dtype=jnp.float32,
                  planar=True)
        got_banded = scaling._transform_aligned_impl(
            src, cfa_tile, banded=True, **kw)
        got_global = scaling._transform_aligned_impl(
            src, cfa_tile, banded=False, **kw)
        np.testing.assert_array_equal(
            np.asarray(got_banded), np.asarray(got_global),
            err_msg=f"banded != global for {(w, h, nw, nh, cfa_name)}")


def test_banded_selection_crop_region_bitexact():
    """Crop geometry (topleft != origin): bands sit inside the source and
    the padded tail never contributes."""
    rng = np.random.default_rng(13)
    w, h, nw, nh = 600, 30, 320, 20
    src = jnp.asarray(rng.random((4, h, w), dtype=np.float32))
    cfa_tile, cfa_key = scaling._cfa_args(None)
    kw = dict(width=w, height=h, topleft=(100, 4), topright=(420, 4),
              bottomleft=(100, 27), nwidth=nw, nheight=nh,
              components=4, cfa_key=cfa_key, out_dtype=jnp.float32,
              planar=True)
    a = scaling._transform_aligned_impl(src, cfa_tile, banded=True, **kw)
    b = scaling._transform_aligned_impl(src, cfa_tile, banded=False, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unrolled_window_cross_graph_contract():
    """Static (ky,kx) unroll preserves the accumulation order in source, but
    XLA's cross-iteration fusion moves FMA placement (CLAUDE.md trap), so the
    contract vs the fori form is the documented cross-graph one: f32 within
    tight rtol, and <=1 LSB with a small flip fraction after 8-bit quantize.
    Both selection modes (banded/global) are exercised."""
    rng = np.random.default_rng(17)
    w, h, nw, nh = 512, 40, 384, 30
    src = jnp.asarray(rng.random((4, h, w), dtype=np.float32))
    cfa_tile, cfa_key = scaling._cfa_args(None)
    kw = dict(width=w, height=h, topleft=(0, 0), topright=(w - 1, 0),
              bottomleft=(0, h - 1), nwidth=nw, nheight=nh,
              components=4, cfa_key=cfa_key, out_dtype=jnp.float32,
              planar=True)
    for banded in (True, False):
        a = np.asarray(scaling._transform_aligned_impl(
            src, cfa_tile, banded=banded, unroll=True, **kw))
        b = np.asarray(scaling._transform_aligned_impl(
            src, cfa_tile, banded=banded, unroll=False, **kw))
        np.testing.assert_allclose(a, b, rtol=2e-6, atol=2e-6,
                                   err_msg=f"banded={banded}")
        qa = np.clip(a * 255.0 + 0.5, 0, 255).astype(np.int32)
        qb = np.clip(b * 255.0 + 0.5, 0, 255).astype(np.int32)
        diff = np.abs(qa - qb)
        assert diff.max() <= 1, f"banded={banded}"
        assert (diff != 0).mean() < 0.02, f"banded={banded}"


def test_unrolled_window_cfa_mode_cross_graph_contract():
    """Unroll in CFA mode (the scaled-demosaic route): same cross-graph
    contract as the 4-channel case — tight f32 agreement, <=1 LSB with a
    small flip fraction after 8-bit quantize."""
    rng = np.random.default_rng(23)
    w, h, nw, nh = 96, 72, 24, 18
    plane = jnp.asarray(rng.random((1, h, w), dtype=np.float32))
    cfa_tile, cfa_key = scaling._cfa_args(CFA("RGGB"))
    kw = dict(width=w, height=h, topleft=(0, 0), topright=(w - 1, 0),
              bottomleft=(0, h - 1), nwidth=nw, nheight=nh,
              components=4, cfa_key=cfa_key, out_dtype=jnp.float32,
              planar=True)
    a = np.asarray(scaling._transform_aligned_impl(
        plane, cfa_tile, unroll=True, **kw))
    b = np.asarray(scaling._transform_aligned_impl(
        plane, cfa_tile, unroll=False, **kw))
    np.testing.assert_allclose(a, b, rtol=2e-6, atol=2e-6)
    qa = np.clip(a * 255.0 + 0.5, 0, 255).astype(np.int32)
    qb = np.clip(b * 255.0 + 0.5, 0, 255).astype(np.int32)
    diff = np.abs(qa - qb)
    assert diff.max() <= 1
    assert (diff != 0).mean() < 0.02
