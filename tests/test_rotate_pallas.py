"""Rotated-resampler Pallas kernel tests (interpret mode on the CPU mesh).

The kernel must agree with the gather implementation (same device
semantics) essentially bit-for-bit, and with the scalar oracle within the
established device-vs-oracle envelope: at near-45-degree angles the
reference's corner-pair windows degenerate (to-from = cos-sin -> 0), so
weight sums approach zero and ULP differences amplify through sums/counts --
both device paths share that envelope (see scaling.rs:84-107 semantics).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from imagepipe_tpu import scaling
from imagepipe_tpu.buffer import OpBuffer
from imagepipe_tpu.kernels import rotate_pallas as rp
from imagepipe_tpu.ops.rotatecrop import OpRotateCrop

import oracle

f32 = np.float32


def _corners(theta_deg, w, h, nw, nh, scale=1.0):
    """Inverse-map corner triple like OpRotateCrop._rotate_point_reverse."""
    a = np.deg2rad(theta_deg)
    s, c = np.sin(a), np.cos(a)

    def rot(x, y):
        tx, ty = x - nw / 2, y - nh / 2
        return (int(f32((tx * c + ty * s) * scale + w / 2)),
                int(f32((-tx * s + ty * c) * scale + h / 2)))

    return rot(0, 0), rot(nw - 1, 0), rot(0, nh - 1)


def _run_pallas(data, w, h, tl, tr, bl, nw, nh, C):
    plan = rp.rotate_plan(w, h, tl, tr, bl, nw, nh, C)
    assert plan is not None
    src = jnp.moveaxis(jnp.asarray(data), -1, 0)
    out = rp.rotate_resample_planar(src, w, h, tl, tr, bl, nw, nh, C,
                                    interpret=True, plan=plan)
    return np.moveaxis(np.asarray(out), 0, -1)


def _run_gather(data, w, h, tl, tr, bl, nw, nh, C):
    return np.asarray(scaling._transform_impl(
        jnp.asarray(data), jnp.zeros((48, 48), jnp.uint8), width=w, height=h,
        topleft=tl, topright=tr, bottomleft=bl, nwidth=nw, nheight=nh,
        components=C, cfa_key=None, out_dtype=jnp.float32))


CASES = [
    # (theta, w, h, nw, nh, scale, C)
    (4, 150, 120, 140, 110, 1.0, 4),
    (27, 160, 140, 150, 130, 1.0, 3),
    (45, 130, 130, 180, 180, 1.0, 4),     # degenerate windows, half-empty
    (45, 140, 100, 150, 110, 1.4, 4),
    (75, 120, 120, 110, 110, 1.0, 1),     # mostly-empty windows
    (12, 200, 90, 90, 40, 2.2, 4),        # rotation + downscale
]


@pytest.mark.parametrize("theta,w,h,nw,nh,sc,C", CASES)
def test_rotate_pallas_matches_gather_impl(theta, w, h, nw, nh, sc, C):
    """Same device semantics as the gather loop: ULP-level agreement."""
    rng = np.random.default_rng(theta * 7 + C)
    tl, tr, bl = _corners(theta, w, h, nw, nh, sc)
    data = rng.random((h, w, C), dtype=np.float32)
    pal = _run_pallas(data, w, h, tl, tr, bl, nw, nh, C)
    gat = _run_gather(data, w, h, tl, tr, bl, nw, nh, C)
    np.testing.assert_allclose(pal, gat, rtol=0, atol=2e-6)


@pytest.mark.parametrize("theta,w,h,nw,nh,sc,C", CASES)
def test_rotate_pallas_matches_oracle(theta, w, h, nw, nh, sc, C):
    rng = np.random.default_rng(theta * 13 + C)
    tl, tr, bl = _corners(theta, w, h, nw, nh, sc)
    data = rng.random((h, w, C), dtype=np.float32)
    pal = _run_pallas(data, w, h, tl, tr, bl, nw, nh, C)
    want = oracle.transform_buffer(
        data.ravel(), w, h, tl, tr, bl, nw, nh, C).reshape(nh, nw, C)
    diff = np.abs(pal - want)
    # Healthy-window pixels agree to 1e-4; degenerate near-empty windows
    # amplify ULPs through sums/counts (the gather impl deviates identically).
    assert (diff > 1e-4).mean() < 0.005
    assert diff.max() < 5e-3


def test_rotatecrop_op_pallas_vs_gather_quantized():
    """The full op through both executors: quantized outputs within 1 LSB."""
    rng = np.random.default_rng(99)
    w, h = 220, 170
    buf = OpBuffer.from_hwc(rng.random((h, w, 4), dtype=np.float32))

    def run():
        op = OpRotateCrop.empty()
        op.rotation = 0.21
        op.crop_left = 0.04
        op.crop_top = 0.02
        out = op.run(None, buf)
        return np.clip(np.trunc(np.asarray(out.to_hwc()) * 256.0), 0, 255
                       ).astype(np.uint8), (out.width, out.height)

    old = scaling.USE_ROTATE_PALLAS
    try:
        scaling.USE_ROTATE_PALLAS = True
        got_p, size_p = run()
        scaling.USE_ROTATE_PALLAS = False
        got_g, size_g = run()
    finally:
        scaling.USE_ROTATE_PALLAS = old
    assert size_p == size_g
    assert np.abs(got_p.astype(int) - got_g.astype(int)).max() <= 1
    assert (got_p != got_g).mean() < 0.01


def test_affine_gather_impl_matches_oracle():
    """Keeps direct oracle coverage of the gather fallback now that the
    public entry routes rotations to the Pallas kernel."""
    rng = np.random.default_rng(3)
    w, h = 50, 40
    data = rng.random((h, w, 3), dtype=np.float32)
    tl, tr, bl = (5, 2), (44, 12), (-3, 33)
    nw, nh = 37, 29
    got = _run_gather(data, w, h, tl, tr, bl, nw, nh, 3)
    want = oracle.transform_buffer(
        data.ravel(), w, h, tl, tr, bl, nw, nh, 3).reshape(nh, nw, 3)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_rotate_plan_fallbacks():
    # Degenerate output extents.
    assert rp.rotate_plan(100, 100, (0, 0), (99, 10), (-10, 99), 1, 50, 4) is None
    assert rp.rotate_plan(100, 100, (0, 0), (99, 10), (-10, 99), 50, 1, 4) is None
    # Zero x-step (vertical degenerate geometry).
    assert rp.rotate_plan(100, 100, (5, 0), (5, 40), (0, 99), 50, 50, 4) is None
    # K_y beyond the static unroll bound (huge scale rotation).
    tl, tr, bl = _corners(30, 4000, 4000, 100, 100, 30.0)
    assert rp.rotate_plan(4000, 4000, tl, tr, bl, 100, 100, 4) is None
    # The public entry still renders those via the gather loop.
    rng = np.random.default_rng(1)
    data = rng.random((100, 100, 4), dtype=np.float32)
    out = scaling.transform_buffer(
        jnp.asarray(data), 100, 100, (5, 0), (5, 40), (0, 99), 50, 50, 4)
    assert out.shape == (50, 50, 4)


def test_rotate_pallas_random_geometry_sweep():
    """Randomized corner triples (arbitrary affine, including shears,
    mirrored axes, and out-of-bounds corners) through the public entry:
    the Pallas path must agree with the gather loop at the ULP level on
    every supported geometry."""
    rng = np.random.default_rng(77)
    ran = 0
    for trial in range(24):
        w, h = int(rng.integers(70, 300)), int(rng.integers(70, 300))
        nw, nh = int(rng.integers(66, 280)), int(rng.integers(66, 280))
        tl = (int(rng.integers(-60, w + 60)), int(rng.integers(-60, h + 60)))
        tr = (tl[0] + int(rng.integers(-w, w)), tl[1] + int(rng.integers(-h, h)))
        bl = (tl[0] + int(rng.integers(-w, w)), tl[1] + int(rng.integers(-h, h)))
        if rp.rotate_plan(w, h, tl, tr, bl, nw, nh, 3) is None:
            continue
        ran += 1
        data = rng.random((h, w, 3), dtype=np.float32)
        pal = _run_pallas(data, w, h, tl, tr, bl, nw, nh, 3)
        gat = _run_gather(data, w, h, tl, tr, bl, nw, nh, 3)
        diff = np.abs(pal - gat)
        msg = f"trial {trial} {tl} {tr} {bl}"
        # ULP-level agreement for the bulk; near-zero-weight pixels amplify
        # ULPs through sums/counts (shared with the oracle envelope).
        assert (diff > 2e-6).mean() < 1e-4, msg
        assert diff.max() < 1e-3, msg
    assert ran >= 10


def test_rotate_tile_empty_check_is_conservative():
    """Host replication of the kernel's empty-tile early-out over random
    geometries: whenever the tile-level test (max(to) < min(from), built
    from the SMEM aggregates and f32 column-edge terms) fires, EVERY pixel
    in that tile must have an empty sample window on that axis -- the
    regression that motivated this used skip*c instead of skip*(c+1) for
    the 'to' terms and zeroed real pixels."""
    rng = np.random.default_rng(5)
    TH = rp.TH
    checked = flagged = 0
    for trial in range(60):
        w, h = int(rng.integers(80, 400)), int(rng.integers(80, 400))
        nw, nh = int(rng.integers(65, 300)), int(rng.integers(65, 300))
        tl = (int(rng.integers(-80, w + 80)), int(rng.integers(-80, h + 80)))
        tr = (tl[0] + int(rng.integers(-w, w)), tl[1] + int(rng.integers(-h, h)))
        bl = (tl[0] + int(rng.integers(-w, w)), tl[1] + int(rng.integers(-h, h)))
        plan = rp.rotate_plan(w, h, tl, tr, bl, nw, nh, 4)
        if plan is None:
            continue
        checked += 1
        statics, coltab, rowtab, aggtab = plan
        ntr, ntc = statics["ntr"], statics["ntc"]
        TC = statics["tc"]     # angle-adaptive tile width
        if coltab.ndim == 3:   # sub-128 tile-major layout -> flat [6, nw_pad]
            coltab = coltab.swapaxes(0, 1).reshape(6, -1)
        sxx, sxy = f32(aggtab[0, 2]), f32(aggtab[0, 3])  # params row

        def sat(v, maxv):
            v = np.floor(np.float32(v))
            if np.isnan(v) or v < 0:
                v = 0.0
            return min(int(v), maxv)

        rows = np.arange(nh)
        cols = np.arange(nw)
        # rowtab is the lane-replicated [6, nh_pad, TC] VMEM table; every
        # lane holds the same per-row term, so lane 0 is the scalar.
        fy = rowtab[0, rows, 0][:, None] + coltab[2][None, :nw]
        ty = rowtab[1, rows, 0][:, None] + coltab[3][None, :nw]
        fx = rowtab[2, rows, 0][:, None] + coltab[0][None, :nw]
        tx = rowtab[3, rows, 0][:, None] + coltab[1][None, :nw]
        satv = lambda a, m: np.clip(np.nan_to_num(np.floor(a), nan=0.0),
                                    0, m).astype(int)
        from_y, to_y = satv(fy, h - 1), satv(ty, h - 1)
        from_x, to_x = satv(fx, w - 1), satv(tx, w - 1)
        empty_px = (to_y < from_y) | (to_x < from_x)

        for ti in range(ntr):
            for tj in range(ntc):
                c_lo, c_hi = tj * TC, min(tj * TC + TC - 1, nw - 1)
                fyc_min = min(f32(sxy * f32(c_lo)), f32(sxy * f32(c_hi)))
                tyc_max = max(f32(sxy * f32(c_lo + 1)), f32(sxy * f32(c_hi + 1)))
                fxc_min = min(f32(sxx * f32(c_lo)), f32(sxx * f32(c_hi)))
                txc_max = max(f32(sxx * f32(c_lo + 1)), f32(sxx * f32(c_hi + 1)))
                ymin = sat(f32(aggtab[1 + ti, 0] + fyc_min), h - 1)
                tymax = sat(f32(aggtab[1 + ti, 1] + tyc_max), h - 1)
                xmin = sat(f32(aggtab[1 + ti, 2] + fxc_min), w - 1)
                txmax = sat(f32(aggtab[1 + ti, 3] + txc_max), w - 1)
                if not ((tymax < ymin) or (txmax < xmin)):
                    continue
                flagged += 1
                r0, r1 = ti * TH, min(ti * TH + TH, nh)
                c1 = min(tj * TC + TC, nw)
                tile = empty_px[r0:r1, c_lo:c1]
                assert tile.all(), (
                    f"trial {trial}: tile ({ti},{tj}) flagged empty but "
                    f"{(~tile).sum()} pixels have non-empty windows")
    assert checked >= 20  # the sweep must exercise real geometries


def test_rotate_plan_statics_stable_across_nearby_angles():
    """The jit signature holds geometry only as bucketed shapes; nearby
    slider angles must share one compiled kernel (the skips live in the
    runtime SMEM params table)."""
    w, h, nw, nh = 1200, 900, 1150, 860
    plans = []
    for theta in (16.0, 17.5, 19.0):
        tl, tr, bl = _corners(theta, w, h, nw, nh)
        plan = rp.rotate_plan(w, h, tl, tr, bl, nw, nh, 4)
        assert plan is not None
        plans.append(plan[0])
    assert plans[0] == plans[1] == plans[2]


def test_rotate_pallas_planar_entry():
    """transform_buffer_planar routes rotations through the kernel and
    matches the HWC gather path."""
    rng = np.random.default_rng(17)
    w, h = 150, 120
    nw, nh = 140, 110
    tl, tr, bl = _corners(18, w, h, nw, nh)
    data = rng.random((h, w, 4), dtype=np.float32)
    out = np.asarray(scaling.transform_buffer_planar(
        jnp.moveaxis(jnp.asarray(data), -1, 0), w, h, tl, tr, bl, nw, nh, 4))
    gat = _run_gather(data, w, h, tl, tr, bl, nw, nh, 4)
    np.testing.assert_allclose(np.moveaxis(out, 0, -1), gat, rtol=0, atol=2e-6)


@pytest.mark.parametrize("tc", [32, 64])
def test_rotate_pallas_narrow_tiles_match_gather(tc):
    """Forced narrow tile widths keep ULP-level agreement with the
    gather loop — the tile-major sub-128 layout path. 64 is the
    steep-angle cost-model candidate; 32 is tc_force-only (hardware
    measured it 24%+ slower than 64 at 45°, BASELINE.md r4 sweep) but
    the layout path must stay correct for harnesses."""
    theta, w, h, nw, nh, sc, C = 45, 140, 100, 150, 110, 1.4, 4
    rng = np.random.default_rng(tc)
    tl, tr, bl = _corners(theta, w, h, nw, nh, sc)
    data = rng.random((h, w, C), dtype=np.float32)
    plan = rp.rotate_plan(w, h, tl, tr, bl, nw, nh, C, tc_force=tc)
    assert plan is not None and plan[0]["tc"] == tc
    src = jnp.moveaxis(jnp.asarray(data), -1, 0)
    out = rp.rotate_resample_planar(src, w, h, tl, tr, bl, nw, nh, C,
                                    interpret=True, plan=plan)
    pal = np.moveaxis(np.asarray(out), 0, -1)
    gat = _run_gather(data, w, h, tl, tr, bl, nw, nh, C)
    np.testing.assert_allclose(pal, gat, rtol=0, atol=2e-6)
