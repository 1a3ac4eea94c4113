"""Separable two-level scaled path (develop_scaled_sep.py) vs the XLA
engine's scaled path. The XLA path is oracle-pinned (test_scaling.py), so
agreement here chains to the reference semantics
(/root/reference/src/scaling.rs:104-145). The separable decomposition
reorders f32 accumulation, so the contract is the documented cross-path
one (<=1 LSB, small flip fraction), not bit-equality."""

import numpy as np
import pytest

from imagepipe_tpu import ImageSource, Pipeline
from imagepipe_tpu.engine import make_develop_plan, develop_fused
from imagepipe_tpu.kernels.develop_scaled_sep import (
    _build_geometry, develop_sep, develop_sep_batch, sep_plan_for,
    sep_supported)
from imagepipe_tpu.raw import Orientation, synthetic_bayer, synthetic_xtrans


def _plan(raw, maxwidth, out_bits=8, maxheight=0):
    p = Pipeline.new_from_source(ImageSource.from_raw(raw))
    p.globals.settings.maxwidth = maxwidth
    p.globals.settings.maxheight = maxheight
    if out_bits == 16:
        p.globals.settings.linear = True
    return make_develop_plan(p, out_bits=out_bits, numerics="direct")


@pytest.mark.parametrize("make_raw,out_bits", [
    (synthetic_bayer, 8),
    (synthetic_bayer, 16),
    (synthetic_xtrans, 8),
])
def test_sep_matches_fused(make_raw, out_bits):
    # deep thumbnail: scale ~16 (clamp provably inert)
    raw = make_raw(1536, 1024, seed=11)
    plan = _plan(raw, 96, out_bits)
    assert plan.dem_path == "scaled"
    assert sep_supported(plan)
    want = np.asarray(develop_fused(plan, raw.data)).astype(int)
    got = np.asarray(develop_sep(plan, raw.data)).astype(int)
    assert got.shape == want.shape
    diff = np.abs(want - got)
    assert diff.max() <= 1
    assert (diff != 0).mean() < 0.02


def test_sep_orientation_and_crops():
    raw = synthetic_bayer(1536, 1024, seed=12)
    raw.crops = (2, 6, 4, 8)
    raw.orientation = Orientation.Rotate90
    plan = _plan(raw, 80)
    assert sep_supported(plan)
    want = np.asarray(develop_fused(plan, raw.data)).astype(int)
    got = np.asarray(develop_sep(plan, raw.data)).astype(int)
    assert got.shape == want.shape       # transposed thumbnail
    diff = np.abs(want - got)
    assert diff.max() <= 1


def test_sep_declines_when_clamp_engages():
    # scale ~2: the paraboloid clamp fires inside windows; the separable
    # decomposition would be wrong there and must decline.
    raw = synthetic_bayer(640, 480, seed=13)
    plan = _plan(raw, 320)
    assert plan.dem_path == "scaled"
    assert not sep_supported(plan)
    assert sep_plan_for(plan) is None


def test_sep_batch_matches_single():
    raws = [synthetic_bayer(1536, 1024, seed=20 + i) for i in range(3)]
    plan = _plan(raws[0], 96)
    singles = [np.asarray(develop_sep(plan, r.data)) for r in raws]
    batched = np.asarray(develop_sep_batch(
        plan, np.stack([r.data for r in raws])[:, plan.crop_y:,
                                               plan.crop_x:], staged=True))
    for i, s in enumerate(singles):
        np.testing.assert_array_equal(batched[i], s)


def test_sep_geometry_exactness_vs_dense_oracle():
    """The host geometry (ind/dx2/den tables) must reproduce the dense
    per-window weight sums exactly: check den against a brute-force f64
    accumulation for a small geometry."""
    raw = synthetic_bayer(768, 512, seed=14)
    plan = _plan(raw, 48)
    sp = _build_geometry(plan)
    assert sp is not None
    # brute force: recompute den for a few output pixels
    import imagepipe_tpu.scaling as sc
    from imagepipe_tpu.raw import CFA

    H, W, nh, nw = sp.H, sp.W, sp.nh, sp.nw
    f32 = np.float32
    sxx = f32(f32(W - 1) / f32(nw - 1))
    syy = f32(f32(H - 1) / f32(nh - 1))
    cols = np.arange(nw, dtype=f32)
    rows = np.arange(nh, dtype=f32)
    fx = sc.sat_floor_np(sxx * cols, W - 1)
    tx = sc.sat_floor_np(sxx * (cols + f32(1.0)), W - 1)
    fy = sc.sat_floor_np(syy * rows, H - 1)
    ty = sc.sat_floor_np(syy * (rows + f32(1.0)), H - 1)
    cx = ((f32(0.0) - f32(0.5)) + sxx * cols) + (sxx / f32(2.0))
    cy = (syy * rows + (syy / f32(2.0))) - f32(0.5)
    pat = CFA(plan.cfa_name).pattern
    rng = np.random.default_rng(0)
    for _ in range(6):
        oy = int(rng.integers(0, nh))
        ox = int(rng.integers(0, nw))
        den = np.zeros(4)
        for y in range(fy[oy], ty[oy] + 1):
            dy = (f32(y) - cy[oy]) / syy
            for x in range(fx[ox], tx[ox] + 1):
                dx = (f32(x) - cx[ox]) / sxx
                w = (1.0 - float(dx) * float(dx)) - float(dy) * float(dy)
                assert w > 0.0   # clamp-inert precondition
                den[pat[y % pat.shape[0], x % pat.shape[1]]] += w
        np.testing.assert_allclose(sp.den[:, oy, ox], den, rtol=1e-6)
