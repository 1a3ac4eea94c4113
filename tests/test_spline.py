"""Spline tests, mirroring /root/reference/src/ops/curves.rs:160-189."""

import numpy as np

from imagepipe_tpu.spline import SplineFunc


def _ev(spline, v):
    return float(np.asarray(spline.interpolate(np.float32(v))))


def test_extremes():
    spline = SplineFunc([])
    assert _ev(spline, 0.0) == 0.0
    assert _ev(spline, 1.0) == 1.0


def test_saturates():
    spline = SplineFunc([])
    assert _ev(spline, 1.5) == 1.0
    assert _ev(spline, -0.2) == 0.0


def test_high_blackpoint():
    spline = SplineFunc([(0.0, 0.2)])
    assert abs(_ev(spline, 0.0) - 0.2) < 1e-7


def test_low_whitepoint():
    spline = SplineFunc([(1.0, 0.8)])
    assert abs(_ev(spline, 1.0) - 0.8) < 1e-7


def test_monotone_and_knot_exact():
    """Interpolation passes exactly through knots and stays monotone for
    monotone data (the Fritsch-Carlson property the reference relies on for
    tone curves)."""
    pts = [(0.25, 0.3), (0.5, 0.6), (0.75, 0.8)]
    spline = SplineFunc(pts)
    for x, y in pts:
        assert abs(_ev(spline, x) - y) < 1e-6
    xs = np.linspace(0.0, 1.0, 1001, dtype=np.float32)
    ys = np.asarray(spline.interpolate(xs))
    assert np.all(np.diff(ys) >= -1e-6)


def test_vectorized_matches_scalar():
    pts = [(0.5, 0.6)]
    spline = SplineFunc(pts)
    xs = np.linspace(-0.1, 1.1, 257, dtype=np.float32)
    vec = np.asarray(spline.interpolate(xs))
    scl = np.array([_ev(spline, float(x)) for x in xs], dtype=np.float32)
    np.testing.assert_allclose(vec, scl, rtol=0, atol=0)
