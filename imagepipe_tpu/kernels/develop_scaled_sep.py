"""Separable two-level scaled develop: deep thumbnails as pure MXU matmuls.

The reference's fused demosaic+downscale (/root/reference/src/scaling.rs:
104-118 via demosaic.rs:47-50) weights each source pixel of a dest
window by `max(0, 1 - dx^2 - dy^2)`. The Pallas scaled kernel
(develop_scaled.py) serves this tile-locally, but below ~600px output
from 24MP its VMEM envelope is structurally exceeded (BASELINE.md r4
"why 160px stays on the XLA fallback"): a 128-lane output tile spans
~5000 source columns. This module is the queued two-level decomposition,
resting on one provable fact:

  For the axis-aligned scaled path at scale s, |dx|,|dy| <= 0.5 + 1/s,
  so for s above ~5 the paraboloid clamp max(0, .) is INERT — checked
  EXACTLY host-side from the same two-rounding f32 window tables the
  other resamplers use. With the clamp inert the weight is separable:

      w = (1 - dx^2) - dy^2
      num_c(oy,ox) = sum_y (1-dy^2) * S_c(y,ox)  -  sum_y T_c(y,ox)
      S_c(y,ox) = sum_x v(y,x)*m_c(y,x)*[x in win(ox)]
      T_c(y,ox) = sum_x v(y,x)*m_c(y,x)*[x in win(ox)] * dx^2

  The CFA mask m_c depends on x and on y mod ph only, so rows partition
  into ph classes and both column reductions become ONE batched matmul
  per image against host-precomputed [ph, W, 2*ncol*nw] geometry
  matrices; the row reduction is two tiny [nh, Hp] matmuls. Everything
  runs on the MXU with static shapes — no windows, no VMEM envelope, no
  Pallas. Denominators (weight sums per color) are host-precomputed in
  f64 (they are pure geometry). The finishing color chain is
  engine.finish_planes — the exact same device forms as every other
  path (<=1 LSB cross-path contract).

Index math stays in host numpy f32 (sat_floor_np) because XLA's FMA
contraction changes the rounding that feeds floor() (scaling.py module
notes). Accumulation order differs from the reference's sequential
ky/kx loop, so outputs match the XLA scaled path within the documented
cross-path contract (<=1 LSB, small flip fraction), not bit-exactly.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..raw import CFA
from ..scaling import sat_floor_np

__all__ = ["sep_plan_for", "sep_supported", "develop_sep",
           "develop_sep_batch", "stage_sep_np", "staged_sep_cached"]

_f32 = np.float32

# Geometry matrices scale with ph*W*nw; beyond this the Pallas scaled
# kernel (>=~600px outputs) or the XLA fused path serves the plan.
_MAX_TABLE_BYTES = 192 * 1024 * 1024


class SepPlan:
    def __init__(self, **kw):
        self.__dict__.update(kw)


_GEOM_CACHE: dict = {}


def _geometry_key(plan):
    return (plan.height, plan.width, plan.dem_h, plan.dem_w, plan.cfa_name)


def _build_geometry(plan, probe_only: bool = False):
    """Host-side geometry for one (H,W)->(nh,nw) CFA class, or None when
    the clamp-inert precondition fails or the tables would be too big."""
    H, W = plan.height, plan.width
    nh, nw = plan.dem_h, plan.dem_w
    if nh <= 1 or nw <= 1:
        return None
    # Same corners as scaling.scale_down_planar: (0,0),(W-1,0),(0,H-1).
    sxx = _f32(_f32(W - 1) / _f32(nw - 1))
    syy = _f32(_f32(H - 1) / _f32(nh - 1))
    cols = np.arange(nw, dtype=_f32)
    rows = np.arange(nh, dtype=_f32)
    tl0 = _f32(0.0)
    from_x = sat_floor_np(tl0 + sxx * cols, W - 1, np.int64)
    to_x = sat_floor_np(tl0 + sxx * (cols + _f32(1.0)), W - 1, np.int64)
    from_y = sat_floor_np(tl0 + syy * rows, H - 1, np.int64)
    to_y = sat_floor_np(tl0 + syy * (rows + _f32(1.0)), H - 1, np.int64)
    # Reference f32 order (scaling.rs:81,88 / _transform_aligned_impl).
    center_x = ((tl0 - _f32(0.5)) + sxx * cols) + (sxx / _f32(2.0))
    center_y = (tl0 + syy * rows + (syy / _f32(2.0))) - _f32(0.5)

    # EXACT clamp-inert check over the true window extremes (|dx| is
    # monotonic in x, so endpoints bound each window).
    dxf = (from_x.astype(_f32) - center_x) / sxx
    dxt = (to_x.astype(_f32) - center_x) / sxx
    dyf = (from_y.astype(_f32) - center_y) / syy
    dyt = (to_y.astype(_f32) - center_y) / syy
    max_dx2 = float(np.maximum(dxf * dxf, dxt * dxt).max())
    max_dy2 = float(np.maximum(dyf * dyf, dyt * dyt).max())
    if max_dx2 + max_dy2 >= 1.0:
        return None

    cfa = CFA(plan.cfa_name)
    pattern = cfa.pattern
    ph, pw = pattern.shape
    active = sorted(set(int(v) for v in pattern.ravel()))
    ncol = len(active)
    if ph * W * 2 * ncol * nw * 4 > _MAX_TABLE_BYTES:
        return None
    if probe_only:
        return True

    xs = np.arange(W, dtype=np.int64)
    ind = ((xs[:, None] >= from_x[None, :])
           & (xs[:, None] <= to_x[None, :]))                    # [W, nw]
    dx = (xs.astype(_f32)[:, None] - center_x[None, :]) / sxx
    dx2 = (dx * dx).astype(_f32)
    indf = ind.astype(_f32)
    ind_dx2 = (indf * dx2).astype(_f32)

    # Column matrices per row class: [ph, W, 2*ncol*nw]; first ncol*nw
    # columns are the S (weight-1) reduction, the rest the T (dx^2) one.
    M = np.zeros((ph, W, 2 * ncol * nw), _f32)
    for r in range(ph):
        for ci, c in enumerate(active):
            mask = (pattern[r, xs % pw] == c).astype(_f32)       # [W]
            M[r, :, ci * nw:(ci + 1) * nw] = indf * mask[:, None]
            M[r, :, (ncol + ci) * nw:(ncol + ci + 1) * nw] = \
                ind_dx2 * mask[:, None]

    # Row matrices over the class-padded height.
    Hp = -(-H // ph) * ph
    ys = np.arange(Hp, dtype=np.int64)
    indy = ((ys[None, :] >= from_y[:, None])
            & (ys[None, :] <= to_y[:, None]))                    # [nh, Hp]
    dy = (ys.astype(_f32)[None, :] - center_y[:, None]) / syy
    By = (indy.astype(_f32) * (_f32(1.0) - (dy * dy).astype(_f32)))
    Iy = indy.astype(_f32)

    # Denominators in f64 (pure geometry): per class then per output row.
    Sden = np.zeros((ph, ncol, nw), np.float64)   # sum_x m*ind
    Tden = np.zeros((ph, ncol, nw), np.float64)   # sum_x m*ind*dx^2
    for r in range(ph):
        for ci, c in enumerate(active):
            mask = (pattern[r, xs % pw] == c).astype(np.float64)
            Sden[r, ci] = (indf.astype(np.float64) * mask[:, None]).sum(0)
            Tden[r, ci] = (ind_dx2.astype(np.float64) * mask[:, None]).sum(0)
    cls = (ys % ph)
    dy64 = dy.astype(np.float64)
    den = np.zeros((4, nh, nw), np.float64)
    for oy in range(nh):
        ywin = ys[(ys >= from_y[oy]) & (ys <= to_y[oy]) & (ys < H)]
        wy = 1.0 - dy64[oy, ywin] ** 2
        for ci, c in enumerate(active):
            den[c, oy] = (wy[:, None] * Sden[cls[ywin], ci]
                          - Tden[cls[ywin], ci]).sum(0)
    den = den.astype(_f32)

    return SepPlan(H=H, W=W, Hp=Hp, nh=nh, nw=nw, ph=ph, ncol=ncol,
                   active=tuple(active), M=M, By=By.astype(_f32),
                   Iy=Iy.astype(_f32), den=den)


def sep_plan_for(plan):
    if plan.mode != "cfa" or plan.dem_path != "scaled":
        return None
    key = _geometry_key(plan)
    hit = _GEOM_CACHE.get(key)
    if hit is not None:
        return hit
    sp = _build_geometry(plan)
    if sp is not None:
        if len(_GEOM_CACHE) >= 2:   # tables are big; keep few
            _GEOM_CACHE.pop(next(iter(_GEOM_CACHE)))
        _GEOM_CACHE[key] = sp
    return sp


def sep_supported(plan) -> bool:
    """Cheap probe (1-D window math only; no table build)."""
    if plan.mode != "cfa" or plan.dem_path != "scaled":
        return False
    if _geometry_key(plan) in _GEOM_CACHE:
        return True
    return _build_geometry(plan, probe_only=True) is True


# -- staging ---------------------------------------------------------------

def stage_sep_np(plan, plane) -> np.ndarray:
    """Crop host-side; keep the raw dtype (u16 uploads at half the f32
    transfer cost; the cast runs inside the develop jit)."""
    return np.ascontiguousarray(
        np.asarray(plane)[plan.crop_y:plan.crop_y + plan.height,
                          plan.crop_x:plan.crop_x + plan.width])


def staged_sep_cached(plan, raw):
    key = ("sep", plan.crop_y, plan.crop_x, plan.height, plan.width)
    hit = getattr(raw, "_sep_staged", None)
    if hit is not None and hit[0] == key:
        return hit[1]
    dev = jnp.asarray(stage_sep_np(plan, raw.data))
    try:
        raw._sep_staged = (key, dev)
    except AttributeError:
        pass
    return dev


def _tables_device(plan, sp: SepPlan):
    key = _geometry_key(plan)
    hit = getattr(plan, "_sep_tables_dev", None)
    if hit is not None and hit[0] == key:
        return hit[1]
    dev = (jnp.asarray(sp.M), jnp.asarray(sp.By), jnp.asarray(sp.Iy),
           jnp.asarray(sp.den))
    try:
        plan._sep_tables_dev = (key, dev)
    except AttributeError:
        pass
    return dev


# -- device program ---------------------------------------------------------

def _sep_core(plane, M, By, Iy, den, params, *, H, W, Hp, nh, nw, ph, ncol,
              active, out_bits, linear, apply_curve, n_knots,
              orientation_flips, numerics):
    from .. import engine as _engine

    f = jnp.float32
    hi = jax.lax.Precision.HIGH   # bf16x3: ~f32-accurate at 3 MXU passes
    v = jnp.minimum((plane.astype(f) - params["mins"][0])
                    / params["ranges"][0], 1.0)
    if Hp != H:
        v = jnp.pad(v, ((0, Hp - H), (0, 0)))
    # Row classes: [Hp, W] -> [ph, Hp/ph, W] (class-major).
    vr = v.reshape(Hp // ph, ph, W).transpose(1, 0, 2)
    ST = jax.lax.dot_general(vr, M, (((2,), (1,)), ((0,), (0,))),
                             precision=hi)            # [ph, Hr, 2*ncol*nw]
    ST = ST.transpose(1, 0, 2).reshape(Hp, 2 * ncol * nw)
    S = ST[:, :ncol * nw]
    T = ST[:, ncol * nw:]
    num = (jax.lax.dot_general(By, S, (((1,), (0,)), ((), ())), precision=hi)
           - jax.lax.dot_general(Iy, T, (((1,), (0,)), ((), ())),
                                 precision=hi))       # [nh, ncol*nw]
    num = num.reshape(nh, ncol, nw).transpose(1, 0, 2)
    rgbe = []
    for c in range(4):
        if c in active:
            ci = active.index(c)
            rgbe.append(jnp.where(den[c] > 0.0, num[ci] / den[c], 0.0))
        else:
            rgbe.append(jnp.zeros((nh, nw), f))
    from .. import color as _cc

    with _cc.numerics_mode(numerics):
        return _engine.finish_planes(
            rgbe, params, out_bits=out_bits, linear=linear,
            apply_curve=apply_curve, n_knots=n_knots,
            orientation_flips=orientation_flips)


_STATICS = ("H", "W", "Hp", "nh", "nw", "ph", "ncol", "active", "out_bits",
            "linear", "apply_curve", "n_knots", "orientation_flips",
            "numerics")


@partial(jax.jit, static_argnames=_STATICS)
def _sep_jit(plane, M, By, Iy, den, params, *, H, W, Hp, nh, nw, ph, ncol,
             active, out_bits, linear, apply_curve, n_knots,
             orientation_flips, numerics):
    return _sep_core(plane, M, By, Iy, den, params, H=H, W=W, Hp=Hp, nh=nh,
                     nw=nw, ph=ph, ncol=ncol, active=active,
                     out_bits=out_bits, linear=linear,
                     apply_curve=apply_curve, n_knots=n_knots,
                     orientation_flips=orientation_flips, numerics=numerics)


@partial(jax.jit, static_argnames=_STATICS)
def _sep_batch_jit(planes, M, By, Iy, den, params, *, H, W, Hp, nh, nw, ph,
                   ncol, active, out_bits, linear, apply_curve, n_knots,
                   orientation_flips, numerics):
    core = partial(_sep_core, H=H, W=W, Hp=Hp, nh=nh, nw=nw, ph=ph,
                   ncol=ncol, active=active, out_bits=out_bits,
                   linear=linear, apply_curve=apply_curve, n_knots=n_knots,
                   orientation_flips=orientation_flips, numerics=numerics)
    return jax.vmap(lambda p: core(p, M, By, Iy, den, params))(planes)


@partial(jax.jit, static_argnames=_STATICS)
def _sep_batch_perimage_jit(planes, stacked_params, M, By, Iy, den, *, H, W,
                            Hp, nh, nw, ph, ncol, active, out_bits, linear,
                            apply_curve, n_knots, orientation_flips,
                            numerics):
    """Per-image calibration (levels/WB/curves vary per shot; geometry is
    the shape class's): vmap over (plane, params) with shared tables."""
    core = partial(_sep_core, H=H, W=W, Hp=Hp, nh=nh, nw=nw, ph=ph,
                   ncol=ncol, active=active, out_bits=out_bits,
                   linear=linear, apply_curve=apply_curve, n_knots=n_knots,
                   orientation_flips=orientation_flips, numerics=numerics)
    return jax.vmap(lambda p, prm: core(p, M, By, Iy, den, prm))(
        planes, stacked_params)


def _statics_for(plan, sp: SepPlan):
    return dict(H=sp.H, W=sp.W, Hp=sp.Hp, nh=sp.nh, nw=sp.nw, ph=sp.ph,
                ncol=sp.ncol, active=sp.active, out_bits=plan.out_bits,
                linear=plan.linear, apply_curve=plan.apply_curve,
                n_knots=plan.n_knots,
                orientation_flips=plan.orientation_flips,
                numerics=plan.numerics)


def develop_sep(plan, plane, staged: bool = False):
    """Develop one sensor plane via the separable two-level scaled path.
    plane: full sensor raw counts (crop applied at staging) or the output
    of stage_sep_np when staged=True. Returns quantized planar [3,nh',nw']."""
    sp = sep_plan_for(plan)
    assert sp is not None, "plan outside the separable scaled envelope"
    if not staged:
        plane = jnp.asarray(stage_sep_np(plan, np.asarray(plane)))
    M, By, Iy, den = _tables_device(plan, sp)
    return _sep_jit(plane, M, By, Iy, den, plan.params,
                    **_statics_for(plan, sp))


def develop_sep_batch(plan, planes, staged: bool = False):
    sp = sep_plan_for(plan)
    assert sp is not None, "plan outside the separable scaled envelope"
    if not staged:
        planes = jnp.stack([jnp.asarray(stage_sep_np(plan, np.asarray(p)))
                            for p in planes])
    M, By, Iy, den = _tables_device(plan, sp)
    return _sep_batch_jit(planes, M, By, Iy, den, plan.params,
                          **_statics_for(plan, sp))
