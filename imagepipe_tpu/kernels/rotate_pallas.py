"""Pallas TPU kernel for the rotated (non-axis-aligned) resampler.

The reference resampler (/root/reference/src/scaling.rs:51-130) walks, for
every destination pixel, a small source window [from..to] per axis whose
corners are the f32 affine images of the dest cell corners, and accumulates
paraboloid-weighted samples. Axis-aligned geometry is served by the MXU
one-hot path in scaling.py; for ROTATED geometry the per-pixel source
coordinates vary along both axes, and an elementwise gather serializes on the
TPU VPU (~1000x arithmetic speed). This kernel restructures the same math so
the only "gather" is a 0/1 one-hot matmul on the MXU:

  * the output is tiled [TH, TC]; each tile's bounded source window (bounding
    box of all its pixels' sample windows, 8/128-aligned) is DMA'd HBM->VMEM,
    double-buffered against compute;
  * rows are processed in groups of R: one one-hot matmul per (group,
    channel) gathers the x-samples `from_x(r,c)+kx` for ALL R rows and all
    kx window offsets at once -- [D_g, D_xr] x [D_xr, R*K_x*TC], where
    [D_g, D_xr] is the group's exact 8/128-aligned sub-window. Selection is
    bit-exact via a manual 3-term bf16 split of the f32 values (24 <= 3x8
    mantissa bits; each bf16 x {0,1} product is exact and every one-hot
    column has at most one hot), at native bf16 matmul rate -- Mosaic
    supports only DEFAULT/HIGHEST dot precisions, and HIGHEST costs 2x;
  * the y-window selection is then a per-sample masked sublane reduction,
    and each (ky, kx) sample is accumulated with the reference's f32
    addition order, so per-pixel sums match the gather implementation at
    the ULP level;
  * K_x/K_y are tightened from the static bound to the actual maximum
    window span, computed exactly from the 1-D f32 index tables (at 45
    degrees the reference's corner-pair windows span only ~2 samples).

Index math reproduces the reference's two-f32-rounding semantics exactly:
per-row terms (tl + skip_y*r) and per-tile row aggregates are host-computed
f32 tables read from SMEM (device-side `a + b*r` may contract into an FMA
whose single rounding flips floor() at window boundaries -- the documented
scaling.py trap); per-column terms (skip_x*c) are VMEM tables, and the
single device add feeding floor() matches scaling._transform_impl (which is
oracle-pinned). Window origins derived from the SMEM aggregates are exact,
so DMA windows need no safety margins.

Windows with inverted/empty ranges (large angles make to < from, matching
scaling.rs's `for y in from..=to` which then samples nothing) fall out of
the validity masks naturally: zero weight sum -> zero output, as the
reference.
"""

from __future__ import annotations

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rotate_plan", "rotate_resample_planar"]

_f32 = np.float32

TH = 128           # output tile rows (256 measured slightly slower: 122/151/303 ms vs 118/151/293 at 5/20/45 deg)
TC = 128           # output tile cols (lane width)
R = 8              # rows per one-hot matmul group (TH % R == 0)
_MAX_KY = 8        # static bound for the y window unroll
_VMEM_WINDOW_BYTES = 10 * 1024 * 1024  # double-buffered window budget


def _skips(topleft, topright, bottomleft, nwidth, nheight):
    """f32 per-axis steps, exactly as scaling.rs:69-72 / scaling.py."""
    tl0, tl1 = _f32(topleft[0]), _f32(topleft[1])
    tr0, tr1 = _f32(topright[0]), _f32(topright[1])
    bl0, bl1 = _f32(bottomleft[0]), _f32(bottomleft[1])
    with np.errstate(divide="ignore", invalid="ignore"):
        sxx = _f32((tr0 - tl0) / _f32(nwidth - 1))
        sxy = _f32((tr1 - tl1) / _f32(nwidth - 1))
        syx = _f32((bl0 - tl0) / _f32(nheight - 1))
        syy = _f32((bl1 - tl1) / _f32(nheight - 1))
    return tl0, tl1, sxx, sxy, syx, syy


def _bound(a, b, width, height):
    """Static window bound, same formula as scaling._transform_impl."""
    s = (0.0 if not math.isfinite(float(a)) else abs(float(a))) + (
        0.0 if not math.isfinite(float(b)) else abs(float(b)))
    return max(1, min(int(math.ceil(s)) + 2, max(width, height)))


from ..scaling import sat_floor_np as _sat_np  # shared two-rounding helper


def rotate_plan(width, height, topleft, topright, bottomleft, nwidth, nheight,
                components, tc_force=None):
    """Host-side geometry plan. Returns (statics, tables...) or None when
    this geometry should fall back to the gather implementation.
    `tc_force` pins the tile width (tests + A/B harnesses)."""
    if nwidth <= 1 or nheight <= 1 or components < 1 or components > 8:
        return None
    tl0, tl1, sxx, sxy, syx, syy = _skips(
        topleft, topright, bottomleft, nwidth, nheight)
    vals = [tl0, tl1, sxx, sxy, syx, syy]
    if not all(np.isfinite(v) for v in vals):
        return None
    # The weight divisions need nonzero per-axis steps (the reference divides
    # by them too; degenerate geometry keeps the legacy path's semantics).
    if abs(float(sxx)) < 1e-12 or abs(float(syy)) < 1e-12:
        return None
    K_x = _bound(sxx, syx, width, height)
    K_y = _bound(sxy, syy, width, height)

    ntr = -(-nheight // TH)
    ntc = -(-nwidth // TC)
    ngr = TH // R                      # row groups per tile
    rows = np.arange(nheight, dtype=_f32)
    cols = np.arange(nwidth, dtype=_f32)

    # 1-D f32 terms, same expressions as scaling._transform_impl's tables.
    fyr = tl1 + syy * rows
    tyr = tl1 + syy * (rows + _f32(1.0))
    fxr = tl0 + syx * rows
    txr = tl0 + syx * (rows + _f32(1.0))
    fyc = sxy * cols
    tyc = sxy * (cols + _f32(1.0))
    fxc = sxx * cols
    txc = sxx * (cols + _f32(1.0))

    # Tight window spans from the actual f32 tables:
    # to-from = floor(F+D)-floor(F) <= floor(max D)+1, so span <= that + 1.
    dx_max = float(max((txr - fxr).max(), 0.0) + max((txc - fxc).max(), 0.0))
    dy_max = float(max((tyr - fyr).max(), 0.0) + max((tyc - fyc).max(), 0.0))
    K_x = max(1, min(K_x, int(math.floor(dx_max)) + 2))
    K_y = max(1, min(K_y, int(math.floor(dy_max)) + 2))
    if K_y > _MAX_KY or K_x > _MAX_KY:
        return None

    def tile_minmax(arr, n, t):
        pad = np.pad(arr, (0, n * t - arr.shape[0]), mode="edge")
        m = pad.reshape(n, t)
        return m.min(axis=1), m.max(axis=1)

    fyr_min, _ = tile_minmax(fyr, ntr, TH)
    _, tyr_max = tile_minmax(tyr, ntr, TH)
    fxr_min, _ = tile_minmax(fxr, ntr, TH)
    _, txr_max = tile_minmax(txr, ntr, TH)

    def body(TC):
        ntc = -(-nwidth // TC)
        fyc_min, _ = tile_minmax(fyc, ntc, TC)
        _, tyc_max = tile_minmax(tyc, ntc, TC)
        fxc_min, _ = tile_minmax(fxc, ntc, TC)
        _, txc_max = tile_minmax(txc, ntc, TC)

        # Per-tile window bounds (floor/sat are monotone, so separable min/max of
        # the 1-D terms bound the per-pixel from/to exactly). The kernel derives
        # the same origins from the SMEM aggregate table -> exact, no margins.
        ymin = _sat_np(fyr_min[:, None] + fyc_min[None, :], height - 1)
        ymax = _sat_np(tyr_max[:, None] + tyc_max[None, :], height - 1)
        ymax = np.maximum(ymax, ymin)
        xmin = _sat_np(fxr_min[:, None] + fxc_min[None, :], width - 1)
        xmax = _sat_np(txr_max[:, None] + txc_max[None, :], width - 1)
        xmax = np.maximum(xmax, xmin)
        ry0 = (ymin // 8) * 8
        rx0 = (xmin // 128) * 128
        D_y = -(-(int((ymax - ry0).max()) + 1) // 8) * 8
        D_x = -(-(int((xmax - rx0).max()) + 1) // 128) * 128

        # Per-row-GROUP sub-window extents (the kernel slices [D_g, D_xr] out of
        # the tile window per group, 8/128-aligned down from the group minima).
        n_groups = ntr * ngr
        fy_g, _ = tile_minmax(fyr, n_groups, R)
        _, ty_g = tile_minmax(tyr, n_groups, R)
        fx_g, _ = tile_minmax(fxr, n_groups, R)
        _, tx_g = tile_minmax(txr, n_groups, R)
        gy_min = _sat_np(fy_g[:, None] + fyc_min[None, :], height - 1)
        gy_max = np.maximum(_sat_np(ty_g[:, None] + tyc_max[None, :], height - 1),
                            gy_min)
        gx_min = _sat_np(fx_g[:, None] + fxc_min[None, :], width - 1)
        gx_max = np.maximum(_sat_np(tx_g[:, None] + txc_max[None, :], width - 1),
                            gx_min)
        D_g = -(-(int((gy_max - (gy_min // 8) * 8).max()) + 1) // 8) * 8
        D_xr = -(-(int((gx_max - (gx_min // 128) * 128).max()) + 1) // 128) * 128

        # Bucket the window extents so one compiled kernel covers a range of
        # angles: the jit signature is shapes+buckets only (the geometry lives
        # in runtime tables), so an interactive rotation slider re-jits a
        # handful of times, not per angle.
        D_g = -(-D_g // 32) * 32
        D_y = -(-D_y // 64) * 64
        D_g = min(D_g, D_y)
        D_xr = min(D_xr, D_x)

        win_bytes = 2 * components * D_y * D_x * 4
        ohx_bytes = D_xr * R * K_x * TC * 4
        rowv_bytes = 2 * 6 * TH * TC * 4   # lane-replicated row terms
        if win_bytes + ohx_bytes + rowv_bytes > _VMEM_WINDOW_BYTES:
            return None
        # Channel-batched selection holds gsel + its masked product in VMEM
        # ([nch*D_g, R*K_x*TC] f32 each); batch as many channels per matmul as
        # the leftover budget allows (1 = the original per-channel loop).
        per_ch = 2 * D_g * R * K_x * TC * 4
        nch = max(1, min(components,
                         (_VMEM_WINDOW_BYTES - win_bytes - ohx_bytes) // per_ch))

        # Static upper bounds for any per-tile origin (ry0 <= align8(H-1) etc.).
        Hp = (-(-height // 8) * 8) + D_y
        Wp = (-(-width // 128) * 128) + D_x

        nw_pad = ntc * TC
        cpad = np.minimum(np.arange(nw_pad), nwidth - 1).astype(_f32)
        half_x = _f32(sxx / _f32(2.0))
        half_y = _f32(sxy / _f32(2.0))
        coltab = np.stack([
            sxx * cpad,                      # fxc
            sxx * (cpad + _f32(1.0)),        # txc
            sxy * cpad,                      # fyc
            sxy * (cpad + _f32(1.0)),        # tyc
            sxx * cpad + half_x,             # cxc (scaling.py line order)
            sxy * cpad + half_y,             # cyc
        ]).astype(_f32)                      # [6, nw_pad]
        if TC < 128:
            # Mosaic requires block lane dims %128 or == the array dim;
            # sub-128 tiles make TC the actual last dim (tile-major).
            coltab = coltab.reshape(6, ntc, TC).swapaxes(0, 1).copy()

        # Per-row f32 terms, exact host two-rounding values -- device-side
        # `tl + skip*r` could contract into an FMA whose single rounding
        # flips floor() at window boundaries (the trap documented for
        # scaling.py's host tables). Lane-replicated into a VMEM table
        # ([6, nh_pad, TC]) so the kernel's weight/validity math runs in
        # full [R, TC] register tiles instead of 1-sublane [TC] vectors
        # (the measured 45-degree residual, VERDICT r3 item 7).
        nh_pad = ntr * TH
        rpad = np.minimum(np.arange(nh_pad), nheight - 1).astype(_f32)
        rowbase = np.stack([
            tl1 + syy * rpad,                                       # fyr
            tl1 + syy * (rpad + _f32(1.0)),                         # tyr
            tl0 + syx * rpad,                                       # fxr
            tl0 + syx * (rpad + _f32(1.0)),                         # txr
            tl1 + syy * rpad + _f32(syy / _f32(2.0)) - _f32(0.5),   # cyr
            tl0 + syx * rpad + _f32(syx / _f32(2.0)) - _f32(0.5),   # cxr
        ]).astype(_f32)
        rowv = np.repeat(rowbase[:, :, None], TC, axis=2)  # [6, nh_pad, TC]

        # Geometry params + per-tile-row and per-group aggregates (exact f32
        # minima/maxima of the row terms) for window origins:
        # [1 + ntr + n_groups, 8] f32 SMEM, whole-array. Row 0 carries the skip
        # scalars so they are runtime data, not jit statics.
        prm = np.array([[tl0, tl1, sxx, sxy, syx, syy, 0.0, 0.0]], _f32)
        ragg = np.stack([fyr_min, tyr_max, fxr_min, txr_max,
                         np.zeros(ntr, _f32), np.zeros(ntr, _f32),
                         np.zeros(ntr, _f32), np.zeros(ntr, _f32)]).T
        gagg = np.stack([fy_g, ty_g, fx_g, tx_g,
                         np.zeros(n_groups, _f32), np.zeros(n_groups, _f32),
                         np.zeros(n_groups, _f32), np.zeros(n_groups, _f32)]).T
        aggtab = np.concatenate([prm, ragg, gagg], axis=0).astype(_f32)

        statics = dict(
            components=components, height=height, width=width,
            nheight=nheight, nwidth=nwidth, ntr=ntr, ntc=ntc,
            D_y=D_y, D_x=D_x, D_g=D_g, D_xr=D_xr, K_x=K_x, K_y=K_y,
            Hp=Hp, Wp=Wp, nch=int(nch), tc=int(TC),
        )
        # Cost model for the tile-width choice: selection MACs (3 bf16 passes,
        # MXU ~32x VPU element rate) + the mask-mult-reduce VPU elements.
        ntiles = ntr * ntc * ngr
        mxu = ntiles * components * D_g * D_xr * R * K_x * TC * 3 / 32.0
        vpu = ntiles * components * R * K_y * D_g * K_x * TC
        return (mxu + vpu), (statics, coltab, rowv, aggtab)

    # Angle-adaptive tile width: the group sub-window scales with
    # TC*sin(angle) on BOTH axes, so selection FLOPs per output pixel
    # grow ~TC^2 at large angles; a 64-lane tile quarters them there
    # (at the cost of half-empty vector lanes). Pick by cost model with
    # hysteresis toward the proven 128-lane default. 32/16-lane tiles
    # are deliberately NOT candidates: the element-count model says they
    # shrink further, but on hardware they REGRESS (45 deg: 449/900 ms
    # vs 364 for TC=64 -- per-tile fixed costs + lane waste the model
    # doesn't price; scripts/exp_rotate_45sweep.py, BASELINE.md r4).
    if tc_force is not None:
        cand = body(tc_force)
        return None if cand is None else cand[1]
    best = body(TC)
    cand = body(64)
    if cand is not None and (best is None or cand[0] < 0.75 * best[0]):
        best = cand
    return None if best is None else best[1]


def _rotate_kernel(tab_ref, rowv_ref, agg_ref, src_hbm, out_ref, win_ref,
                   sems, *, components, height, width, nheight, nwidth, ntr,
                   ntc, D_y, D_x, D_g, D_xr, K_x, K_y, Hp, Wp, nch, tc):
    TC = tc          # angle-adaptive tile width (shadows the module default)
    tile_fmt = tc < 128  # sub-128: tile-major table/output layouts
    f = jnp.float32
    C = components
    ti = pl.program_id(0)
    tj = pl.program_id(1)
    step = ti * ntc + tj
    nsteps = ntr * ntc

    # Geometry scalars from the params row (runtime data, so one compiled
    # kernel serves every angle with the same shape/bucket signature).
    sxxf = agg_ref[0, 2]
    sxyf = agg_ref[0, 3]
    syyf = agg_ref[0, 5]

    def i2f(v):
        return jnp.asarray(v, jnp.int32).astype(f)

    def sat_s(v, maxv):
        v = jnp.floor(v)
        return jnp.clip(v, 0.0, f(maxv)).astype(jnp.int32)

    def col_edge_min(skip, c_lo):
        c_hi = jnp.minimum(c_lo + TC - 1, nwidth - 1)
        return jnp.minimum(skip * i2f(c_lo), skip * i2f(c_hi))

    def window_origin(s):
        """Exact per-tile window origin from the SMEM row aggregates (the
        same separable min the host sizing used)."""
        ii = s // ntc
        jj = s % ntc
        c_lo = jj * TC
        ymin = sat_s(agg_ref[1 + ii, 0] + col_edge_min(sxyf, c_lo), height - 1)
        xmin = sat_s(agg_ref[1 + ii, 2] + col_edge_min(sxxf, c_lo), width - 1)
        # Block-unit clamps with the multiply LAST: Mosaic must statically
        # prove the DMA offsets are 8/128-multiples.
        ryb = jnp.clip(ymin // 8, 0, (Hp - D_y) // 8)
        rxb = jnp.clip(xmin // 128, 0, (Wp - D_x) // 128)
        return ryb * 8, rxb * 128

    def start_dma(s, slot):
        ry0, rx0 = window_origin(s)
        return pltpu.make_async_copy(
            src_hbm.at[:, pl.ds(ry0, D_y), pl.ds(rx0, D_x)],
            win_ref.at[slot], sems.at[slot])

    @pl.when(step == 0)
    def _():
        start_dma(0, 0).start()

    @pl.when(step + 1 < nsteps)
    def _():
        start_dma(step + 1, (step + 1) % 2).start()

    start_dma(step, step % 2).wait()
    slot = step % 2

    ry0, rx0 = window_origin(step)
    c_lo = tj * TC
    fyc_min_s = col_edge_min(sxyf, c_lo)
    fxc_min_s = col_edge_min(sxxf, c_lo)

    def col_edge_max_to(skip, c_lo_):
        # Max of the 'to' column terms skip*(c+1) over this tile's columns
        # (the host tyc/txc tables use c+1; using skip*c here made the
        # empty-tile test non-conservative and zeroed real pixels).
        c_hi = jnp.minimum(c_lo_ + TC - 1, nwidth - 1)
        return jnp.maximum(skip * i2f(c_lo_ + 1), skip * i2f(c_hi + 1))

    # Whole-tile empty-window early-out: at large angles the reference's
    # corner-pair windows invert (to < from -> zero samples -> black);
    # max(to) < min(from) over the tile proves every pixel is empty, so
    # nearly half the 45-degree output skips compute entirely.
    ty_max_t = sat_s(agg_ref[1 + ti, 1] + col_edge_max_to(sxyf, c_lo), height - 1)
    tx_max_t = sat_s(agg_ref[1 + ti, 3] + col_edge_max_to(sxxf, c_lo), width - 1)
    y_min_t = sat_s(agg_ref[1 + ti, 0] + fyc_min_s, height - 1)
    x_min_t = sat_s(agg_ref[1 + ti, 2] + fxc_min_s, width - 1)
    tile_empty = (ty_max_t < y_min_t) | (tx_max_t < x_min_t)

    @pl.when(tile_empty)
    def _():
        if tile_fmt:
            out_ref[...] = jnp.zeros((C, 1, TH, TC), f)
        else:
            out_ref[...] = jnp.zeros((C, TH, TC), f)

    # Column terms for this tile's TC output columns ([6, TC] table block;
    # tile-major [1, 6, TC] when sub-128).
    tab = (lambda k: tab_ref[0, k, :]) if tile_fmt else (lambda k: tab_ref[k, :])
    fxc = tab(0)
    txc = tab(1)
    fyc = tab(2)
    tyc = tab(3)
    cxc = tab(4)
    cyc = tab(5)

    def sat_v(v, maxv):
        v = jnp.floor(v)
        return jnp.clip(v, 0.0, f(maxv)).astype(jnp.int32)

    iota_sub = jax.lax.broadcasted_iota(jnp.int32, (D_g, TC), 0)
    iota_x = jax.lax.broadcasted_iota(jnp.int32, (D_xr, R * K_x * TC), 0)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (1, R * K_x * TC), 1)
    ngr = TH // R

    def group_body(g, carry):
        # Exact 8/128-aligned group sub-window from the SMEM aggregates.
        gidx = 1 + ntr + (ti * ngr + g)              # group rows of aggtab
        gy_min = sat_s(agg_ref[gidx, 0] + fyc_min_s, height - 1)
        gx_min = sat_s(agg_ref[gidx, 2] + fxc_min_s, width - 1)
        pyb = jnp.clip((gy_min - ry0) // 8, 0, (D_y - D_g) // 8)
        pxb = jnp.clip((gx_min - rx0) // 128, 0, (D_x - D_xr) // 128)
        py0_abs = ry0 + pyb * 8
        px0_abs = rx0 + pxb * 128

        # Group index vectors and weights in FULL [R, TC] / [R, K_x*TC]
        # register tiles (the r3-measured 45-degree residual was this
        # section issued as 1-sublane [TC] vectors, 1/8 VPU utilization).
        # Expressions and per-pixel f32 accumulation order are identical
        # to the reference loop, so outputs stay bit-exact.
        rv = lambda k: rowv_ref[k, pl.ds(g * R, R), :]   # [R, TC]
        from_y_t = sat_v(rv(0) + fyc[None, :], height - 1)
        to_y_t = sat_v(rv(1) + tyc[None, :], height - 1)
        from_x_t = sat_v(rv(2) + fxc[None, :], width - 1)
        to_x_t = sat_v(rv(3) + txc[None, :], width - 1)
        center_y_t = rv(4) + cyc[None, :]
        center_x_t = rv(5) + cxc[None, :]
        qys_t = from_y_t - py0_abs
        tos_rel_t = to_y_t - py0_abs

        # x-window terms widened across every kx offset in one shot.
        kx_blk = jax.lax.broadcasted_iota(jnp.int32, (R, K_x * TC), 1) // TC
        xw = jnp.tile(from_x_t, (1, K_x)) + kx_blk
        vxw = (xw <= jnp.tile(to_x_t, (1, K_x))).astype(f)
        dxw = (xw.astype(f) - jnp.tile(center_x_t, (1, K_x))) / sxxf
        facx = 1.0 - dxw * dxw
        ws_wide = []                    # per ky: [R, K_x*TC]
        cnt_t = jnp.zeros((R, TC), f)
        for ky in range(K_y):
            y = from_y_t + ky
            validy = (y <= to_y_t).astype(f)
            dy = (y.astype(f) - center_y_t) / syyf
            fac = facx - jnp.tile(dy * dy, (1, K_x))
            fac = jnp.where(fac < 0.0, 0.0, fac)
            w = fac * vxw * jnp.tile(validy, (1, K_x))
            ws_wide.append(w)
            for kx in range(K_x):       # reference (ky, kx) sample order
                cnt_t = cnt_t + w[:, kx * TC:(kx + 1) * TC]

        # One-hot x selectors for all (rr, kx) at once: hot where
        # px0 + i == from_x(r,c) + kx, laid out [(rr*K_x + kx)*TC + c].
        # Built by tile+select (Mosaic rejects 1-D vector concatenation).
        blk = lane_iota // TC                                    # [1, N]
        fx_all = jnp.zeros((1, R * K_x * TC), jnp.int32)
        for rr in range(R):
            base = from_x_t[rr:rr + 1, :] - px0_abs              # [1, TC]
            tiled = jnp.tile(base, (1, R * K_x))                 # [1, N]
            for kx in range(K_x):
                b = rr * K_x + kx
                fx_all = jnp.where(blk == b, tiled + kx, fx_all)
        ohx = (iota_x == fx_all).astype(f)            # [D_xr, R*K_x*TC]

        # Row-selection masks per (rr, ky): [D_g, TC].
        masks = [[(iota_sub == qys_t[rr:rr + 1, :] + ky).astype(f)
                  * (qys_t[rr:rr + 1, :] + ky
                     <= tos_rel_t[rr:rr + 1, :]).astype(f)
                  for ky in range(K_y)] for rr in range(R)]

        ohx_bf = ohx.astype(jnp.bfloat16)
        # Channels batched `nch` per selection matmul (sublane-stacked:
        # [nch*D_g, D_xr]): fewer MXU dispatches at a taller M dimension,
        # one bf16 split per chunk instead of per channel; nch is sized by
        # rotate_plan's VMEM budget (1 = the original per-channel loop).
        for c0 in range(0, C, nch):
            chs = list(range(c0, min(c0 + nch, C)))
            nc = len(chs)
            if nc > 1:
                win4 = jnp.concatenate(
                    [win_ref[slot, ch, pl.ds(pyb * 8, D_g),
                             pl.ds(pxb * 128, D_xr)] for ch in chs],
                    axis=0)                            # [nc*D_g, D_xr]
            else:
                win4 = win_ref[slot, chs[0], pl.ds(pyb * 8, D_g),
                               pl.ds(pxb * 128, D_xr)]
            # Manual 3-term bf16 split: hi+mid+lo reconstructs every f32
            # exactly (24 <= 3x8 mantissa bits), each bf16 x {0,1} product
            # is exact, and each output column has at most one hot -- so
            # three native-rate bf16 matmuls give bit-exact selection at
            # half the passes of Precision.HIGHEST.
            hi = win4.astype(jnp.bfloat16)
            r1 = win4 - hi.astype(f)
            mid = r1.astype(jnp.bfloat16)
            lo = (r1 - mid.astype(f)).astype(jnp.bfloat16)
            gsel = None
            for part in (hi, mid, lo):
                d = jax.lax.dot_general(
                    part, ohx_bf, (((1,), (0,)), ((), ())),
                    preferred_element_type=f)          # [nc*D_g, R*K_x*TC]
                gsel = d if gsel is None else gsel + d
            for rr in range(R):
                seg = gsel[:, rr * K_x * TC:(rr + 1) * K_x * TC]
                accs = [jnp.zeros((TC,), f) for _ in chs]
                for ky in range(K_y):
                    # One wide masked reduction per (rr, ky) covering every
                    # kx offset and chunk channel: the y-selection mask is
                    # kx- and channel-independent, so tiling it beats
                    # K_x*nc narrow reduce ops (the 45-degree hot loop).
                    m_t = jnp.tile(masks[rr][ky], (nc, K_x))
                    prod = seg * m_t                   # [nc*D_g, K_x*TC]
                    w_row = ws_wide[ky][rr]            # [K_x*TC]
                    for ci in range(nc):
                        vals = jnp.sum(prod[ci * D_g:(ci + 1) * D_g, :],
                                       axis=0)
                        pw = w_row * vals              # one wide multiply
                        acc = accs[ci]
                        for kx in range(K_x):          # reference kx order
                            acc = acc + pw[kx * TC:(kx + 1) * TC]
                        accs[ci] = acc
                cnt = cnt_t[rr]
                for ci, ch in enumerate(chs):
                    res = jnp.where(cnt > 0.0, accs[ci] / cnt, 0.0)
                    if tile_fmt:
                        out_ref[ch, 0, pl.ds(g * R + rr, 1), :] = res[None, :]
                    else:
                        out_ref[ch, pl.ds(g * R + rr, 1), :] = res[None, :]
        return carry

    @pl.when(jnp.logical_not(tile_empty))
    def _():
        jax.lax.fori_loop(0, ngr, group_body, 0)


@partial(jax.jit, static_argnames=(
    "components", "height", "width", "nheight", "nwidth", "ntr", "ntc",
    "D_y", "D_x", "D_g", "D_xr", "K_x", "K_y", "Hp", "Wp", "nch", "tc",
    "interpret"))
def _rotate_jit(src_chw, coltab, rowtab, aggtab, *, components, height, width,
                nheight, nwidth, ntr, ntc, D_y, D_x, D_g, D_xr, K_x, K_y,
                Hp, Wp, nch, tc, interpret):
    TC = tc
    C = components
    src_p = jnp.pad(src_chw, ((0, 0), (0, Hp - height), (0, Wp - width)))
    kernel = partial(
        _rotate_kernel, components=C, height=height, width=width,
        nheight=nheight, nwidth=nwidth, ntr=ntr, ntc=ntc, D_y=D_y, D_x=D_x,
        D_g=D_g, D_xr=D_xr, K_x=K_x, K_y=K_y, Hp=Hp, Wp=Wp, nch=nch,
        tc=tc)
    if TC < 128:
        # Tile-major layouts (TC is the actual last array dim; Mosaic
        # requires block lane dims %128 or == the array dim).
        colspec = pl.BlockSpec((1, 6, TC), lambda i, j: (j, 0, 0),
                               memory_space=pltpu.VMEM)
        outspec = pl.BlockSpec((C, 1, TH, TC), lambda i, j: (0, j, i, 0),
                               memory_space=pltpu.VMEM)
        outshape = jax.ShapeDtypeStruct((C, ntc, nheight, TC), jnp.float32)
    else:
        colspec = pl.BlockSpec((6, TC), lambda i, j: (0, j),
                               memory_space=pltpu.VMEM)
        outspec = pl.BlockSpec((C, TH, TC), lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM)
        outshape = jax.ShapeDtypeStruct((C, nheight, nwidth), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(ntr, ntc),
        in_specs=[
            colspec,                                 # column tables
            pl.BlockSpec((6, TH, TC), lambda i, j: (0, i, 0),
                         memory_space=pltpu.VMEM),   # lane-replicated row terms
            pl.BlockSpec(memory_space=pltpu.SMEM),   # tile/group aggregates
            pl.BlockSpec(memory_space=pltpu.ANY),    # padded source (HBM)
        ],
        out_specs=outspec,
        out_shape=outshape,
        scratch_shapes=[
            pltpu.VMEM((2, C, D_y, D_x), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(coltab, rowtab, aggtab, src_p)
    if TC < 128:
        # [C, ntc, nh, TC] -> [C, nh, ntc*TC] -> crop to nw.
        out = jnp.swapaxes(out, 1, 2).reshape(C, nheight, ntc * TC)
        out = out[:, :, :nwidth]
    return out


def rotate_resample_planar(src_chw, width, height, topleft, topright,
                           bottomleft, nwidth, nheight, components,
                           interpret=None, plan=None):
    """Rotated resample of a planar [C, H, W] f32 array -> [C, nh, nw].

    Drop-in for the rotated branch of scaling.transform_buffer_planar when
    `plan` (from rotate_plan) is not None. components must equal C."""
    if plan is None:
        plan = rotate_plan(width, height, topleft, topright, bottomleft,
                           nwidth, nheight, components)
    assert plan is not None
    statics, coltab, rowtab, aggtab = plan
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return _rotate_jit(src_chw, jnp.asarray(coltab), jnp.asarray(rowtab),
                       jnp.asarray(aggtab), interpret=bool(interpret),
                       **statics)
