"""Pallas TPU kernel: CFA-aware scaled demosaic fused with the develop chain.

The reference develops thumbnails by fusing demosaic with downscale
(/root/reference/src/scaling.rs:132-145 via demosaic.rs:47-50): each output
pixel averages a CFA-aware source window with paraboloid weights
(scaling.rs:104-118), so full-resolution RGB is never materialized. Round 2
served this path with an XLA formulation whose one-hot column selection ran
over the FULL sensor width -- a 35x device-time inversion vs the full-size
megakernel (323 source-MP/s vs ~11k). This kernel restructures the same math
tile-locally:

  * the output is tiled [TH, 128]; each tile's contiguous source window
    ([D_y, D_x], bounded statically by the scale) is DMA'd HBM->VMEM,
    double-buffered against compute -- selection FLOPs now scale with the
    window, not the sensor width;
  * sample gathers become two chained one-hot matmuls on the MXU
    (rows then columns, all K_y x K_x window offsets batched into one
    [K_y*TH, D_y] x [D_y, D_x] and one [K_y*TH, D_x] x [D_x, K_x*128] pair).
    Selection is bit-exact: u16 planes split into hi/lo bytes (each <= 255,
    exactly representable in bf16; every one-hot column has at most one hot)
    -- two native-rate bf16 passes; f32 planes use the 3-term bf16 split
    (the rotate kernel's trick). Levels ((v-black)/range min 1) apply AFTER
    selection -- selection is a permutation, so any elementwise transform
    commutes with it;
  * window geometry, paraboloid weights, per-offset CFA colors, and count
    denominators are host-precomputed numpy-f32 tables streamed per tile
    (W/COL/CNT below). This sidesteps the documented FMA trap (index math
    feeding floor() must be host-side two-rounding f32) and the sublane/lane
    table-orientation gymnastics in one move; the tables are geometry-only,
    cached per shape class, and their HBM traffic (~source-plane-sized:
    K_off * nh * nw ~= H * W) streams at ~0.3 ms/24MP;
  * the per-tile RGBE planes then run the SAME back-end color chain as the
    full-size megakernel (_finish_tile: WB/matrix/Lab/spline/Lab^-1/gamma/
    quantize), keeping one device form of every transcendental (the <=1 LSB
    cross-path contract requires identical exp/log shapes).

Accumulation order matches scaling._transform_aligned_impl (ky outer, kx
inner, sums[c] += (v*w)*mask sequentially), so outputs agree with the XLA
scaled path within the cross-path contract (<=1 LSB, small flip fraction
from FMA placement).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..raw import CFA

__all__ = ["scaled_plan_for", "develop_scaled", "develop_scaled_batch",
           "stage_scaled_np", "staged_scaled_cached"]

_f32 = np.float32

TC = 128                 # output tile cols (lane width)
_MAX_K = 16              # max window span per axis served by this kernel
_VMEM_BUDGET = 11 * 1024 * 1024


def _align(v: int, m: int) -> int:
    return -(-int(v) // m) * m


from ..scaling import sat_floor_np as _sat_np  # shared two-rounding helper


class ScaledPlan:
    """Host-side geometry plan for one (H, W) -> (nh, nw) CFA class."""

    def __init__(self, **kw):
        self.__dict__.update(kw)


# Geometry tables are pure functions of the shape class; keep the last few.
_GEOM_CACHE: dict = {}


def scaled_supported(plan) -> bool:
    """Cheap support probe: 1-D window math only -- building the full
    geometry tables (~H*W*5 bytes of numpy work) as a side effect of a
    routing predicate would penalize every XLA-routed thumbnail plan."""
    if plan.mode != "cfa" or plan.dem_path != "scaled":
        return False
    H, W = plan.height, plan.width
    nh, nw = plan.dem_h, plan.dem_w
    if nh <= 1 or nw <= 1:
        return False
    key = (H, W, nh, nw, plan.cfa_name)
    if key in _GEOM_CACHE:
        return True
    probe = _build_geometry(plan, probe_only=True)
    return probe is not None


def scaled_plan_for(plan):
    """ScaledPlan for a dem_path=='scaled' DevelopPlan, or None when the
    geometry falls outside this kernel's envelope (caller falls back to the
    XLA scaled path)."""
    if plan.mode != "cfa" or plan.dem_path != "scaled":
        return None
    H, W = plan.height, plan.width
    nh, nw = plan.dem_h, plan.dem_w
    if nh <= 1 or nw <= 1:
        return None
    key = (H, W, nh, nw, plan.cfa_name)
    hit = _GEOM_CACHE.get(key)
    if hit is not None:
        return hit
    sp = _build_geometry(plan)
    if sp is not None:
        if len(_GEOM_CACHE) >= 4:
            _GEOM_CACHE.pop(next(iter(_GEOM_CACHE)))
        _GEOM_CACHE[key] = sp
    return sp


def _build_geometry(plan, probe_only: bool = False):
    H, W = plan.height, plan.width
    nh, nw = plan.dem_h, plan.dem_w
    cfa = CFA(plan.cfa_name)
    pat = cfa.pattern
    ph, pw = pat.shape

    # f32 two-rounding index tables, exactly as scaling._transform_aligned_impl
    # (which is oracle-pinned): tl = (0, 0), topright = (W-1, 0),
    # bottomleft = (0, H-1).
    sxx = _f32(_f32(W - 1) / _f32(nw - 1))
    syy = _f32(_f32(H - 1) / _f32(nh - 1))
    nw_pad = _align(nw, TC)
    cols = np.minimum(np.arange(nw_pad), nw - 1).astype(_f32)
    from_x = _sat_np(sxx * cols, W - 1)
    to_x = _sat_np(sxx * (cols + _f32(1.0)), W - 1)
    cx = ((_f32(0.0) - _f32(0.5)) + sxx * cols) + (sxx / _f32(2.0))
    K_x = int((to_x - from_x).max()) + 1

    def rows_for(nh_pad):
        rows = np.minimum(np.arange(nh_pad), nh - 1).astype(_f32)
        from_y = _sat_np(syy * rows, H - 1)
        to_y = _sat_np(syy * (rows + _f32(1.0)), H - 1)
        cy = (syy * rows + (syy / _f32(2.0))) - _f32(0.5)
        return from_y, to_y, cy

    from_y1, to_y1, _ = rows_for(nh)
    K_y = int((to_y1 - from_y1).max()) + 1
    if K_x > _MAX_K or K_y > _MAX_K:
        # Deep scales (small previews from big sensors) go through the
        # kx-chunked variant; beyond ITS envelope the XLA path serves.
        return _build_geometry_chunked(plan, probe_only=probe_only)
    K_off = K_y * K_x

    # Column windows are shared by every TH choice.
    rx0 = None
    for TH in (64, 32, 16):
        nh_pad = _align(nh, TH)
        ntr = nh_pad // TH
        ntc = nw_pad // TC
        from_y, to_y, cy = rows_for(nh_pad)
        ry0 = (from_y[np.arange(ntr) * TH] // 8) * 8
        last_y = from_y[np.minimum((np.arange(ntr) + 1) * TH - 1, nh_pad - 1)]
        D_y = _align(int((last_y + K_y - ry0).max()), 32)
        rx0 = (from_x[np.arange(ntc) * TC] // 128) * 128
        last_x = from_x[np.minimum((np.arange(ntc) + 1) * TC - 1, nw_pad - 1)]
        D_x = _align(int((last_x + K_x - rx0).max()), 128)
        KyTH = K_y * TH
        KxTC = K_x * TC
        est = (2 * D_y * D_x * 2          # window double-buffer (u16)
               + 3 * D_y * D_x * 2        # value-part planes (bf16)
               + 2 * KyTH * D_y * 2       # ohy block (pipelined)
               + 2 * D_x * KxTC * 2       # ohx block (pipelined)
               + 3 * KyTH * D_x * 2       # row-selected parts (bf16)
               + 2 * KyTH * KxTC * 4      # col-selected values (f32)
               + 2 * K_off * TH * TC * 5  # W + COL blocks (pipelined)
               + 2 * 4 * TH * TC * 4      # CNT block
               + 6 * TH * TC * 2)
        if est <= _VMEM_BUDGET:
            break
    else:
        return None

    if probe_only:
        return True      # envelope fits; tables built lazily on first use

    Hp = int(ry0.max()) + D_y
    Wp = int(rx0.max()) + D_x

    # One-hot selectors (bf16). ohy[i, ky*TH+r, s] hot at the window row of
    # output row i*TH+r, offset ky; ohx[j, s, kx*TC+c] likewise for columns.
    r_idx = np.arange(nh_pad)
    hot_y = (from_y[r_idx].reshape(ntr, 1, TH)
             + np.arange(K_y).reshape(1, K_y, 1)
             - ry0.reshape(ntr, 1, 1)).reshape(ntr, KyTH)
    ohy = np.zeros((ntr, KyTH, D_y), np.float32)
    np.put_along_axis(ohy, hot_y[:, :, None], 1.0, axis=2)
    c_idx = np.arange(nw_pad)
    hot_x = (from_x[c_idx].reshape(ntc, 1, TC)
             + np.arange(K_x).reshape(1, K_x, 1)
             - rx0.reshape(ntc, 1, 1)).reshape(ntc, KxTC)
    ohx = np.zeros((ntc, KxTC, D_x), np.float32)
    np.put_along_axis(ohx, hot_x[:, :, None], 1.0, axis=2)
    ohx = np.swapaxes(ohx, 1, 2).copy()           # [ntc, D_x, KxTC]

    # Per-offset weights / colors and the count denominators, in the
    # reference's f32 arithmetic and accumulation order (ky outer, kx inner).
    w_off = np.zeros((K_off, nh_pad, nw_pad), np.float32)
    col_off = np.zeros((K_off, nh_pad, nw_pad), np.uint8)
    cnt = np.zeros((4, nh_pad, nw_pad), np.float32)
    for ky in range(K_y):
        y = np.minimum(from_y + ky, H - 1)
        valid_y = (from_y + ky) <= to_y
        dy = (y.astype(_f32) - cy) / syy
        dy2 = (dy * dy).astype(_f32)
        ym = (y % ph).astype(np.int64)
        for kx in range(K_x):
            x = np.minimum(from_x + kx, W - 1)
            valid_x = (from_x + kx) <= to_x
            dx = (x.astype(_f32) - cx) / sxx
            factor = (_f32(1.0) - (dx * dx).astype(_f32))[None, :] - dy2[:, None]
            factor = np.where(factor < 0.0, _f32(0.0), factor).astype(_f32)
            w = np.where(valid_y[:, None] & valid_x[None, :], factor,
                         _f32(0.0)).astype(_f32)
            koff = ky * K_x + kx
            w_off[koff] = w
            color = pat[np.ix_(ym, (x % pw).astype(np.int64))].astype(np.uint8)
            col_off[koff] = color
            for c in range(4):
                cnt[c] += w * (color == c).astype(_f32)

    statics = dict(TH=TH, K_x=K_x, K_y=K_y, D_y=D_y, D_x=D_x, Hp=Hp, Wp=Wp,
                   ntr=ntr, ntc=ntc, nh=nh, nw=nw)
    orig = np.zeros((max(ntr, ntc), 8), np.int32)
    orig[:ntr, 0] = ry0
    orig[:ntc, 1] = rx0
    # One-hots stored bf16 (0/1 exact): halves their HBM traffic and VMEM.
    import ml_dtypes

    bf16 = ml_dtypes.bfloat16
    return ScaledPlan(
        statics=statics, ohy=ohy.astype(bf16), ohx=ohx.astype(bf16),
        w_off=w_off, col_off=col_off, cnt=cnt, orig=orig,
        H=H, W=W)


# Deep-scale variant (VERDICT r3 item 8): below ~600px output from 24MP
# the window span K exceeds _MAX_K and the single-pass blocks (ohx is
# [D_x, K_x*TC]) blow the VMEM budget. The chunked form keeps the output
# tiling but iterates the kx offsets in chunks of CKX inside the kernel:
# row selection runs ONCE into a bf16 scratch (exact -- every selected
# value is a bf16-exact part), then the column one-hots and the chunk's
# weight/color blocks stream from HBM with manual double-buffered DMAs
# while f32 sums accumulate across chunks. Summation groups by kx-chunk
# (vs the reference's ky-outer order) which moves f32 ULPs only -- held
# to the same <=1 LSB oracle contract as every cross-path comparison.
_MAX_K_CHUNKED = 40


def _build_geometry_chunked(plan, probe_only: bool = False):
    H, W = plan.height, plan.width
    nh, nw = plan.dem_h, plan.dem_w
    cfa = CFA(plan.cfa_name)
    pat = cfa.pattern
    ph, pw = pat.shape

    sxx = _f32(_f32(W - 1) / _f32(nw - 1))
    syy = _f32(_f32(H - 1) / _f32(nh - 1))
    nw_pad = _align(nw, TC)
    cols = np.minimum(np.arange(nw_pad), nw - 1).astype(_f32)
    from_x = _sat_np(sxx * cols, W - 1)
    to_x = _sat_np(sxx * (cols + _f32(1.0)), W - 1)
    cx = ((_f32(0.0) - _f32(0.5)) + sxx * cols) + (sxx / _f32(2.0))
    K_x = int((to_x - from_x).max()) + 1

    def rows_for(nh_pad):
        rows = np.minimum(np.arange(nh_pad), nh - 1).astype(_f32)
        from_y = _sat_np(syy * rows, H - 1)
        to_y = _sat_np(syy * (rows + _f32(1.0)), H - 1)
        cy = (syy * rows + (syy / _f32(2.0))) - _f32(0.5)
        return from_y, to_y, cy

    from_y1, to_y1, _ = rows_for(nh)
    K_y = int((to_y1 - from_y1).max()) + 1
    if K_x > _MAX_K_CHUNKED or K_y > _MAX_K_CHUNKED:
        return None

    found = None
    for TH in (16, 8):
        nh_pad = _align(nh, TH)
        ntr = nh_pad // TH
        ntc = nw_pad // TC
        from_y, to_y, cy = rows_for(nh_pad)
        ry0 = (from_y[np.arange(ntr) * TH] // 8) * 8
        last_y = from_y[np.minimum((np.arange(ntr) + 1) * TH - 1, nh_pad - 1)]
        D_y = _align(int((last_y + K_y - ry0).max()), 32)
        rx0 = (from_x[np.arange(ntc) * TC] // 128) * 128
        last_x = from_x[np.minimum((np.arange(ntc) + 1) * TC - 1, nw_pad - 1)]
        D_x = _align(int((last_x + K_x - rx0).max()), 128)
        KyTH = K_y * TH
        for CKX in (4, 2, 1):
            est = (2 * D_y * D_x * 2          # window double-buffer (u16)
                   + 3 * KyTH * D_x * 2       # t1 scratch (bf16, <=3 parts)
                   + D_y * D_x * 2            # one value-part transient
                   + 2 * D_x * CKX * TC * 2   # ohx chunk double-buffer
                   + 2 * K_y * CKX * TH * TC * 5   # W+COL chunk buffers
                   + KyTH * CKX * TC * 4      # col-selected chunk (f32)
                   + 12 * TH * TC * 4)        # sums/cnt/outs
            if est <= _VMEM_BUDGET:
                found = (TH, CKX)
                break
        if found:
            break
    if found is None:
        return None
    if probe_only:
        return True
    TH, CKX = found
    nh_pad = _align(nh, TH)
    ntr = nh_pad // TH
    ntc = nw_pad // TC
    from_y, to_y, cy = rows_for(nh_pad)
    ry0 = (from_y[np.arange(ntr) * TH] // 8) * 8
    last_y = from_y[np.minimum((np.arange(ntr) + 1) * TH - 1, nh_pad - 1)]
    D_y = _align(int((last_y + K_y - ry0).max()), 32)
    rx0 = (from_x[np.arange(ntc) * TC] // 128) * 128
    last_x = from_x[np.minimum((np.arange(ntc) + 1) * TC - 1, nw_pad - 1)]
    D_x = _align(int((last_x + K_x - rx0).max()), 128)
    KyTH = K_y * TH
    nkx = -(-K_x // CKX)
    K_x_pad = nkx * CKX      # padded offsets get no hot + zero weight

    Hp = int(ry0.max()) + D_y
    Wp = int(rx0.max()) + D_x

    r_idx = np.arange(nh_pad)
    hot_y = (from_y[r_idx].reshape(ntr, 1, TH)
             + np.arange(K_y).reshape(1, K_y, 1)
             - ry0.reshape(ntr, 1, 1)).reshape(ntr, KyTH)
    ohy = np.zeros((ntr, KyTH, D_y), np.float32)
    np.put_along_axis(ohy, hot_y[:, :, None], 1.0, axis=2)

    c_idx = np.arange(nw_pad)
    hot_x = (from_x[c_idx].reshape(ntc, 1, TC)
             + np.arange(K_x).reshape(1, K_x, 1)
             - rx0.reshape(ntc, 1, 1)).reshape(ntc, K_x * TC)
    ohx = np.zeros((ntc, K_x_pad * TC, D_x), np.float32)
    np.put_along_axis(ohx[:, :K_x * TC, :], hot_x[:, :, None], 1.0, axis=2)
    ohx = np.swapaxes(ohx, 1, 2).copy()           # [ntc, D_x, K_x_pad*TC]

    # W/COL in chunk-major layout: [nkx, K_y*CKX, nh_pad, nw_pad] so one
    # DMA fetches a chunk's every (ky, dkx) block. CNT is order-free.
    w_off = np.zeros((nkx, K_y * CKX, nh_pad, nw_pad), np.float32)
    col_off = np.zeros((nkx, K_y * CKX, nh_pad, nw_pad), np.uint8)
    cnt = np.zeros((4, nh_pad, nw_pad), np.float32)
    for ky in range(K_y):
        y = np.minimum(from_y + ky, H - 1)
        valid_y = (from_y + ky) <= to_y
        dy = (y.astype(_f32) - cy) / syy
        dy2 = (dy * dy).astype(_f32)
        ym = (y % ph).astype(np.int64)
        for kx in range(K_x):
            x = np.minimum(from_x + kx, W - 1)
            valid_x = (from_x + kx) <= to_x
            dx = (x.astype(_f32) - cx) / sxx
            factor = (_f32(1.0) - (dx * dx).astype(_f32))[None, :] - dy2[:, None]
            factor = np.where(factor < 0.0, _f32(0.0), factor).astype(_f32)
            w = np.where(valid_y[:, None] & valid_x[None, :], factor,
                         _f32(0.0)).astype(_f32)
            w_off[kx // CKX, ky * CKX + kx % CKX] = w
            color = pat[np.ix_(ym, (x % pw).astype(np.int64))].astype(np.uint8)
            col_off[kx // CKX, ky * CKX + kx % CKX] = color
            for c in range(4):
                cnt[c] += w * (color == c).astype(_f32)

    statics = dict(TH=TH, K_x=K_x_pad, K_y=K_y, D_y=D_y, D_x=D_x, Hp=Hp,
                   Wp=Wp, ntr=ntr, ntc=ntc, nh=nh, nw=nw, chunked=True,
                   CKX=CKX, nkx=nkx)
    orig = np.zeros((max(ntr, ntc), 8), np.int32)
    orig[:ntr, 0] = ry0
    orig[:ntc, 1] = rx0
    import ml_dtypes

    bf16 = ml_dtypes.bfloat16
    return ScaledPlan(
        statics=statics, ohy=ohy.astype(bf16), ohx=ohx.astype(bf16),
        w_off=w_off, col_off=col_off, cnt=cnt, orig=orig, H=H, W=W)


def _scaled_kernel(scal_ref, spline_ref, orig_ref, plane_hbm, ohy_ref,
                   ohx_ref, w_ref, col_ref, cnt_ref, r_ref, g_ref, b_ref,
                   win_ref, dma_sems, *, TH, K_x, K_y, D_y, D_x, Hp, Wp,
                   ntr, ntc, nh, nw, in_f32, apply_curve, n_knots, linear,
                   out_bits, orientation_flips, stage_limit=4,
                   batched=False):
    from .develop_pallas import _finish_tile

    f = jnp.float32
    if batched:
        # Batch folded into the grid (see develop_pallas._develop_kernel):
        # plane_hbm is [B,Hp,Wp]; scal/spline arrive per-image via blocked
        # SMEM specs; geometry tables are shared across the batch.
        j = pl.program_id(1)    # column tiles outer within each image
        i = pl.program_id(2)
        step = (pl.program_id(0) * ntc + j) * ntr + i
        nsteps = pl.num_programs(0) * ntr * ntc
    else:
        j = pl.program_id(0)    # column tiles OUTER so ohx streams once per j
        i = pl.program_id(1)
        step = j * ntr + i
        nsteps = ntr * ntc
    KyTH = K_y * TH
    del nh, nw, orientation_flips  # flips applied by the jit wrapper

    def origin(s):
        jj = (s // ntr) % ntc if batched else s // ntr
        ii = s % ntr
        # clip(v // unit) * unit with the multiply LAST: Mosaic must prove
        # the DMA offsets are 8/128-multiples statically.
        ry = jnp.clip(orig_ref[ii, 0] // 8, 0, (Hp - D_y) // 8) * 8
        rx = jnp.clip(orig_ref[jj, 1] // 128, 0, (Wp - D_x) // 128) * 128
        return ry, rx

    def start_dma(s, slot):
        ry, rx = origin(s)
        src = (plane_hbm.at[s // (ntr * ntc), pl.ds(ry, D_y), pl.ds(rx, D_x)]
               if batched else plane_hbm.at[pl.ds(ry, D_y), pl.ds(rx, D_x)])
        return pltpu.make_async_copy(src, win_ref.at[slot],
                                     dma_sems.at[slot])

    @pl.when(step == 0)
    def _():
        start_dma(0, 0).start()

    @pl.when(step + 1 < nsteps)
    def _():
        start_dma(step + 1, (step + 1) % 2).start()

    start_dma(step, step % 2).wait()
    win = win_ref[step % 2]

    # Exact selection parts: u16 -> hi/lo bytes (ints <= 255, bf16-exact);
    # f32 -> 3-term bf16 split (hi+mid+lo reconstructs every f32 exactly).
    if in_f32:
        hi = win.astype(jnp.bfloat16)
        r1 = win - hi.astype(f)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(f)).astype(jnp.bfloat16)
        parts = (hi, mid, lo)
        scales = (1.0, 1.0, 1.0)
    else:
        w32 = win.astype(jnp.int32)          # Mosaic has no u16->f32 cast
        hi32 = w32 // 256
        lo32 = w32 - hi32 * 256
        parts = (hi32.astype(f).astype(jnp.bfloat16),
                 lo32.astype(f).astype(jnp.bfloat16))
        scales = (256.0, 1.0)

    ohy = ohy_ref[0]            # [KyTH, D_y] bf16-valued f32 table -> bf16
    ohx = ohx_ref[0]            # [D_x, KxTC]
    ohy_bf = ohy.astype(jnp.bfloat16)
    ohx_bf = ohx.astype(jnp.bfloat16)

    vraw = None
    for part, scale in zip(parts, scales):
        t1 = jax.lax.dot_general(
            ohy_bf, part, (((1,), (0,)), ((), ())),
            preferred_element_type=f)                     # [KyTH, D_x]
        t2 = jax.lax.dot_general(
            t1.astype(jnp.bfloat16), ohx_bf, (((1,), (0,)), ((), ())),
            preferred_element_type=f)                     # [KyTH, KxTC]
        contrib = t2 * scale if scale != 1.0 else t2
        vraw = contrib if vraw is None else vraw + contrib

    # gofloat levels post-selection (selection is a permutation, so the
    # elementwise transform commutes; gofloat.rs:122-130 semantics).
    black = scal_ref[0, 0]
    rng = scal_ref[0, 1]
    v = jnp.minimum((vraw - black) / rng, 1.0)            # [KyTH, KxTC]

    sums = [jnp.zeros((TH, TC), f) for _ in range(4)]
    for ky in range(K_y):
        vk = v[ky * TH:(ky + 1) * TH, :]
        for kx in range(K_x):
            koff = ky * K_x + kx
            blk = vk[:, kx * TC:(kx + 1) * TC]
            vw = blk * w_ref[koff]
            colv = col_ref[koff].astype(jnp.int32)
            for c in range(4):
                sums[c] = sums[c] + vw * (colv == c).astype(f)

    rgbe = [jnp.where(cnt_ref[c] > 0.0, sums[c] / cnt_ref[c], 0.0)
            for c in range(4)]
    _finish_tile(rgbe, scal_ref, spline_ref, r_ref, g_ref, b_ref,
                 apply_curve=apply_curve, n_knots=n_knots, linear=linear,
                 out_bits=out_bits, stage_limit=stage_limit)


def _scaled_kernel_chunked(scal_ref, spline_ref, orig_ref, plane_hbm,
                           ohy_ref, ohx_hbm, w_hbm, col_hbm, cnt_ref,
                           r_ref, g_ref, b_ref,
                           win_ref, t1_ref, ohxbuf, wbuf, colbuf,
                           dma_sems, ox_sems, w_sems, c_sems, *,
                           TH, K_x, K_y, D_y, D_x, Hp, Wp, ntr, ntc, nh, nw,
                           CKX, nkx, in_f32, apply_curve, n_knots, linear,
                           out_bits, orientation_flips, stage_limit=4,
                           batched=False):
    """kx-chunked deep-scale form: see the _build_geometry_chunked note."""
    from .develop_pallas import _finish_tile

    f = jnp.float32
    if batched:
        j = pl.program_id(1)
        i = pl.program_id(2)
        step = (pl.program_id(0) * ntc + j) * ntr + i
        nsteps = pl.num_programs(0) * ntr * ntc
    else:
        j = pl.program_id(0)
        i = pl.program_id(1)
        step = j * ntr + i
        nsteps = ntr * ntc
    KyTH = K_y * TH
    del nh, nw, orientation_flips, K_x

    def origin(s):
        jj = (s // ntr) % ntc if batched else s // ntr
        ii = s % ntr
        ry = jnp.clip(orig_ref[ii, 0] // 8, 0, (Hp - D_y) // 8) * 8
        rx = jnp.clip(orig_ref[jj, 1] // 128, 0, (Wp - D_x) // 128) * 128
        return ry, rx

    def start_dma(s, slot):
        ry, rx = origin(s)
        src = (plane_hbm.at[s // (ntr * ntc), pl.ds(ry, D_y), pl.ds(rx, D_x)]
               if batched else plane_hbm.at[pl.ds(ry, D_y), pl.ds(rx, D_x)])
        return pltpu.make_async_copy(src, win_ref.at[slot],
                                     dma_sems.at[slot])

    def chunk_copies(kxc, slot):
        # This chunk's column one-hots + weight/color blocks (HBM->VMEM).
        c0 = kxc * (CKX * TC)
        return [
            pltpu.make_async_copy(ohx_hbm.at[j, :, pl.ds(c0, CKX * TC)],
                                  ohxbuf.at[slot], ox_sems.at[slot]),
            pltpu.make_async_copy(
                w_hbm.at[kxc, :, pl.ds(i * TH, TH), pl.ds(j * TC, TC)],
                wbuf.at[slot], w_sems.at[slot]),
            pltpu.make_async_copy(
                col_hbm.at[kxc, :, pl.ds(i * TH, TH), pl.ds(j * TC, TC)],
                colbuf.at[slot], c_sems.at[slot]),
        ]

    @pl.when(step == 0)
    def _():
        start_dma(0, 0).start()

    @pl.when(step + 1 < nsteps)
    def _():
        start_dma(step + 1, (step + 1) % 2).start()

    # Chunk 0 (+1) stream while the window lands and t1 computes.
    for cp in chunk_copies(0, 0):
        cp.start()
    if nkx > 1:
        for cp in chunk_copies(1, 1):
            cp.start()

    start_dma(step, step % 2).wait()
    win = win_ref[step % 2]

    if in_f32:
        hi = win.astype(jnp.bfloat16)
        r1 = win - hi.astype(f)
        mid = r1.astype(jnp.bfloat16)
        lo = (r1 - mid.astype(f)).astype(jnp.bfloat16)
        parts = (hi, mid, lo)
        scales = (1.0, 1.0, 1.0)
    else:
        w32 = win.astype(jnp.int32)
        hi32 = w32 // 256
        lo32 = w32 - hi32 * 256
        parts = (hi32.astype(f).astype(jnp.bfloat16),
                 lo32.astype(f).astype(jnp.bfloat16))
        scales = (256.0, 1.0)

    # Row selection once per tile into bf16 scratch: every selected value
    # is a bf16-exact part, so the store loses nothing.
    ohy_bf = ohy_ref[0].astype(jnp.bfloat16)
    for p, part in enumerate(parts):
        t1_ref[p] = jax.lax.dot_general(
            ohy_bf, part, (((1,), (0,)), ((), ())),
            preferred_element_type=f).astype(jnp.bfloat16)

    black = scal_ref[0, 0]
    rng = scal_ref[0, 1]
    sums = [jnp.zeros((TH, TC), f) for _ in range(4)]
    for kxc in range(nkx):
        slot = kxc % 2
        for cp in chunk_copies(kxc, slot):
            cp.wait()
        ohx_bf = ohxbuf[slot]
        vraw = None
        for p, scale in enumerate(scales):
            tp = jax.lax.dot_general(
                t1_ref[p], ohx_bf, (((1,), (0,)), ((), ())),
                preferred_element_type=f)               # [KyTH, CKX*TC]
            tp = tp * scale if scale != 1.0 else tp
            vraw = tp if vraw is None else vraw + tp
        v = jnp.minimum((vraw - black) / rng, 1.0)
        wblk = wbuf[slot]
        colblk = colbuf[slot]
        for ky in range(K_y):
            vk = v[ky * TH:(ky + 1) * TH, :]
            for dkx in range(CKX):
                koff = ky * CKX + dkx
                blk = vk[:, dkx * TC:(dkx + 1) * TC]
                vw = blk * wblk[koff]
                cv = colblk[koff].astype(jnp.int32)
                for c in range(4):
                    sums[c] = sums[c] + vw * (cv == c).astype(f)
        if kxc + 2 < nkx:
            for cp in chunk_copies(kxc + 2, slot):
                cp.start()

    rgbe = [jnp.where(cnt_ref[c] > 0.0, sums[c] / cnt_ref[c], 0.0)
            for c in range(4)]
    _finish_tile(rgbe, scal_ref, spline_ref, r_ref, g_ref, b_ref,
                 apply_curve=apply_curve, n_knots=n_knots, linear=linear,
                 out_bits=out_bits, stage_limit=stage_limit)


def _scaled_pallas_call(plane_padded, ohy, ohx, w_off, col_off, cnt, orig,
                        scal, spline, *, batched, TH, K_x, K_y, D_y, D_x,
                        Hp, Wp, ntr, ntc, nh, nw, in_f32, apply_curve,
                        n_knots, linear, out_bits, orientation_flips,
                        interpret, stage_limit, chunked=False, CKX=1,
                        nkx=1):
    """Shared pallas_call scaffolding for the per-image and grid-batched
    forms: they differ only in grid shape, the batch index in the DMA/
    calibration specs, and the output leading dim."""
    from .develop_pallas import apply_flips

    K_off = K_y * K_x
    KyTH = K_y * TH
    KxTC = K_x * TC
    out_dtype = jnp.uint8 if out_bits == 8 else jnp.uint16
    if chunked:
        kernel = partial(
            _scaled_kernel_chunked, TH=TH, K_x=K_x, K_y=K_y, D_y=D_y,
            D_x=D_x, Hp=Hp, Wp=Wp, ntr=ntr, ntc=ntc, nh=nh, nw=nw,
            CKX=CKX, nkx=nkx, in_f32=in_f32, apply_curve=apply_curve,
            n_knots=n_knots, linear=linear, out_bits=out_bits,
            orientation_flips=orientation_flips, stage_limit=stage_limit,
            batched=batched)
    else:
        kernel = partial(
            _scaled_kernel, TH=TH, K_x=K_x, K_y=K_y, D_y=D_y, D_x=D_x, Hp=Hp,
            Wp=Wp, ntr=ntr, ntc=ntc, nh=nh, nw=nw, in_f32=in_f32,
            apply_curve=apply_curve, n_knots=n_knots, linear=linear,
            out_bits=out_bits, orientation_flips=orientation_flips,
            stage_limit=stage_limit, batched=batched)

    # Index maps written once over (j, i); the batched grid prepends b.
    def imap(f):
        return f if not batched else (lambda b, j, i: f(j, i))

    if batched:
        B = plane_padded.shape[0]
        grid = (B, ntc, ntr)   # j outer within each image, as single-image
        scal_spec = pl.BlockSpec((None,) + scal.shape[-2:],
                                 lambda b, j, i: (b, 0, 0),
                                 memory_space=pltpu.SMEM)
        spline_spec = pl.BlockSpec((None,) + spline.shape[-2:],
                                   lambda b, j, i: (b, 0, 0),
                                   memory_space=pltpu.SMEM)
        out_spec = pl.BlockSpec((None, TH, TC), lambda b, j, i: (b, i, j),
                                memory_space=pltpu.VMEM)
        out_shape = (B, nh, nw)
        stack_axis = 1
    else:
        grid = (ntc, ntr)      # j outer: the large ohx block streams once/j
        scal_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        spline_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
        out_spec = pl.BlockSpec((TH, TC), lambda j, i: (i, j),
                                memory_space=pltpu.VMEM)
        out_shape = (nh, nw)
        stack_axis = 0

    if chunked:
        nparts = 3 if in_f32 else 2
        in_specs = [
            scal_spec,                               # scal [(B,)8,16]
            spline_spec,                             # spline [(B,)5,16]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # DMA origins (shared)
            pl.BlockSpec(memory_space=pltpu.ANY),    # padded plane(s) (HBM)
            pl.BlockSpec((1, KyTH, D_y), imap(lambda j, i: (i, 0, 0)),
                         memory_space=pltpu.VMEM),   # ohy
            pl.BlockSpec(memory_space=pltpu.ANY),    # ohx (HBM, chunk DMAs)
            pl.BlockSpec(memory_space=pltpu.ANY),    # W   (HBM, chunk DMAs)
            pl.BlockSpec(memory_space=pltpu.ANY),    # COL (HBM, chunk DMAs)
            pl.BlockSpec((4, TH, TC), imap(lambda j, i: (0, i, j)),
                         memory_space=pltpu.VMEM),   # CNT
        ]
        scratch_shapes = [
            pltpu.VMEM((2, D_y, D_x), plane_padded.dtype),   # window dbuf
            pltpu.VMEM((nparts, KyTH, D_x), jnp.bfloat16),   # t1 parts
            pltpu.VMEM((2, D_x, CKX * TC), ohx.dtype),       # ohx chunks
            pltpu.VMEM((2, K_y * CKX, TH, TC), jnp.float32),  # W chunks
            pltpu.VMEM((2, K_y * CKX, TH, TC), jnp.uint8),   # COL chunks
            pltpu.SemaphoreType.DMA((2,)),                   # window
            pltpu.SemaphoreType.DMA((2,)),                   # ohx
            pltpu.SemaphoreType.DMA((2,)),                   # W
            pltpu.SemaphoreType.DMA((2,)),                   # COL
        ]
    else:
        in_specs = [
            scal_spec,                               # scal [(B,)8,16]
            spline_spec,                             # spline [(B,)5,16]
            pl.BlockSpec(memory_space=pltpu.SMEM),   # DMA origins (shared)
            pl.BlockSpec(memory_space=pltpu.ANY),    # padded plane(s) (HBM)
            pl.BlockSpec((1, KyTH, D_y), imap(lambda j, i: (i, 0, 0)),
                         memory_space=pltpu.VMEM),   # ohy
            pl.BlockSpec((1, D_x, KxTC), imap(lambda j, i: (j, 0, 0)),
                         memory_space=pltpu.VMEM),   # ohx
            pl.BlockSpec((K_off, TH, TC), imap(lambda j, i: (0, i, j)),
                         memory_space=pltpu.VMEM),   # W
            pl.BlockSpec((K_off, TH, TC), imap(lambda j, i: (0, i, j)),
                         memory_space=pltpu.VMEM),   # COL
            pl.BlockSpec((4, TH, TC), imap(lambda j, i: (0, i, j)),
                         memory_space=pltpu.VMEM),   # CNT
        ]
        scratch_shapes = [
            pltpu.VMEM((2, D_y, D_x), plane_padded.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ]

    r, g, b = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[out_spec] * 3,
        out_shape=[jax.ShapeDtypeStruct(out_shape, out_dtype)] * 3,
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(scal, spline, orig, plane_padded, ohy, ohx, w_off, col_off, cnt)
    return apply_flips(jnp.stack([r, g, b], axis=stack_axis),
                       orientation_flips)


@partial(jax.jit, static_argnames=(
    "TH", "K_x", "K_y", "D_y", "D_x", "Hp", "Wp", "ntr", "ntc", "nh", "nw",
    "in_f32", "apply_curve", "n_knots", "linear", "out_bits",
    "orientation_flips", "interpret", "stage_limit", "chunked", "CKX",
    "nkx"))
def _develop_scaled_jit(plane_padded, ohy, ohx, w_off, col_off, cnt, orig,
                        scal, spline, *, TH, K_x, K_y, D_y, D_x, Hp, Wp,
                        ntr, ntc, nh, nw, in_f32, apply_curve, n_knots,
                        linear, out_bits, orientation_flips, interpret,
                        stage_limit=4, chunked=False, CKX=1, nkx=1):
    return _scaled_pallas_call(
        plane_padded, ohy, ohx, w_off, col_off, cnt, orig, scal, spline,
        batched=False, TH=TH, K_x=K_x, K_y=K_y, D_y=D_y, D_x=D_x, Hp=Hp,
        Wp=Wp, ntr=ntr, ntc=ntc, nh=nh, nw=nw, in_f32=in_f32,
        apply_curve=apply_curve, n_knots=n_knots, linear=linear,
        out_bits=out_bits, orientation_flips=orientation_flips,
        interpret=interpret, stage_limit=stage_limit, chunked=chunked,
        CKX=CKX, nkx=nkx)


def stage_scaled_np(plan, plane, sp: ScaledPlan) -> np.ndarray:
    """Host-side staging: crop + zero-pad one sensor plane to [Hp, Wp].
    Crop offsets come from the PLAN, not the cached geometry: ScaledPlans
    are shared across plans whose cropped dims and CFA phase match, and
    those may sit at different sensor offsets."""
    plane = np.asarray(plane)
    plane = plane[plan.crop_y:plan.crop_y + sp.H,
                  plan.crop_x:plan.crop_x + sp.W]
    st = sp.statics
    return np.pad(plane, ((0, st["Hp"] - sp.H), (0, st["Wp"] - sp.W)))


def staged_scaled_cached(plan, raw, sp: ScaledPlan):
    """Staged+uploaded plane cached on the RawImage (interactive re-renders
    must not re-pad/re-upload per develop; mirrors staged_plane_cached)."""
    st = sp.statics
    key = ("scaled", plan.crop_y, plan.crop_x, sp.H, sp.W,
           st["Hp"], st["Wp"])
    hit = getattr(raw, "_pallas_staged_scaled", None)
    if hit is not None and hit[0] == key:
        return hit[1]
    dev = jnp.asarray(stage_scaled_np(plan, raw.data, sp))
    try:
        raw._pallas_staged_scaled = (key, dev)
    except AttributeError:
        pass
    return dev


def _tables_device(sp: ScaledPlan):
    """Device-resident geometry tables, uploaded ONCE per plan: W/COL/CNT
    total ~K_off*nh*nw*5 ~= H*W*5 bytes (~190MB for 24MP) -- re-uploading
    per develop would dominate everything (and costs seconds through the
    dev tunnel). Also keeps the jit cache hitting on identical arrays."""
    dev = getattr(sp, "_dev_tables", None)
    if dev is None:
        dev = (jnp.asarray(sp.ohy), jnp.asarray(sp.ohx),
               jnp.asarray(sp.w_off), jnp.asarray(sp.col_off),
               jnp.asarray(sp.cnt), jnp.asarray(sp.orig))
        sp._dev_tables = dev
    return dev


def _statics_for(plan, sp: ScaledPlan, plane_dtype, interpret):
    """Static config dict for the scaled-kernel jit (no table uploads --
    callers that need scal/spline fetch them via calib_tables[_device])."""
    st = dict(sp.statics)
    st.update(in_f32=(np.dtype(plane_dtype) != np.dtype(np.uint16)),
              apply_curve=plan.apply_curve,
              n_knots=plan.n_knots if plan.apply_curve else 0,
              linear=plan.linear, out_bits=plan.out_bits,
              orientation_flips=tuple(plan.orientation_flips),
              interpret=interpret)
    return st


def develop_scaled(plan, plane, interpret: bool = False, staged: bool = False,
                   sp: ScaledPlan | None = None, stage_limit: int = 4):
    """Develop one sensor plane through the fused scaled-demosaic kernel.
    plane: [H0, W0] raw counts (or the stage_scaled_np output when
    staged=True). Returns planar [3, nh, nw] quantized."""
    from .develop_pallas import calib_tables_device

    sp = sp if sp is not None else scaled_plan_for(plan)
    assert sp is not None, "unsupported plan for the scaled pallas executor"
    scal, spline, _ = calib_tables_device(plan)
    st = _statics_for(plan, sp, plane.dtype, interpret)
    if not staged:
        plane = stage_scaled_np(plan, np.asarray(plane), sp)
    tabs = _tables_device(sp)
    return _develop_scaled_jit(
        jnp.asarray(plane), *tabs, jnp.asarray(scal), jnp.asarray(spline),
        stage_limit=stage_limit, **st)


@partial(jax.jit, static_argnames=("statics_key", "per_image", "interpret"))
def _develop_scaled_batch_jit(planes, ohy, ohx, w_off, col_off, cnt, orig,
                              scal, spline, *, statics_key, per_image,
                              interpret):
    st = dict(statics_key)
    outs = []
    for b in range(planes.shape[0]):
        s = scal[b] if per_image else scal
        spl = spline[b] if per_image else spline
        outs.append(_develop_scaled_jit(
            planes[b], ohy, ohx, w_off, col_off, cnt, orig, s, spl,
            interpret=interpret, **st))
    return jnp.stack(outs, axis=0)


@partial(jax.jit, static_argnames=(
    "TH", "K_x", "K_y", "D_y", "D_x", "Hp", "Wp", "ntr", "ntc", "nh", "nw",
    "in_f32", "apply_curve", "n_knots", "linear", "out_bits",
    "orientation_flips", "interpret", "stage_limit", "chunked", "CKX",
    "nkx"))
def _develop_scaled_batchgrid_jit(planes_padded, ohy, ohx, w_off, col_off,
                                  cnt, orig, scal, spline, *, TH, K_x, K_y,
                                  D_y, D_x, Hp, Wp, ntr, ntc, nh, nw,
                                  in_f32, apply_curve, n_knots, linear,
                                  out_bits, orientation_flips, interpret,
                                  stage_limit=4, chunked=False, CKX=1,
                                  nkx=1):
    """Batched scaled develop with the batch folded into the Pallas grid:
    ONE pallas_call over [B,Hp,Wp] planes and [B,...] calibration, the
    (shared) geometry tables streamed exactly as in the per-image form."""
    return _scaled_pallas_call(
        planes_padded, ohy, ohx, w_off, col_off, cnt, orig, scal, spline,
        batched=True, TH=TH, K_x=K_x, K_y=K_y, D_y=D_y, D_x=D_x, Hp=Hp,
        Wp=Wp, ntr=ntr, ntc=ntc, nh=nh, nw=nw, in_f32=in_f32,
        apply_curve=apply_curve, n_knots=n_knots, linear=linear,
        out_bits=out_bits, orientation_flips=orientation_flips,
        interpret=interpret, stage_limit=stage_limit, chunked=chunked,
        CKX=CKX, nkx=nkx)


# Batch folded into the Pallas grid vs a loop of per-image kernels.
# Settled by the hardware A/B (scripts/exp_batchgrid.py, v5e 2026-08-18):
# for the SCALED kernel the grid form won every interleaved rep
# (1.00/0.92/1.04 ms/img vs 1.25/1.15/1.25 loop, ~20% — the per-image
# stack/slice overhead dominates this short kernel), so it defaults ON.
# The full-size megakernel's A/B went the other way
# (develop_pallas.BATCH_GRID stays False).
BATCH_GRID = True


def develop_scaled_batch(plan, planes, interpret: bool = False,
                         staged: bool = False, param_plans=None):
    """Batched scaled develop: kernel chained per image inside one jit (one
    dispatch). planes: [B,H0,W0] raw counts or staged [B,Hp,Wp]."""
    sp = scaled_plan_for(plan)
    assert sp is not None, "unsupported plan for the scaled pallas executor"
    if not staged:
        planes = np.stack([stage_scaled_np(plan, np.asarray(p), sp)
                           for p in planes])
    st = _statics_for(plan, sp, planes.dtype, interpret)
    interp = st.pop("interpret")
    per_image = param_plans is not None
    if per_image:
        from .develop_pallas import calib_tables

        tabs = [calib_tables(pp) for pp in param_plans]
        scal = np.stack([t[0] for t in tabs])
        spline = np.stack([t[1] for t in tabs])
    else:
        from .develop_pallas import calib_tables_device

        scal, spline, _ = calib_tables_device(plan)
    tabs_d = _tables_device(sp)
    if BATCH_GRID:
        scal = jnp.asarray(scal)
        spline = jnp.asarray(spline)
        if not per_image:
            B = planes.shape[0]
            scal = jnp.broadcast_to(scal, (B,) + scal.shape)
            spline = jnp.broadcast_to(spline, (B,) + spline.shape)
        return _develop_scaled_batchgrid_jit(
            jnp.asarray(planes), *tabs_d, scal, spline, interpret=interp,
            **st)
    return _develop_scaled_batch_jit(
        jnp.asarray(planes), *tabs_d, jnp.asarray(scal), jnp.asarray(spline),
        statics_key=tuple(sorted(st.items())), per_image=per_image,
        interpret=interp)
