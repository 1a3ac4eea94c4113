"""Pallas TPU megakernel: the entire RAW develop chain in one HBM pass.

The XLA-fused engine (engine.py) still materializes ~8GB of intermediates
for a 24MP frame (each stencil offset and chain stage round-trips HBM). This
kernel streams row tiles through VMEM instead: each grid step reads one
[TILE_H+2, W+2] halo tile of the sensor plane, runs levels -> CFA demosaic
(reference 3x3 neighbor-average semantics, demosaic.rs:67-119) -> WB +
camera matrix + Lab (color_conversions.rs:41-55) -> tone spline -> Lab->RGB
-> gamma -> quantize entirely in registers/VMEM, and writes three u8/u16
output planes. Minimum possible traffic: read the plane once, write the
image once.

Works for any periodic CFA via a precomputed neighbor-color tile row-strip
(period-aligned TILE_H so every grid step sees the same pattern phase).
Numerics: 'direct' mode math (cbrt/pow on the VPU); within the +-1 LSB
contract of the reference (see color.py).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..raw import CFA

__all__ = ["develop_pallas", "pallas_supported"]

_OFFSETS = [(-1, -1), (-1, 0), (-1, 1),
            (0, -1), (0, 0), (0, 1),
            (1, -1), (1, 0), (1, 1)]

_LAB_E = np.float32(np.float32(216.0) / np.float32(24389.0))
_LAB_K = np.float32(np.float32(24389.0) / np.float32(27.0))
_XW, _YW, _ZW = np.float32(0.95047), np.float32(1.0), np.float32(1.08883)


def _tile_h_for(cfa_h: int, out_bits: int) -> int:
    """Tile height: a common multiple of the CFA period and the u8/u16
    sublane tile, sized so the VMEM working set stays comfortable."""
    base = 32 if out_bits == 8 else 16
    th = cfa_h if cfa_h > 0 else 2
    while th % base or th < 96:
        th += cfa_h if cfa_h > 0 else 2
    return th


# DMA windows must be tile-aligned: 8-row sublane halo blocks vertically and
# 128-col lane halo blocks horizontally (only the innermost row/col of each
# halo block is real halo).
HALO = 8
HALO_X = 128
TILE_W = 384  # multiple of 128 lanes and of every CFA period width (2,6,8,12)


def _cmap_strip(cfa: CFA, tile_h: int) -> np.ndarray:
    """[tile_h+2*HALO, TILE_W+2*HALO_X] u8 center-color map. Valid for every
    grid tile because tile_h / TILE_W are multiples of the CFA period:
    scratch cell (r, c) is global (y0 + r - HALO, x0 + c - HALO_X)."""
    ph, pw = cfa.height, cfa.width
    rows = (np.arange(-HALO, tile_h + HALO)) % ph
    cols = (np.arange(-HALO_X, TILE_W + HALO_X)) % pw
    return cfa.pattern[np.ix_(rows, cols)].astype(np.uint8)


def pallas_supported(plan) -> bool:
    return (plan.mode == "cfa"
            and plan.orientation_flips == (False, False, False)
            and (not plan.apply_curve or plan.n_knots <= 16))


def develop_pallas(plan, plane, interpret: bool = False):
    """Develop one sensor plane through the megakernel. plane: [H0,W0] u16/f32
    raw counts (full sensor; plan's crop applied here)."""
    assert pallas_supported(plan), "unsupported plan for the pallas executor"
    import numpy as _np

    h, w = plan.height, plan.width
    cfa = CFA(plan.cfa_name)
    tile_h = _tile_h_for(cfa.height, plan.out_bits)
    grid_rows = -(-h // tile_h)

    plane = jnp.asarray(plane)
    plane = jax.lax.slice(plane, (plan.crop_y, plan.crop_x),
                          (plan.crop_y + h, plan.crop_x + w))
    # Pad: HALO rows / HALO_X cols of halo blocks on top/left (only the
    # innermost row/col is real halo), bottom/right out to the last tile's
    # DMA window.
    grid_cols = -(-w // TILE_W)
    pad_bottom = grid_rows * tile_h + HALO - h
    pad_right = grid_cols * TILE_W + HALO_X - w
    plane_padded = jnp.pad(plane, ((HALO, pad_bottom), (HALO_X, pad_right)))

    p = plan.params
    scal = _np.zeros((8, 16), _np.float32)
    scal[0, 0] = _np.asarray(p["mins"])[0]
    scal[0, 1] = _np.asarray(p["ranges"])[0]
    scal[1, :4] = _np.asarray(p["mul"])
    scal[2:5, :4] = _np.asarray(p["cmatrix"])
    scal[5:8, :3] = _np.asarray(p["rgbmatrix"])

    spline = _np.zeros((5, 16), _np.float32)
    n_knots = plan.n_knots if plan.apply_curve else 0
    if plan.apply_curve:
        spline[0, :n_knots] = _np.asarray(p["spline_xs"])
        spline[1, :n_knots] = _np.asarray(p["spline_ys"])
        spline[2, :n_knots] = _np.asarray(p["spline_c1"])
        spline[3, :n_knots - 1] = _np.asarray(p["spline_c2"])
        spline[4, :n_knots - 1] = _np.asarray(p["spline_c3"])

    cmap = _cmap_strip(cfa, tile_h)

    return _develop_pallas_jit(
        plane_padded, jnp.asarray(cmap), jnp.asarray(scal), jnp.asarray(spline),
        cfa_name=plan.cfa_name, height=h, width=w, tile_h=tile_h,
        apply_curve=plan.apply_curve, n_knots=n_knots, linear=plan.linear,
        out_bits=plan.out_bits, interpret=interpret)


def _develop_kernel(scal_ref, spline_ref, plane_hbm, cmap_ref,
                    r_ref, g_ref, b_ref, ptile_ref, dma_sem, *, tile_h,
                    height, width, apply_curve, n_knots, linear, out_bits):
    f = jnp.float32
    i = pl.program_id(0)
    j = pl.program_id(1)

    # Global coords of this tile's first data row/col (for edge validity).
    y0 = i * tile_h
    x0 = j * TILE_W

    # Manual halo DMA of the padded plane window -- BlockSpec cannot express
    # overlapping windows, and DMA slices must be tile-aligned, hence the
    # 8-row / 128-col halo blocks.
    dma = pltpu.make_async_copy(
        plane_hbm.at[pl.ds(i * tile_h, tile_h + 2 * HALO),
                     pl.ds(j * TILE_W, TILE_W + 2 * HALO_X)],
        ptile_ref, dma_sem)
    dma.start()
    dma.wait()

    plane = ptile_ref[...]            # [tile_h+2, w+2] raw counts
    if plane.dtype == jnp.uint16:
        # Mosaic has no u16->f32 cast; widen through int32.
        plane = plane.astype(jnp.int32)
    plane = plane.astype(f)
    cmap = cmap_ref[...].astype(jnp.int32)

    black = scal_ref[0, 0]
    rng = scal_ref[0, 1]
    v = jnp.minimum((plane - black) / rng, 1.0)

    # Validity of scratch coordinates: cell (r, c) is global
    # (y0 + r - HALO, x0 + c - HALO_X).
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile_h + 2 * HALO, 1), 0) + (y0 - HALO)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, v.shape[1]), 1) + (x0 - HALO_X)
    valid = ((rows >= 0) & (rows < height)).astype(f) * \
            ((cols >= 0) & (cols < width)).astype(f)

    c0 = cmap[HALO:HALO + tile_h, HALO_X:HALO_X + TILE_W]
    sums = [jnp.zeros((tile_h, TILE_W), f) for _ in range(4)]
    counts = [jnp.zeros((tile_h, TILE_W), f) for _ in range(4)]
    for (dy, dx) in _OFFSETS:
        val = v[HALO + dy:HALO + dy + tile_h, HALO_X + dx:HALO_X + dx + TILE_W]
        vld = valid[HALO + dy:HALO + dy + tile_h, HALO_X + dx:HALO_X + dx + TILE_W]
        ci = cmap[HALO + dy:HALO + dy + tile_h, HALO_X + dx:HALO_X + dx + TILE_W]
        center = dy == 0 and dx == 0
        # Reference discard rule (demosaic.rs:87): same-color non-center
        # neighbors don't contribute.
        keep = vld if center else jnp.where(ci != c0, vld, 0.0)
        for c in range(4):
            sel = jnp.where(ci == c, keep, 0.0)
            sums[c] = sums[c] + val * sel
            counts[c] = counts[c] + sel
    rgbe = [jnp.where(counts[c] > 0.0, sums[c] / counts[c], 0.0) for c in range(4)]

    # WB multipliers + 3x4 camera matrix (clip to 1.0 first).
    wb = [jnp.minimum(rgbe[c] * scal_ref[1, c], 1.0) for c in range(4)]
    xyz = []
    for r in range(3):
        acc = wb[0] * scal_ref[2 + r, 0]
        for c in range(1, 4):
            acc = acc + wb[c] * scal_ref[2 + r, c]
        xyz.append(acc)

    def lab_f(t):
        cb = jnp.exp(jnp.log(jnp.maximum(t, 1e-30)) * (1.0 / 3.0))
        return jnp.where(t > _LAB_E, cb, (_LAB_K * t + 16.0) / 116.0)

    fx = lab_f(xyz[0] / _XW)
    fy = lab_f(xyz[1] / _YW)
    fz = lab_f(xyz[2] / _ZW)
    L = (116.0 * fy - 16.0) / 100.0
    A = (500.0 * (fx - fy) + 127.0) / 255.0
    B = (200.0 * (fy - fz) + 127.0) / 255.0

    if apply_curve:
        xs = [spline_ref[0, j] for j in range(n_knots)]
        ys = [spline_ref[1, j] for j in range(n_knots)]
        c1 = [spline_ref[2, j] for j in range(n_knots - 1)]
        c2 = [spline_ref[3, j] for j in range(n_knots - 1)]
        c3 = [spline_ref[4, j] for j in range(n_knots - 1)]
        idx = jnp.zeros(L.shape, jnp.int32)
        for j in range(1, n_knots):
            idx = idx + (L >= xs[j]).astype(jnp.int32)
        idx = jnp.clip(idx, 0, n_knots - 2)

        def sel(tab):
            acc = jnp.full(L.shape, tab[0])
            for j in range(1, len(tab)):
                acc = jnp.where(idx == j, tab[j], acc)
            return acc

        d = L - sel(xs[:n_knots - 1])
        Lc = sel(ys[:n_knots - 1]) + sel(c1) * d + sel(c2) * d * d + sel(c3) * d * d * d
        Lc = jnp.where(L >= xs[n_knots - 1], ys[n_knots - 1], Lc)
        L = jnp.where(L <= xs[0], ys[0], Lc)

    # Lab -> XYZ -> linear RGB (color_conversions.rs:58-65,171-191).
    cl = L * 100.0
    ca = A * 255.0 - 127.0
    cb2 = B * 255.0 - 127.0
    fy2 = (cl + 16.0) / 116.0
    fx2 = ca / 500.0 + fy2
    fz2 = fy2 - cb2 / 200.0
    fx3 = fx2 * fx2 * fx2
    fz3 = fz2 * fz2 * fz2
    xr = jnp.where(fx3 > _LAB_E, fx3, (116.0 * fx2 - 16.0) / _LAB_K)
    yr = jnp.where(cl > _LAB_K * _LAB_E, fy2 * fy2 * fy2, cl / _LAB_K)
    zr = jnp.where(fz3 > _LAB_E, fz3, (116.0 * fz2 - 16.0) / _LAB_K)
    x, y, z = xr * _XW, yr * _YW, zr * _ZW
    outs = []
    for r in range(3):
        m0, m1, m2 = scal_ref[5 + r, 0], scal_ref[5 + r, 1], scal_ref[5 + r, 2]
        ch = x * m0 + y * m1 + z * m2
        if not linear:
            ch = jnp.clip(ch, 0.0, 1.0)
            hi = 1.055 * jnp.exp(jnp.log(jnp.maximum(ch, 1e-30)) * (1.0 / 2.4)) - 0.055
            ch = jnp.where(ch < 0.0031308, ch * 12.92, hi)
        outs.append(ch)

    # Mosaic lacks f32->u8/u16 casts; truncate via int32 then narrow.
    if out_bits == 8:
        qs = [jnp.clip(o * 256.0, 0.0, 255.0).astype(jnp.int32).astype(jnp.uint8)
              for o in outs]
    else:
        qs = [jnp.clip(jnp.trunc(o * 65535.0 + jnp.where(o >= 0, 0.5, -0.5)),
                       0.0, 65535.0).astype(jnp.int32).astype(jnp.uint16)
              for o in outs]
    r_ref[...] = qs[0]
    g_ref[...] = qs[1]
    b_ref[...] = qs[2]


@partial(jax.jit, static_argnames=("cfa_name", "height", "width", "tile_h",
                                   "apply_curve", "n_knots", "linear",
                                   "out_bits", "interpret"))
def _develop_pallas_jit(plane_padded, cmap, scal, spline, *, cfa_name, height,
                        width, tile_h, apply_curve, n_knots, linear, out_bits,
                        interpret):
    grid = (pl.cdiv(height, tile_h), pl.cdiv(width, TILE_W))
    out_dtype = jnp.uint8 if out_bits == 8 else jnp.uint16
    kernel = partial(_develop_kernel, tile_h=tile_h, height=height,
                     width=width, apply_curve=apply_curve, n_knots=n_knots,
                     linear=linear, out_bits=out_bits)
    r, g, b = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),    # scal [8,16]
            pl.BlockSpec(memory_space=pltpu.SMEM),    # spline [5,16]
            pl.BlockSpec(memory_space=pltpu.ANY),     # padded plane (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # cmap tile
        ],
        out_specs=[
            pl.BlockSpec((tile_h, TILE_W), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, TILE_W), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, TILE_W), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((height, width), out_dtype)] * 3,
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * HALO, TILE_W + 2 * HALO_X), plane_padded.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(scal, spline, plane_padded, cmap)
    return jnp.stack([r, g, b], axis=-1)
