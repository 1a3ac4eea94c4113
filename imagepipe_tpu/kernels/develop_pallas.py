"""Pallas TPU megakernel: the entire RAW develop chain in one HBM pass.

The XLA-fused engine (engine.py) materializes several full-frame f32
intermediates per develop; this kernel streams row x column tiles through
VMEM instead: each grid step reads one halo tile of the sensor plane (DMA
double-buffered against the previous tile's compute), runs levels -> CFA
demosaic (reference 3x3 neighbor-average semantics, demosaic.rs:67-119) ->
WB + camera matrix + Lab (color_conversions.rs:41-55) -> tone spline ->
Lab->RGB -> gamma -> quantize entirely in VMEM, and writes three planar
u8/u16 output planes. Minimum possible traffic: read the plane once, write
the image once.

CFA handling: 2x2 patterns (Bayer) compute neighbor-color masks from iota
parities in registers; other periodic CFAs read a precomputed color-map
tile strip (period-aligned TILE sizes keep the phase constant across grid
steps). Numerics: 'direct' mode (cbrt/pow via exp/log on the VPU); within
the reference's +-1 LSB contract.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..raw import CFA

__all__ = ["develop_pallas", "develop_pallas_batch", "develop_pallas_sp",
           "staged_plane_cached",
           "stage_plane_pallas", "pallas_supported", "pallas_preferred",
           "plan_tables"]

_LAB_E = np.float32(np.float32(216.0) / np.float32(24389.0))
_LAB_K = np.float32(np.float32(24389.0) / np.float32(27.0))
_XW, _YW, _ZW = np.float32(0.95047), np.float32(1.0), np.float32(1.08883)

# DMA windows must be tile-aligned: 8-row sublane halo blocks vertically and
# 128-col lane halo blocks horizontally (only the innermost row/col of each
# halo block is real halo).
HALO = 8
HALO_X = 128

# Closed-form Bayer demosaic inside the kernel (~5x fewer VPU passes than
# the generic mask loop). Default ON: the historical Mosaic crash
# ("array.h:480 limits[i] <= dim(i)") was slicing replicated-layout iotas,
# fixed by building phase masks from output-tile-shaped iotas.
BAYER_CLOSED_FORM = True

# Specialize interior tiles (constant counts, no validity masking) behind a
# pl.when branch. Measured SLOWER on the stable batched A/B (2.33-2.40 vs
# 2.04-2.26 ms/img, scripts/exp_r3b.py; single-dispatch slopes were too
# noisy to call) -- the duplicated branch bodies cost more than the mask
# arithmetic they save. Kept as a documented tested-and-rejected lever.
INTERIOR_SPLIT = False

# DMA pipeline depth (2 = classic double buffering; 3-deep measured no
# better in the r3 sweep). Read at trace time; clear _develop_pallas_jit's
# cache after changing.
N_DMA_BUF = 2


def _tile_w_for(cfa_w: int) -> int:
    """Tile width: multiple of 128 lanes and the CFA period width. 384
    lanes measured best: 512-wide tiles regressed at every height tried
    (spills; e.g. 128x512 ran 2x slower than 96x384 in round 1, and
    160x512 / 224x512 both lost to 160x384 in the round-2 sweep)."""
    import math

    base = math.lcm(128, max(1, cfa_w))
    return base * max(1, 384 // base)


def _tile_h_for(cfa_h: int, out_bits: int) -> int:
    """Tile height: the smallest multiple of the layout unit (sublane base
    x CFA period) at or above ~160 rows -- the measured optimum on v5e
    (24MP Bayer 8-bit: 1.60 ms/frame at 160x384 vs 3.02 at the old 96x384;
    taller tiles regress again: 192 -> 2.14, 320 -> 2.60; X-Trans best at
    its nearest unit, 192). Output is bit-identical across tilings."""
    import math

    base = 32 if out_bits == 8 else 16
    unit = math.lcm(base, cfa_h if cfa_h > 0 else 2)
    return unit * max(1, -(-160 // unit))


def _cmap_strip(cfa: CFA, tile_h: int, tile_w: int) -> np.ndarray:
    """[tile_h+2*HALO, tile_w+2*HALO_X] u8 center-color map (valid for every
    grid tile; tile_h/tile_w are multiples of the CFA period)."""
    ph, pw = cfa.height, cfa.width
    rows = (np.arange(-HALO, tile_h + HALO)) % ph
    cols = (np.arange(-HALO_X, tile_w + HALO_X)) % pw
    return cfa.pattern[np.ix_(rows, cols)].astype(np.uint8)


def pallas_supported(plan) -> bool:
    """EXIF orientation is no carve-out: the kernel's planar output is
    permuted inside the same jit (apply_flips), exactly like the XLA
    engine's in-jit permutation (engine.py:243-252). Thumbnail plans
    (dem_path 'scaled') route to the fused scaled-demosaic kernel
    (develop_scaled.py) when their geometry fits its envelope."""
    if plan.mode == "mono":
        # Monochrome sensors: no demosaic, same tile back end. Resized
        # mono plans (dem_path plaindown) stay on the XLA engine.
        return plan.dem_path == "full"
    if plan.mode != "cfa":
        return False
    if plan.dem_path == "full":
        return True
    if plan.dem_path == "scaled":
        from .develop_scaled import scaled_supported
        from .develop_scaled_sep import sep_supported

        # Tile-local kernel first (wins >=~600px); deep thumbnails
        # (sub-600px from large sensors) take the separable matmul path.
        return scaled_supported(plan) or sep_supported(plan)
    return False


def pallas_preferred(plan) -> bool:
    """Where the Pallas executors measure faster than the XLA fused
    engine -- with the closed-form demosaic and the scaled-demosaic kernel
    that is every supported plan (full-size AND thumbnail; see BASELINE.md's
    final per-round tables for the measured device-time numbers). Kept as a
    policy point so future regressions can carve out exceptions without
    touching callers."""
    return pallas_supported(plan)


def _color_at_2x2(cfa: CFA, parity_y, parity_x):
    """Color index array from coordinate parities for a 2x2 CFA, computed in
    registers (no table loads)."""
    p = cfa.pattern
    c00, c01, c10, c11 = int(p[0, 0]), int(p[0, 1]), int(p[1, 0]), int(p[1, 1])
    top = jnp.where(parity_x == 0, jnp.int32(c00), jnp.int32(c01))
    bot = jnp.where(parity_x == 0, jnp.int32(c10), jnp.int32(c11))
    return jnp.where(parity_y == 0, top, bot)


def _develop_kernel(scal_ref, spline_ref, xoff_ref, plane_hbm, cmap_ref,
                    r_ref, g_ref, b_ref, ptiles_ref, dma_sems, *, tile_h,
                    tile_w, height, width, apply_curve, n_knots, linear,
                    out_bits, bayer, cfa_name, stage_limit=4, batched=False,
                    mode="cfa"):
    TILE_W = tile_w
    f = jnp.float32
    if batched:
        # Batch folded into the grid: one pallas_call serves the whole
        # stack (no per-image HBM slice/stack copies around the kernel).
        # plane_hbm is [B,Hp,Wp]; scal/spline arrive per-image via blocked
        # SMEM specs, so the body below is identical either way.
        i = pl.program_id(1)
        j = pl.program_id(2)
        ni = pl.num_programs(1)
        nj = pl.num_programs(2)
        step = (pl.program_id(0) * ni + i) * nj + j
        nsteps = pl.num_programs(0) * ni * nj
    else:
        i = pl.program_id(0)
        j = pl.program_id(1)
        nj = pl.num_programs(1)
        step = i * nj + j
        nsteps = pl.num_programs(0) * nj
    y0 = i * tile_h
    x0 = j * TILE_W

    def start_dma(s, slot):
        jj = s % nj
        rows = pl.ds(((s // nj) % ni if batched else s // nj) * tile_h,
                     tile_h + 2 * HALO)
        cols = pl.ds(jj * TILE_W, TILE_W + 2 * HALO_X)
        src = (plane_hbm.at[s // (ni * nj), rows, cols] if batched
               else plane_hbm.at[rows, cols])
        return pltpu.make_async_copy(src, ptiles_ref.at[slot],
                                     dma_sems.at[slot])

    # DMA pipelining: step s computes from slot s%N while steps s+1..
    # s+N-1 stream into the other slots (N = N_DMA_BUF; 2 = classic double
    # buffering).
    nbuf = ptiles_ref.shape[0]

    @pl.when(step == 0)
    def _():
        start_dma(0, 0).start()
        for k in range(1, nbuf - 1):
            if k < nsteps:      # nsteps is static (grid is static)
                start_dma(k, k).start()

    @pl.when(step + (nbuf - 1) < nsteps)
    def _():
        start_dma(step + (nbuf - 1), (step + (nbuf - 1)) % nbuf).start()

    start_dma(step, step % nbuf).wait()
    plane = ptiles_ref[step % nbuf]
    if plane.dtype == jnp.uint16:
        plane = plane.astype(jnp.int32)  # Mosaic has no u16->f32 cast
    plane = plane.astype(f)

    black = scal_ref[0, 0]
    rng = scal_ref[0, 1]
    v = jnp.minimum((plane - black) / rng, 1.0)

    # xoff is the shard's column offset under width (sp) sharding, 0
    # single-device. Cell (r,c) of the scratch tile is global
    # (y0+r-HALO, xoff+x0+c-HALO_X).
    xoff = xoff_ref[0, 0]
    rows = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0) + (y0 - HALO)
    cols = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1) + (xoff + x0 - HALO_X)

    def sl(a, dy, dx):
        return a[HALO + dy:HALO + dy + tile_h, HALO_X + dx:HALO_X + dx + TILE_W]

    def finish(rgbe):
        _finish_tile(rgbe, scal_ref, spline_ref, r_ref, g_ref, b_ref,
                     apply_curve=apply_curve, n_knots=n_knots, linear=linear,
                     out_bits=out_bits, stage_limit=stage_limit)

    if mode == "mono":
        # Monochrome sensors: no mosaic -- replicate the single channel
        # and run the same color chain (the XLA engine's mono path,
        # engine.py / gofloat.rs:101-127). Center sample only; no halo
        # reads, so edge validity is moot.
        vis = sl(v, 0, 0)
        finish([vis, vis, vis, vis * 0.0])
        return

    # Interior tiles (the bulk of the grid) have every +-1 neighbor inside
    # the image: validity is identically 1, Bayer neighbor counts are the
    # constants 4/2/2/4, and s/4, s/2 are EXACT power-of-two multiplies --
    # the specialized path is bit-identical to the masked path there while
    # skipping the validity compares and all count arithmetic (measured
    # front-end lever, VERDICT r2 next #7).
    gx0 = xoff + x0
    interior = ((y0 >= 1) & (y0 + tile_h + 1 <= height)
                & (gx0 >= 1) & (gx0 + TILE_W + 1 <= width))

    pat = CFA(cfa_name).pattern if cfa_name else None
    bayer_fast = (BAYER_CLOSED_FORM and bayer and pat is not None
                  and sorted(int(c) for c in pat.ravel()) == [0, 1, 1, 2])
    if bayer_fast:
        if not INTERIOR_SPLIT:
            interior = None

        def bayer_rgbe(masked):
            # Closed-form Bayer demosaic (same neighbor sets as the
            # reference's 3x3 lookup, demosaic.rs:67-119; accumulation order
            # differs, which only moves f32 ULPs -- within the 1 LSB
            # contract). ~5x fewer VPU passes than the generic mask loop.
            if masked:
                valid = ((rows >= 0) & (rows < height)
                         & (cols >= 0) & (cols < width)).astype(f)
                vv = v * valid   # invalid neighbors contribute 0 everywhere
            else:
                vv = v
            c_ctr = sl(v, 0, 0)
            e_sum = sl(vv, -1, 0) + sl(vv, 1, 0) + sl(vv, 0, -1) + sl(vv, 0, 1)
            h_sum = sl(vv, 0, -1) + sl(vv, 0, 1)
            v_sum = sl(vv, -1, 0) + sl(vv, 1, 0)
            d_sum = sl(vv, -1, -1) + sl(vv, -1, 1) + sl(vv, 1, -1) + sl(vv, 1, 1)

            if masked:
                def avg(s, c):
                    return jnp.where(c > 0.0, s / c, 0.0)

                e_cnt = (sl(valid, -1, 0) + sl(valid, 1, 0)
                         + sl(valid, 0, -1) + sl(valid, 0, 1))
                h_cnt = sl(valid, 0, -1) + sl(valid, 0, 1)
                v_cnt = sl(valid, -1, 0) + sl(valid, 1, 0)
                d_cnt = (sl(valid, -1, -1) + sl(valid, -1, 1)
                         + sl(valid, 1, -1) + sl(valid, 1, 1))
                h_avg = avg(h_sum, h_cnt)
                v_avg = avg(v_sum, v_cnt)
                d_avg = avg(d_sum, d_cnt)
                e_avg = avg(e_sum, e_cnt)
            else:
                h_avg = h_sum * 0.5
                v_avg = v_sum * 0.5
                d_avg = d_sum * 0.25
                e_avg = e_sum * 0.25

            # Phase masks as f32 products of parity indicators (pure
            # arithmetic: Mosaic's i1 vector handling is fragile). Built from
            # fresh output-tile-shaped iotas, NOT by slicing rows/cols: those
            # are single-axis broadcasted iotas that Mosaic keeps in a
            # replicated layout, and extract_strided_slice on a replicated
            # vector crashes ApplyVectorLayout ("array.h:480 Check failed:
            # limits[i] <= dim(i)").
            orows = jax.lax.broadcasted_iota(jnp.int32, (tile_h, TILE_W), 0) + y0
            ocols = (jax.lax.broadcasted_iota(jnp.int32, (tile_h, TILE_W), 1)
                     + (xoff + x0))
            pr0 = ((orows & 1) == 0).astype(f)
            pc0 = ((ocols & 1) == 0).astype(f)
            pr1 = 1.0 - pr0
            pc1 = 1.0 - pc0
            cell = {(0, 0): pr0 * pc0, (0, 1): pr0 * pc1,
                    (1, 0): pr1 * pc0, (1, 1): pr1 * pc1}
            p = [[int(pat[0, 0]), int(pat[0, 1])],
                 [int(pat[1, 0]), int(pat[1, 1])]]

            def phase_is(color):
                acc = jnp.zeros((tile_h, TILE_W), f)
                for a in (0, 1):
                    for b in (0, 1):
                        if p[a][b] == color:
                            acc = acc + cell[(a, b)]
                return acc

            is_r = phase_is(0)
            is_b = phase_is(2)
            is_g = 1.0 - is_r - is_b
            # G rows containing R have R as the horizontal neighbor of G.
            r_row_top = 0 in p[0]
            g_h = pr0 if r_row_top else pr1  # 1.0 where G sees R horizontally
            r_at_g = g_h * h_avg + (1.0 - g_h) * v_avg
            b_at_g = g_h * v_avg + (1.0 - g_h) * h_avg
            return [
                is_r * c_ctr + is_g * r_at_g + is_b * d_avg,
                is_g * c_ctr + (is_r + is_b) * e_avg,
                is_b * c_ctr + is_g * b_at_g + is_r * d_avg,
                c_ctr * 0.0,  # derived zero (a splat constant upset Mosaic)
            ]

        if interior is None:
            finish(bayer_rgbe(masked=True))
            return

        @pl.when(interior)
        def _():
            finish(bayer_rgbe(masked=False))

        @pl.when(jnp.logical_not(interior))
        def _():
            finish(bayer_rgbe(masked=True))
        return

    # Closed form for ANY periodic CFA, equivalent to the reference's
    # per-offset discard rule (demosaic.rs:87): the center pixel's own
    # channel takes exactly the center sample (same-color neighbors are
    # discarded, center kept), and every OTHER channel averages all its
    # valid neighbors -- so per color the neighbor term is a plain 8-point
    # box sum of one masked plane, no per-(offset, color) selects. ~2x fewer
    # VPU passes than the mask loop; accumulation order moves f32 ULPs only
    # (within the 1 LSB contract).
    if bayer:
        colors = _color_at_2x2(CFA(cfa_name), rows & 1, cols & 1)
    else:
        colors = cmap_ref[...].astype(jnp.int32)
    c0 = sl(colors, 0, 0)
    v_ctr = sl(v, 0, 0)

    def box8(a):
        # Separable 3x3 sum: vertical triple over the full halo tile,
        # horizontal triple on tile-width slices -- 4 adds instead of 7
        # (order moves f32 ULPs only). The center term needs no
        # subtraction: every consumed lane has oc==0 at the center
        # (c != center color there), and center-color lanes discard the
        # box sum via the is_ctr select below.
        vert = a[HALO - 1:HALO - 1 + tile_h, :] \
            + a[HALO:HALO + tile_h, :] \
            + a[HALO + 1:HALO + 1 + tile_h, :]
        h0 = HALO_X
        return vert[:, h0 - 1:h0 - 1 + TILE_W] \
            + vert[:, h0:h0 + TILE_W] \
            + vert[:, h0 + 1:h0 + 1 + TILE_W]

    def generic_rgbe(masked):
        if masked:
            valid = ((rows >= 0) & (rows < height)
                     & (cols >= 0) & (cols < width)).astype(f)
            vv = v * valid
        else:
            vv = v
        rgbe = []
        for c in range(4):
            oc = (colors == c).astype(f)
            nbr_s = box8(vv * oc)
            # Interior counts still vary per CFA phase (3/6/9-point sets),
            # but validity is 1 there so the mask plane IS oc.
            nbr_c = box8(valid * oc) if masked else box8(oc)
            is_ctr = (c0 == c)
            s = jnp.where(is_ctr, v_ctr, nbr_s)
            n = jnp.where(is_ctr, 1.0, nbr_c)
            rgbe.append(jnp.where(n > 0.0, s / n, 0.0))
        return rgbe

    if not INTERIOR_SPLIT:
        finish(generic_rgbe(masked=True))
        return

    @pl.when(interior)
    def _():
        finish(generic_rgbe(masked=False))

    @pl.when(jnp.logical_not(interior))
    def _():
        finish(generic_rgbe(masked=True))


def _finish_tile(rgbe, scal_ref, spline_ref, r_ref, g_ref, b_ref, *,
                 apply_curve, n_knots, linear, out_bits, stage_limit=4):
    """Shared develop back end on one VMEM tile of RGBE planes: WB + camera
    matrix + Lab encode -> tone spline -> Lab->RGB -> gamma -> quantized
    planar write. Used by the full-size megakernel and the scaled-demosaic
    kernel (develop_scaled.py) so the color chain has exactly one device
    form (the numeric contract requires identical transcendental shapes)."""
    f = jnp.float32
    # Profiling knob (stage_limit < 4): stop the chain early and quantize
    # whatever the last stage produced, so per-stage cost can be attributed
    # by differencing timed variants. Production always runs the full chain.
    if stage_limit <= 1:
        outs = rgbe[:3]
        _emit(outs, scal_ref, r_ref, g_ref, b_ref, linear=True,
              out_bits=out_bits)
        return

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

    if stage_limit <= 2:
        _emit([L, A, B], scal_ref, r_ref, g_ref, b_ref, linear=True,
              out_bits=out_bits)
        return

    if apply_curve:
        xs = [spline_ref[0, k] for k in range(n_knots)]
        ys = [spline_ref[1, k] for k in range(n_knots)]
        c1 = [spline_ref[2, k] for k in range(n_knots - 1)]
        c2 = [spline_ref[3, k] for k in range(n_knots - 1)]
        c3 = [spline_ref[4, k] for k in range(n_knots - 1)]
        idx = jnp.zeros(L.shape, jnp.int32)
        for k in range(1, n_knots):
            idx = idx + (L >= xs[k]).astype(jnp.int32)
        idx = jnp.clip(idx, 0, n_knots - 2)

        def sel(tab):
            acc = jnp.full(L.shape, tab[0])
            for k in range(1, len(tab)):
                acc = jnp.where(idx == k, tab[k], acc)
            return acc

        d = L - sel(xs[:n_knots - 1])
        Lc = sel(ys[:n_knots - 1]) + sel(c1) * d + sel(c2) * d * d + sel(c3) * d * d * d
        Lc = jnp.where(L >= xs[n_knots - 1], ys[n_knots - 1], Lc)
        L = jnp.where(L <= xs[0], ys[0], Lc)

    if stage_limit <= 3:
        _emit([L, A, B], scal_ref, r_ref, g_ref, b_ref, linear=True,
              out_bits=out_bits)
        return

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

    _emit(outs, scal_ref, r_ref, g_ref, b_ref, linear=linear,
          out_bits=out_bits)


def _emit(outs, scal_ref, r_ref, g_ref, b_ref, *, linear, out_bits):
    del scal_ref, linear
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


def apply_flips(out, orientation_flips):
    """EXIF orientation on planar [..., 3, H, W] output (same order as the
    XLA engine, engine.py:243-252: flip_x, flip_y, then transpose)."""
    transpose, flip_x, flip_y = orientation_flips
    if flip_x:
        out = out[..., :, ::-1]
    if flip_y:
        out = out[..., ::-1, :]
    if transpose:
        out = jnp.swapaxes(out, -1, -2)
    return out


@partial(jax.jit, static_argnames=("cfa_name", "height", "width", "tile_h",
                                   "tile_w", "apply_curve", "n_knots",
                                   "linear", "out_bits", "bayer", "interpret",
                                   "stage_limit", "valid_width",
                                   "orientation_flips", "mode"))
def _develop_pallas_jit(plane_padded, cmap, scal, spline, xoff=None, *,
                        cfa_name, height, width, tile_h, tile_w, apply_curve,
                        n_knots, linear, out_bits, bayer, interpret,
                        stage_limit=4, valid_width=None,
                        orientation_flips=(False, False, False), mode="cfa"):
    """Run the megakernel over one (possibly width-sharded) padded plane.

    `width` is the LOCAL output width (the grid); `valid_width` the GLOBAL
    image width for edge validity (defaults to width); `xoff` a traced [1,1]
    int32 column offset of this shard (None = 0)."""
    TILE_W = tile_w
    grid = (pl.cdiv(height, tile_h), pl.cdiv(width, TILE_W))
    out_dtype = jnp.uint8 if out_bits == 8 else jnp.uint16
    if xoff is None:
        xoff = jnp.zeros((1, 1), jnp.int32)
    kernel = partial(_develop_kernel, tile_h=tile_h, tile_w=tile_w,
                     height=height,
                     width=width if valid_width is None else valid_width,
                     apply_curve=apply_curve,
                     n_knots=n_knots, linear=linear, out_bits=out_bits,
                     bayer=bayer, cfa_name=cfa_name, stage_limit=stage_limit,
                     mode=mode)
    r, g, b = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),    # scal [8,16]
            pl.BlockSpec(memory_space=pltpu.SMEM),    # spline [5,16]
            pl.BlockSpec(memory_space=pltpu.SMEM),    # xoff [1,1]
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
            pltpu.VMEM((N_DMA_BUF, tile_h + 2 * HALO, TILE_W + 2 * HALO_X),
                       plane_padded.dtype),
            pltpu.SemaphoreType.DMA((N_DMA_BUF,)),
        ],
        interpret=interpret,
    )(scal, spline, xoff, plane_padded, cmap)
    return apply_flips(jnp.stack([r, g, b], axis=0), orientation_flips)


@partial(jax.jit, static_argnames=("cfa_name", "height", "width", "tile_h",
                                   "tile_w", "apply_curve", "n_knots",
                                   "linear", "out_bits", "bayer", "interpret",
                                   "valid_width", "orientation_flips",
                                   "mode"))
def _develop_pallas_batchgrid_jit(planes_padded, cmap, scal, spline,
                                  xoff=None, *,
                                  cfa_name, height, width, tile_h, tile_w,
                                  apply_curve, n_knots, linear, out_bits,
                                  bayer, interpret, valid_width=None,
                                  orientation_flips=(False, False, False),
                                  mode="cfa"):
    """Batched megakernel with the batch folded into the Pallas grid:
    ONE pallas_call over [B,Hp,Wp] staged planes and [B,...] per-image
    calibration tables. Replaces the python-loop-of-kernels form, whose
    per-image HBM input slices and output stacks cost ~0.2-0.4 ms/img
    (BASELINE.md r2 tile-sweep note). `xoff`/`valid_width` mirror
    _develop_pallas_jit (width sharding: every batch entry of one shard
    shares the same column offset)."""
    B = planes_padded.shape[0]
    TILE_W = tile_w
    grid = (B, pl.cdiv(height, tile_h), pl.cdiv(width, TILE_W))
    out_dtype = jnp.uint8 if out_bits == 8 else jnp.uint16
    if xoff is None:
        xoff = jnp.zeros((1, 1), jnp.int32)
    kernel = partial(_develop_kernel, tile_h=tile_h, tile_w=tile_w,
                     height=height,
                     width=width if valid_width is None else valid_width,
                     apply_curve=apply_curve,
                     n_knots=n_knots, linear=linear, out_bits=out_bits,
                     bayer=bayer, cfa_name=cfa_name, batched=True, mode=mode)
    nsc = scal.shape[-2:]
    nsp = spline.shape[-2:]
    r, g, b = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None,) + nsc, lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.SMEM),    # scal [B,8,16]
            pl.BlockSpec((None,) + nsp, lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.SMEM),    # spline [B,5,16]
            pl.BlockSpec(memory_space=pltpu.SMEM),    # xoff [1,1] shared
            pl.BlockSpec(memory_space=pltpu.ANY),     # planes (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),    # cmap tile
        ],
        out_specs=[
            pl.BlockSpec((None, tile_h, TILE_W), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
        ] * 3,
        out_shape=[jax.ShapeDtypeStruct((B, height, width), out_dtype)] * 3,
        scratch_shapes=[
            pltpu.VMEM((N_DMA_BUF, tile_h + 2 * HALO, TILE_W + 2 * HALO_X),
                       planes_padded.dtype),
            pltpu.SemaphoreType.DMA((N_DMA_BUF,)),
        ],
        interpret=interpret,
    )(scal, spline, xoff, planes_padded, cmap)
    return apply_flips(jnp.stack([r, g, b], axis=1), orientation_flips)


def _tiles_for(plan):
    cfa = CFA(plan.cfa_name)
    return _tile_h_for(cfa.height, plan.out_bits), _tile_w_for(cfa.width)


def stage_plane_np(plan, plane) -> np.ndarray:
    """Host-side staging: crop + halo-pad one sensor plane (numpy)."""
    h, w = plan.height, plan.width
    tile_h, tile_w = _tiles_for(plan)
    grid_rows = -(-h // tile_h)
    grid_cols = -(-w // tile_w)
    plane = np.asarray(plane)
    plane = plane[plan.crop_y:plan.crop_y + h, plan.crop_x:plan.crop_x + w]
    pad_bottom = grid_rows * tile_h + HALO - h
    pad_right = grid_cols * tile_w + HALO_X - w
    return np.pad(plane, ((HALO, pad_bottom), (HALO_X, pad_right)))


def sp_width_pad(plan, sp: int) -> int:
    """Global width padded so each of `sp` width shards is a whole number
    of kernel tiles (the sp executor's layout requirement)."""
    _, tile_w = _tiles_for(plan)
    per = sp * tile_w
    return -(-plan.width // per) * per


def stage_plane_rows_np(plan, plane, width_pad: int) -> np.ndarray:
    """Staging for the width-sharded (sp) executor: crop + vertical halo
    pad + right pad to width_pad. No horizontal halo -- shards exchange
    their 128-column halos on device (ICI ppermute), and shard 0 / sp-1
    edge halos are zeros masked off by column validity, exactly like the
    single-device staging's zero pad."""
    h, w = plan.height, plan.width
    tile_h, _ = _tiles_for(plan)
    grid_rows = -(-h // tile_h)
    plane = np.asarray(plane)
    plane = plane[plan.crop_y:plan.crop_y + h, plan.crop_x:plan.crop_x + w]
    pad_bottom = grid_rows * tile_h + HALO - h
    return np.pad(plane, ((HALO, pad_bottom), (0, width_pad - w)))


def _sp_local_develop(plane_l, cmap_d, scal, spline, *, axis, sp, Wl,
                      statics, interpret, valid_width):
    """Inside a shard_map over `axis`: exchange 128-column halos with the
    neighbor shards, then run the megakernel on this shard's columns with
    its global column offset (validity and CFA parity stay global)."""
    right_to_next = [(i, i + 1) for i in range(sp - 1)]
    left_to_prev = [(i + 1, i) for i in range(sp - 1)]
    left_halo = jax.lax.ppermute(plane_l[:, -HALO_X:], axis, right_to_next)
    right_halo = jax.lax.ppermute(plane_l[:, :HALO_X], axis, left_to_prev)
    padded = jnp.concatenate([left_halo, plane_l, right_halo], axis=1)
    xoff = (jax.lax.axis_index(axis) * Wl).astype(jnp.int32).reshape(1, 1)
    st = dict(statics)
    st["width"] = Wl
    # Orientation must permute the GLOBAL image, not each width shard;
    # callers apply it after unsharding (develop_pallas_sp / BatchEngine).
    st["orientation_flips"] = (False, False, False)
    return _develop_pallas_jit(padded, cmap_d, scal, spline, xoff,
                               interpret=interpret, valid_width=valid_width,
                               **st)


def _sp_local_develop_batch(planes_l, cmap_d, scal, spline, *, axis, sp, Wl,
                            statics, interpret, valid_width):
    """Batched form of _sp_local_develop: ONE halo ppermute pair over the
    whole [B,H,Wl] shard stack and one grid-batched kernel, instead of a
    pair of collectives and a kernel per image. scal/spline: [B,...]."""
    right_to_next = [(i, i + 1) for i in range(sp - 1)]
    left_to_prev = [(i + 1, i) for i in range(sp - 1)]
    left_halo = jax.lax.ppermute(planes_l[:, :, -HALO_X:], axis,
                                 right_to_next)
    right_halo = jax.lax.ppermute(planes_l[:, :, :HALO_X], axis,
                                  left_to_prev)
    padded = jnp.concatenate([left_halo, planes_l, right_halo], axis=2)
    xoff = (jax.lax.axis_index(axis) * Wl).astype(jnp.int32).reshape(1, 1)
    st = dict(statics)
    st["width"] = Wl
    # Orientation must permute the GLOBAL image, not each width shard;
    # callers apply it after unsharding (BatchEngine._dispatch_pallas).
    st["orientation_flips"] = (False, False, False)
    return _develop_pallas_batchgrid_jit(padded, cmap_d, scal, spline, xoff,
                                         interpret=interpret,
                                         valid_width=valid_width, **st)


def develop_pallas_sp(plan, plane, mesh, axis: str = "spatial",
                      interpret=None):
    """Single-image develop with the megakernel width-sharded over a mesh
    axis (the sp story for frames larger than one chip's HBM / for
    single-image multi-chip latency). plane: [H0, W0] raw counts.
    Returns planar [3, H, W] quantized."""
    import jax as _jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert pallas_supported(plan), "unsupported plan for the pallas executor"
    assert plan.dem_path == "full", \
        "width sharding serves full-size plans (thumbnail outputs are tiny)"
    sp = mesh.shape[axis]
    wpad = sp_width_pad(plan, sp)
    Wl = wpad // sp
    staged = stage_plane_rows_np(plan, plane, wpad)
    cmap, scal, spline, statics = plan_tables(plan)
    if interpret is None:
        interpret = _jax.default_backend() == "cpu"
    cmap_d = jnp.asarray(cmap)
    scal_d = jnp.asarray(scal)
    spline_d = jnp.asarray(spline)
    plane_d = _jax.device_put(jnp.asarray(staged),
                              NamedSharding(mesh, P(None, axis)))

    def local(plane_l):
        return _sp_local_develop(
            plane_l, cmap_d, scal_d, spline_d, axis=axis, sp=sp, Wl=Wl,
            statics=statics, interpret=interpret, valid_width=plan.width)

    fn = _jax.shard_map(local, mesh=mesh, in_specs=(P(None, axis),),
                        out_specs=P(None, None, axis), check_vma=False)
    out = fn(plane_d)
    return apply_flips(out[:, :, :plan.width],
                       tuple(plan.orientation_flips))


def stage_plane_pallas(plan, plane):
    """Stage one sensor plane for the megakernel: crop + halo-pad on the
    HOST (numpy; overlaps decode in the batch pipeline) and upload the
    padded plane once. Device-side pad/slice ops each cost a full dispatch
    through the remote runtime and an unfused full-frame copy -- staging
    keeps the develop itself a single kernel launch."""
    return jnp.asarray(stage_plane_np(plan, plane))


def staged_plane_cached(plan, raw):
    """Stage a RawImage's plane for the megakernel, cached on the RawImage
    (keyed by the plan's crop/size/tiling) -- interactive re-renders must
    not re-pad and re-upload a ~50-120MB plane per develop (the same reason
    sources.staged_raw_plane caches the XLA engine's staging)."""
    if plan.dem_path == "scaled":
        from .develop_scaled import scaled_plan_for, staged_scaled_cached

        spn = scaled_plan_for(plan)
        if spn is not None:
            return staged_scaled_cached(plan, raw, spn)
        from .develop_scaled_sep import staged_sep_cached

        return staged_sep_cached(plan, raw)
    key = (plan.crop_y, plan.crop_x, plan.height, plan.width, _tiles_for(plan))
    hit = getattr(raw, "_pallas_staged", None)
    if hit is not None and hit[0] == key:
        return hit[1]
    dev = stage_plane_pallas(plan, raw.data)
    try:
        raw._pallas_staged = (key, dev)
    except AttributeError:
        pass  # slotted/frozen payloads just skip the cache
    return dev


def calib_tables(plan):
    """(scal, spline, n_knots): per-image calibration packed into the
    SMEM-friendly [8,16]/[5,16] f32 tables shared by the full-size
    megakernel and the scaled-demosaic kernel (develop_scaled.py) -- the
    scaled path needs these without the cmap strip / tile geometry."""
    import numpy as _np

    p = plan.params
    scal = _np.zeros((8, 16), _np.float32)
    scal[0, 0] = _np.asarray(p["mins"])[0]
    scal[0, 1] = _np.asarray(p["ranges"])[0]
    scal[1, :4] = _np.asarray(p["mul"])
    scal[2:5, :4] = _np.asarray(p["cmatrix"])
    scal[5:8, :3] = _np.asarray(p["rgbmatrix"])

    # Spline table sized to the actual knot count (>16 knots just widen
    # the SMEM lane dim; the kernel's scalar reads are n_knots-static).
    n_knots = plan.n_knots if plan.apply_curve else 0
    spline = _np.zeros((5, max(16, -(-n_knots // 8) * 8)), _np.float32)
    if plan.apply_curve:
        spline[0, :n_knots] = _np.asarray(p["spline_xs"])
        spline[1, :n_knots] = _np.asarray(p["spline_ys"])
        spline[2, :n_knots] = _np.asarray(p["spline_c1"])
        spline[3, :n_knots - 1] = _np.asarray(p["spline_c2"])
        spline[4, :n_knots - 1] = _np.asarray(p["spline_c3"])
    return scal, spline, n_knots


def calib_tables_device(plan):
    """calib_tables with the two arrays device-resident, memoized on the
    plan (single-shot develops must not re-upload calibration per call)."""
    hit = getattr(plan, "_calib_tables_dev", None)
    if hit is not None:
        return hit
    scal, spline, n_knots = calib_tables(plan)
    dev = (jnp.asarray(scal), jnp.asarray(spline), n_knots)
    try:
        plan._calib_tables_dev = dev
    except AttributeError:
        pass
    return dev


def plan_tables(plan):
    """(cmap, scal, spline, statics) for the kernel: calibration packed into
    SMEM-friendly [8,16]/[5,16] f32 tables plus the static config dict."""
    cfa = CFA(plan.cfa_name)
    tile_h, tile_w = _tiles_for(plan)
    scal, spline, n_knots = calib_tables(plan)
    if plan.mode == "mono" or not cfa.is_valid():
        # Mono plans never read the color map; a zero strip keeps the
        # pallas_call input shapes uniform.
        cmap = np.zeros((tile_h + 2 * HALO, tile_w + 2 * HALO_X), np.uint8)
    else:
        cmap = _cmap_strip(cfa, tile_h, tile_w)
    statics = dict(
        cfa_name=plan.cfa_name, height=plan.height, width=plan.width,
        tile_h=tile_h, tile_w=tile_w, apply_curve=plan.apply_curve,
        n_knots=n_knots, linear=plan.linear, out_bits=plan.out_bits,
        bayer=(cfa.width == 2 and cfa.height == 2),
        mode=plan.mode,
        orientation_flips=tuple(plan.orientation_flips))
    return cmap, scal, spline, statics


def plan_tables_device(plan):
    """plan_tables with the table arrays device-resident, memoized on the
    plan: interactive single-shot develops must not re-upload calibration
    per call (each small host->device put costs a tunnel round-trip on
    this dev setup, and a dispatch everywhere)."""
    hit = getattr(plan, "_pallas_tables_dev", None)
    if hit is not None:
        return hit
    cmap, scal, spline, statics = plan_tables(plan)
    dev = (jnp.asarray(cmap), jnp.asarray(scal), jnp.asarray(spline), statics)
    try:
        plan._pallas_tables_dev = dev
    except AttributeError:
        pass
    return dev


def develop_pallas(plan, plane, interpret: bool = False, staged: bool = False):
    """Develop one sensor plane through the megakernel. plane: [H0,W0] u16/f32
    raw counts (full sensor; plan's crop applied at staging), or the output
    of stage_plane_pallas when staged=True. Returns planar [3, H, W]
    quantized. Thumbnail plans dispatch to the fused scaled-demosaic
    kernel (staging layouts differ; staged_plane_cached handles both)."""
    assert pallas_supported(plan), "unsupported plan for the pallas executor"
    if plan.dem_path == "scaled":
        from .develop_scaled import develop_scaled, scaled_plan_for

        if scaled_plan_for(plan) is not None:
            return develop_scaled(plan, plane, interpret=interpret,
                                  staged=staged)
        from .develop_scaled_sep import develop_sep

        return develop_sep(plan, plane, staged=staged)
    plane = plane if staged else stage_plane_pallas(plan, plane)
    cmap, scal, spline, statics = plan_tables_device(plan)
    return _develop_pallas_jit(
        plane, cmap, scal, spline, interpret=interpret, **statics)


# Fold the batch into the Pallas grid (one pallas_call per batch) instead
# of a python loop of per-image kernels inside the jit. Settled by the
# hardware A/B (scripts/exp_batchgrid.py, v5e 2026-08-18): for the
# FULL-SIZE megakernel the grid form measured equal-or-slower in all
# three interleaved reps (2.43/2.51/2.37 ms/img vs 2.35/2.46/1.66 loop)
# — the per-image stack/slice overhead it removes is smaller than what
# the megagrid costs in scheduling — so the default stays OFF here. The
# SCALED kernel's A/B went the other way; see develop_scaled.BATCH_GRID.
BATCH_GRID = False


def batch_jit(planes_padded, cmap, scal, spline, *, per_image, interpret,
              **statics):
    """Route a batched megakernel develop to the grid-batched pallas_call
    (BATCH_GRID) or the legacy loop-of-kernels jit. scal/spline: [B,...]
    when per_image else single tables (broadcast for the grid form)."""
    if BATCH_GRID:
        if not per_image:
            B = planes_padded.shape[0]
            scal = jnp.broadcast_to(jnp.asarray(scal), (B,) + np.shape(scal))
            spline = jnp.broadcast_to(jnp.asarray(spline),
                                      (B,) + np.shape(spline))
        return _develop_pallas_batchgrid_jit(planes_padded, cmap, scal,
                                             spline, interpret=interpret,
                                             **statics)
    return _develop_pallas_batch_jit(planes_padded, cmap, scal, spline,
                                     per_image=per_image,
                                     interpret=interpret, **statics)


@partial(jax.jit, static_argnames=("cfa_name", "height", "width", "tile_h",
                                   "tile_w", "apply_curve", "n_knots",
                                   "linear", "out_bits", "bayer", "interpret",
                                   "per_image", "orientation_flips", "mode"))
def _develop_pallas_batch_jit(planes_padded, cmap, scal, spline, *, cfa_name,
                              height, width, tile_h, tile_w, apply_curve,
                              n_knots, linear, out_bits, bayer, interpret,
                              per_image,
                              orientation_flips=(False, False, False),
                              mode="cfa"):
    outs = []
    for i in range(planes_padded.shape[0]):
        s = scal[i] if per_image else scal
        sp = spline[i] if per_image else spline
        outs.append(_develop_pallas_jit(
            planes_padded[i], cmap, s, sp, cfa_name=cfa_name, height=height,
            width=width, tile_h=tile_h, tile_w=tile_w,
            apply_curve=apply_curve, n_knots=n_knots, linear=linear,
            out_bits=out_bits, bayer=bayer, interpret=interpret,
            orientation_flips=orientation_flips, mode=mode))
    return jnp.stack(outs, axis=0)


def develop_pallas_batch(plan, planes, interpret: bool = False,
                         staged: bool = False, param_plans=None):
    """Batched megakernel develop: the kernel runs once per image INSIDE one
    jit (sequential grid launches, one dispatch) -- the production serving
    shape; per-call dispatch overhead amortizes across the batch.

    planes: [B,H0,W0] raw counts, or staged [B,Hp,Wp] when staged=True.
    param_plans: optional per-image DevelopPlans (same statics; WB/levels/
    curves may differ per shot). Returns [B, 3, H, W]."""
    assert pallas_supported(plan), "unsupported plan for the pallas executor"
    if plan.dem_path == "scaled":
        from .develop_scaled import develop_scaled_batch, scaled_plan_for

        if scaled_plan_for(plan) is not None:
            return develop_scaled_batch(plan, planes, interpret=interpret,
                                        staged=staged,
                                        param_plans=param_plans)
        from .develop_scaled_sep import develop_sep, develop_sep_batch

        if param_plans is not None:
            # Per-image calibration: vmapping over params needs stacked
            # pytrees; a python loop inside one jit is equivalent here
            # (deep thumbnails are tiny) -- keep the simple exact form.
            outs = [develop_sep(pp, p, staged=staged)
                    for pp, p in zip(param_plans, planes)]
            return jnp.stack(outs)
        return develop_sep_batch(plan, planes, staged=staged)
    import numpy as _np

    if not staged:
        planes = jnp.stack([stage_plane_pallas(plan, p) for p in planes])
    cmap, scal, spline, statics = plan_tables(plan)
    per_image = param_plans is not None
    if per_image:
        tabs = [plan_tables(pp) for pp in param_plans]
        scal = _np.stack([t[1] for t in tabs])
        spline = _np.stack([t[2] for t in tabs])
    return batch_jit(
        planes, jnp.asarray(cmap), jnp.asarray(scal), jnp.asarray(spline),
        interpret=interpret, per_image=per_image, **statics)
