"""TPU experiment: decompose the Pallas megakernel's 10ms/24MP.

Variants (all closed-form Bayer, 8-bit out, no curve unless noted):
  dma_floor   -- DMA in, write constant (pure grid+DMA overhead)
  demosaic    -- levels + closed-form demosaic, quantize G directly
  color_only  -- skip demosaic (use center value for all channels)
  full        -- the real kernel (baseline, = develop_pallas closed-form)
  tile variants of `full`
Prints one JSON line per variant: compile s, min/med ms over rounds.
"""

import json
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from imagepipe_tpu import ImageSource, Pipeline
from imagepipe_tpu.engine import make_develop_plan
from imagepipe_tpu.raw import synthetic_bayer

HALO = 8
HALO_X = 128

_LAB_E = np.float32(np.float32(216.0) / np.float32(24389.0))
_LAB_K = np.float32(np.float32(24389.0) / np.float32(27.0))
_XW, _YW, _ZW = np.float32(0.95047), np.float32(1.0), np.float32(1.08883)


def make_kernel(tile_h, tile_w, height, width, variant, outdt=jnp.uint8):
    f = jnp.float32

    def kernel(scal_ref, plane_hbm, r_ref, g_ref, b_ref, ptiles_ref, dma_sems):
        TILE_W = tile_w
        i = pl.program_id(0)
        j = pl.program_id(1)
        nj = pl.num_programs(1)
        y0 = i * tile_h
        x0 = j * TILE_W
        step = i * nj + j
        nsteps = pl.num_programs(0) * nj

        def start_dma(s, slot):
            ii = s // nj
            jj = s % nj
            return pltpu.make_async_copy(
                plane_hbm.at[pl.ds(ii * tile_h, tile_h + 2 * HALO),
                             pl.ds(jj * TILE_W, TILE_W + 2 * HALO_X)],
                ptiles_ref.at[slot], dma_sems.at[slot])

        if variant == "noop":
            z = jnp.zeros((tile_h, TILE_W), r_ref.dtype)
            r_ref[...] = z
            g_ref[...] = z
            b_ref[...] = z
            return

        @pl.when(step == 0)
        def _():
            start_dma(0, 0).start()

        @pl.when(step + 1 < nsteps)
        def _():
            start_dma(step + 1, (step + 1) % 2).start()

        start_dma(step, step % 2).wait()

        if variant == "dma_floor":
            z = ptiles_ref[step % 2][HALO:HALO + tile_h, HALO_X:HALO_X + TILE_W]
            z = (z.astype(jnp.int32) & 0).astype(r_ref.dtype)
            r_ref[...] = z
            g_ref[...] = z
            b_ref[...] = z
            return

        plane = ptiles_ref[step % 2]
        if plane.dtype != f:
            plane = plane.astype(jnp.int32).astype(f)
        black = scal_ref[0, 0]
        rng = scal_ref[0, 1]
        v = jnp.minimum((plane - black) / rng, 1.0)

        if variant == "levels":
            q = jnp.clip(v[HALO:HALO + tile_h, HALO_X:HALO_X + TILE_W] * 256.0,
                         0.0, 255.0)
            if r_ref.dtype == jnp.uint8:
                q = q.astype(jnp.int32).astype(jnp.uint8)
            r_ref[...] = q
            g_ref[...] = q
            b_ref[...] = q
            return

        rows = jax.lax.broadcasted_iota(jnp.int32, v.shape, 0) + (y0 - HALO)
        cols = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1) + (x0 - HALO_X)
        valid = ((rows >= 0) & (rows < height) & (cols >= 0) & (cols < width)).astype(f)

        def sl(a, dy, dx):
            return a[HALO + dy:HALO + dy + tile_h, HALO_X + dx:HALO_X + dx + TILE_W]

        if variant == "color_only":
            c_ctr = sl(v, 0, 0)
            rgbe = [c_ctr, c_ctr, c_ctr, c_ctr * 0.0]
        else:
            vv = v * valid
            c_ctr = sl(v, 0, 0)
            e_sum = sl(vv, -1, 0) + sl(vv, 1, 0) + sl(vv, 0, -1) + sl(vv, 0, 1)
            e_cnt = sl(valid, -1, 0) + sl(valid, 1, 0) + sl(valid, 0, -1) + sl(valid, 0, 1)
            h_sum = sl(vv, 0, -1) + sl(vv, 0, 1)
            h_cnt = sl(valid, 0, -1) + sl(valid, 0, 1)
            v_sum = sl(vv, -1, 0) + sl(vv, 1, 0)
            v_cnt = sl(valid, -1, 0) + sl(valid, 1, 0)
            d_sum = sl(vv, -1, -1) + sl(vv, -1, 1) + sl(vv, 1, -1) + sl(vv, 1, 1)
            d_cnt = sl(valid, -1, -1) + sl(valid, -1, 1) + sl(valid, 1, -1) + sl(valid, 1, 1)

            def avg(s, c):
                return jnp.where(c > 0.0, s / c, 0.0)

            orows = jax.lax.broadcasted_iota(jnp.int32, (tile_h, TILE_W), 0) + y0
            ocols = jax.lax.broadcasted_iota(jnp.int32, (tile_h, TILE_W), 1) + x0
            pr0 = ((orows & 1) == 0).astype(f)
            pc0 = ((ocols & 1) == 0).astype(f)
            is_r = pr0 * pc0          # RGGB
            is_b = (1.0 - pr0) * (1.0 - pc0)
            is_g = 1.0 - is_r - is_b
            g_h = pr0
            h_avg = avg(h_sum, h_cnt)
            v_avg = avg(v_sum, v_cnt)
            d_avg = avg(d_sum, d_cnt)
            r_at_g = g_h * h_avg + (1.0 - g_h) * v_avg
            b_at_g = g_h * v_avg + (1.0 - g_h) * h_avg
            rgbe = [
                is_r * c_ctr + is_g * r_at_g + is_b * d_avg,
                is_g * c_ctr + (is_r + is_b) * avg(e_sum, e_cnt),
                is_b * c_ctr + is_g * b_at_g + is_r * d_avg,
                c_ctr * 0.0,
            ]

        if variant == "demosaic":
            qs = [jnp.clip(o * 256.0, 0.0, 255.0).astype(jnp.int32).astype(jnp.uint8)
                  for o in rgbe[:3]]
            r_ref[...] = qs[0]
            g_ref[...] = qs[1]
            b_ref[...] = qs[2]
            return

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
            ch = jnp.clip(ch, 0.0, 1.0)
            hi = 1.055 * jnp.exp(jnp.log(jnp.maximum(ch, 1e-30)) * (1.0 / 2.4)) - 0.055
            ch = jnp.where(ch < 0.0031308, ch * 12.92, hi)
            outs.append(ch)
        qs = [jnp.clip(o * 256.0, 0.0, 255.0) for o in outs]
        if r_ref.dtype == jnp.uint8:
            qs = [q.astype(jnp.int32).astype(jnp.uint8) for q in qs]
        r_ref[...] = qs[0]
        g_ref[...] = qs[1]
        b_ref[...] = qs[2]

    return kernel


@partial(jax.jit, static_argnames=("tile_h", "tile_w", "height", "width", "variant", "f32out"))
def run_variant(plane_padded, scal, *, tile_h, tile_w, height, width, variant, f32out=False):
    grid = (pl.cdiv(height, tile_h), pl.cdiv(width, tile_w))
    outdt = jnp.float32 if f32out else jnp.uint8
    kernel = make_kernel(tile_h, tile_w, height, width, variant, outdt)
    r, g, b = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, tile_w), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((height, width), outdt)] * 3,
        scratch_shapes=[
            pltpu.VMEM((2, tile_h + 2 * HALO, tile_w + 2 * HALO_X), plane_padded.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(scal, plane_padded)
    return jnp.stack([r, g, b], axis=0)


def sync(x):
    return int(np.asarray(jnp.sum(x.ravel()[::65537].astype(jnp.int32))))


def main():
    print("devices:", jax.devices(), flush=True)
    W, H = 6000, 4000
    raw = synthetic_bayer(W, H)
    pipe = Pipeline.new_from_source(ImageSource.from_raw(raw))
    plan = make_develop_plan(pipe, out_bits=8)
    mp = W * H / 1e6

    p = plan.params
    scal = np.zeros((8, 16), np.float32)
    scal[0, 0] = np.asarray(p["mins"])[0]
    scal[0, 1] = np.asarray(p["ranges"])[0]
    scal[1, :4] = np.asarray(p["mul"])
    scal[2:5, :4] = np.asarray(p["cmatrix"])
    scal[5:8, :3] = np.asarray(p["rgbmatrix"])
    scal = jnp.asarray(scal)

    configs = [
        ("noop", 96, 384, "u16", False),
        ("dma_floor", 96, 384, "u16", False),
        ("levels", 96, 384, "u16", True),
        ("levels", 32, 6144, "u16", False),
        ("full", 32, 6144, "u16", False),
        ("full", 64, 3072, "u16", False),
        ("full", 32, 6144, "f32", False),
    ]

    plane = jnp.asarray(raw.data)
    for variant, th, tw, dt, f32out in configs:
        name = f"{variant}_{th}x{tw}_{dt}" + ("_f32out" if f32out else "")
        try:
            grid_rows = -(-H // th)
            grid_cols = -(-W // tw)
            pad_bottom = grid_rows * th + HALO - H
            pad_right = grid_cols * tw + HALO_X - W
            src = plane.astype(jnp.float32) if dt == "f32" else plane
            pp = jnp.pad(src, ((HALO, pad_bottom), (HALO_X, pad_right)))
            sync(pp)
            t0 = time.perf_counter()
            out = run_variant(pp, scal, tile_h=th, tile_w=tw, height=H,
                              width=W, variant=variant, f32out=f32out)
            sync(out)
            compile_s = time.perf_counter() - t0
            ts = []
            for _ in range(4):
                t0 = time.perf_counter()
                for _ in range(8):
                    out = run_variant(pp, scal, tile_h=th, tile_w=tw,
                                      height=H, width=W, variant=variant,
                                      f32out=f32out)
                sync(out)
                ts.append((time.perf_counter() - t0) / 8)
            best = min(ts)
            print(json.dumps({"exp": name, "compile_s": round(compile_s, 1),
                              "min_ms": round(best * 1e3, 2),
                              "med_ms": round(sorted(ts)[len(ts) // 2] * 1e3, 2),
                              "min_mp_s": round(mp / best, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"exp": name, "error": str(e)[:1500]}), flush=True)

if __name__ == "__main__":
    main()
