#!/usr/bin/env python3
"""Round-5 hardware session #2: compute-floor anchors + fulldown A/B.

  A. VPU arithmetic anchor: slope of a fused XLA fma-chain vs chain
     length K on a 24MP 3-plane f32 array -> achieved f32 ops/s.
  B. Transcendental anchor: same with exp(log(x)*c) pairs.
  C. Megakernel stage_limit attribution (batch form, stable slopes).
  D. Fulldown/plaindown carve-out measured arithmetic (VERDICT item 5):
     XLA fused near-full-size resize develop vs megakernel-full +
     XLA scale_down as separate dispatches.

    timeout 3600 python scripts/exp_r5_floor.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _sync(x):
    import jax.numpy as jnp

    if isinstance(x, (tuple, list)):
        x = x[0]
    return int(np.asarray(jnp.sum(x.ravel()[::65537].astype(jnp.int32))))


def _slope_ms(fn, iters=4):
    out = fn()
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    t1 = time.perf_counter()
    for _ in range(3 * iters):
        out = fn()
    _sync(out)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (2 * iters) * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    print(f"backend: {jax.default_backend()}", flush=True)
    small = "--small" in sys.argv
    d_only = "--d-only" in sys.argv   # re-run the fulldown A/B alone
    H, W = (256, 384) if small else (4000, 6000)
    N = 3 * H * W
    x0 = jnp.asarray(np.random.default_rng(0)
                     .random((3, H, W), np.float32) + 0.25)

    # ---- A. fma-chain anchor ---------------------------------------------
    @partial(jax.jit, static_argnames=("k",))
    def fma_chain(x, t, *, k):
        acc = x
        for i in range(k):
            acc = acc * 1.0000001 + t
        return acc

    cnt = [0]
    res = {}
    for k in () if d_only else (32, 128, 512):
        def f(k=k):
            cnt[0] += 1
            return fma_chain(x0, jnp.float32(cnt[0] * 1e-9), k=k)
        res[k] = _slope_ms(f)
        print(f"A fma-chain K={k}: {res[k]:.3f} ms", flush=True)
    ks = sorted(res)
    dk = ks[-1] - ks[0] if res else 0
    dms = res[ks[-1]] - res[ks[0]] if res else 0.0
    if dms > 0:
        ops = N * dk * 2 / (dms * 1e-3)
        print(f"A achieved VPU f32: {ops/1e12:.2f} Tops/s "
              f"({dms/dk*1e3/N*1e9:.3f} ns per elem-fma... "
              f"{dms/dk:.4f} ms per pass of {N/1e6:.0f}M fmas)", flush=True)

    # ---- B. transcendental anchor ----------------------------------------
    @partial(jax.jit, static_argnames=("k",))
    def exp_chain(x, t, *, k):
        acc = x
        for i in range(k):
            acc = jnp.exp(jnp.log(jnp.maximum(acc, 1e-30)) * 0.99) + t
        return acc

    res = {}
    for k in () if d_only else (4, 16, 64):
        def f(k=k):
            cnt[0] += 1
            return exp_chain(x0, jnp.float32(cnt[0] * 1e-9), k=k)
        res[k] = _slope_ms(f)
        print(f"B exp/log-chain K={k}: {res[k]:.3f} ms", flush=True)
    ks = sorted(res)
    dms = res[ks[-1]] - res[ks[0]] if res else 0.0
    if dms > 0:
        per = dms / (ks[-1] - ks[0])
        print(f"B exp+log pair: {per:.4f} ms per pass over {N/1e6:.0f}M "
              f"elems ({per*1e6/N*1e3:.2f} ps/elem)", flush=True)

    if small:
        return 0

    # ---- C. megakernel stage attribution (batch-8) ------------------------
    from imagepipe_tpu import ImageSource, Pipeline
    from imagepipe_tpu.engine import make_develop_plan, develop_fused
    from imagepipe_tpu.raw import synthetic_bayer
    from imagepipe_tpu.kernels.develop_pallas import (
        _develop_pallas_jit, _tiles_for, plan_tables_device, stage_plane_np)

    raw = synthetic_bayer(seed=5)
    mp = raw.width * raw.height / 1e6
    p = Pipeline.new_from_source(ImageSource.from_raw(raw))
    plan = make_develop_plan(p, out_bits=8, numerics="direct")
    cmap, scal, spline, statics = plan_tables_device(plan)
    staged = jnp.asarray(stage_plane_np(plan, raw.data))
    for sl in () if d_only else (1, 2, 3, 4):
        t = _slope_ms(lambda sl=sl: _develop_pallas_jit(
            staged, cmap, scal, spline, interpret=False, stage_limit=sl,
            **statics))
        print(f"C stage_limit={sl}: {t:.3f} ms/frame", flush=True)

    # ---- D. fulldown / plaindown measured arithmetic ----------------------
    from imagepipe_tpu import scaling as sc
    from imagepipe_tpu.kernels.develop_pallas import develop_pallas

    for maxw in (4800, 3200):
        pf = Pipeline.new_from_source(ImageSource.from_raw(raw))
        pf.globals.settings.maxwidth = maxw
        pf.globals.settings.maxheight = maxw
        planf = make_develop_plan(pf, out_bits=8, numerics="direct")
        print(f"D maxw={maxw}: dem_path={planf.dem_path} "
              f"dem={planf.dem_w}x{planf.dem_h}", flush=True)
        from imagepipe_tpu.sources import staged_raw_plane

        plane = staged_raw_plane(raw)
        t_xla = _slope_ms(lambda: develop_fused(planf, plane))
        print(f"D XLA fused {planf.dem_path}: {t_xla:.2f} ms "
              f"({mp/t_xla*1e3:.0f} src-MP/s)", flush=True)
        # split prototype: megakernel full-size 16-bit linear + XLA resize
        # of the quantized planes is NOT semantics-equivalent (the resize
        # must happen pre-color on RGBE); measure the pieces instead:
        # megakernel full develop (the floor of any split that demosaics
        # full-size) + a standalone 4ch paraboloid resize at this scale.
        t_full = _slope_ms(lambda: develop_pallas(plan, staged, staged=True))
        rgbe = jnp.asarray(np.random.default_rng(1).random(
            (4, plan.height, plan.width), np.float32))
        scale_fn = jax.jit(lambda a: sc.scale_down_planar(
            a, planf.dem_w, planf.dem_h, 4))
        t_rs = _slope_ms(lambda: scale_fn(rgbe))
        print(f"D split pieces: megakernel-full {t_full:.2f} ms + "
              f"resampler {t_rs:.2f} ms = {t_full + t_rs:.2f} ms "
              f"vs XLA fused {t_xla:.2f}", flush=True)

        # Banded vs global column selection, interleaved (the round-5
        # banded rewrite; bit-equality is pinned on CPU by
        # test_banded_selection_bitexact_vs_global).
        cfa_tile = jnp.zeros((48, 48), jnp.uint8)
        kwb = dict(width=plan.width, height=plan.height, topleft=(0, 0),
                   topright=(plan.width - 1, 0),
                   bottomleft=(0, plan.height - 1),
                   nwidth=planf.dem_w, nheight=planf.dem_h, components=4,
                   cfa_key=None, out_dtype=jnp.float32, planar=True)
        for rep in range(2):
            tb = _slope_ms(lambda: sc._transform_aligned_impl(
                rgbe, cfa_tile, banded=True, **kwb), iters=2)
            tg = _slope_ms(lambda: sc._transform_aligned_impl(
                rgbe, cfa_tile, banded=False, **kwb), iters=2)
            print(f"D rep {rep}: banded {tb:.2f} ms vs global {tg:.2f} ms "
                  f"({tg / max(tb, 1e-9):.2f}x)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
