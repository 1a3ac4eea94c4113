#!/usr/bin/env python3
"""Round-5 main hardware session.

Sections (each prints immediately; run serialized, nothing else on box):
  1. edit slope AFTER the numerics-default fix (the r4 27-30 ms/edit was
     the staged path tracing 'lut' mode on TPU: per-pixel LUT gathers
     serialize on the VPU ~1000x — round-5 attribution). Interleaved
     fused/staged A/B + on-chip bit-equality.
  2. separable two-level scaled path: 24MP->160px and ->256px device
     slopes vs the XLA fused scaled path, batch-8 form, and the on-chip
     <=1 LSB check. 256px also vs the kx-chunked Pallas scaled kernel.
  3. megakernel headline sanity (same-session anchor).

    timeout 3600 python scripts/exp_r5_main.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _sync(x):
    import jax.numpy as jnp

    return int(np.asarray(jnp.sum(x.ravel()[::65537].astype(jnp.int32))))


def _slope_ms(fn, iters=6):
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

    import imagepipe_tpu.pipeline as plmod
    from imagepipe_tpu import ImageSource, Pipeline
    from imagepipe_tpu.raw import synthetic_bayer

    print(f"backend: {jax.default_backend()}", flush=True)
    small = "--small" in sys.argv

    # ---- 1. edit slope post numerics fix --------------------------------
    def make_session():
        r = (synthetic_bayer(384, 256, seed=3) if small
             else synthetic_bayer(seed=3))
        ep = Pipeline.new_from_source(ImageSource.from_raw(r))
        ep.globals.settings.maxwidth = 1024
        ep.globals.settings.maxheight = 1024
        return ep, Pipeline.new_cache(2 << 30), [0]

    outs = {}
    for fuse in (True, False):
        plmod.FUSE_SUFFIX = fuse
        ep, cache, _ = make_session()
        ep.ops.basecurve.exposure = 0.25
        outs[fuse] = np.array(ep.output_8bit(cache).data)
    if np.array_equal(outs[True], outs[False]):
        print("edit bit-equality fused==staged (direct mode): OK", flush=True)
    else:
        d = np.abs(outs[True].astype(int) - outs[False].astype(int))
        print(f"edit bit-equality: maxdiff={d.max()} "
              f"frac={(d > 0).mean():.2e}", flush=True)

    def edit_slope(fuse, iters=8):
        plmod.FUSE_SUFFIX = fuse
        ep, cache, cnt = make_session()
        ep.output_8bit(cache)

        def edit_once():
            cnt[0] += 1
            ep.ops.basecurve.exposure = 0.1 + 0.0005 * cnt[0]
            return ep.run(cache).data

        return _slope_ms(edit_once, iters)

    for r in range(3):
        a = edit_slope(True)
        b = edit_slope(False)
        print(f"EDIT rep {r}: fused {a:.2f} ms/edit, staged {b:.2f} ms/edit",
              flush=True)
    plmod.FUSE_SUFFIX = True

    # ---- 2. separable scaled path ---------------------------------------
    from imagepipe_tpu.engine import make_develop_plan, develop_fused
    from imagepipe_tpu.kernels.develop_scaled import scaled_plan_for
    from imagepipe_tpu.kernels.develop_scaled_sep import (
        _tables_device, develop_sep, develop_sep_batch, sep_plan_for,
        stage_sep_np)
    from imagepipe_tpu.sources import staged_raw_plane

    raw = synthetic_bayer(1536, 1024, seed=4) if small else synthetic_bayer(seed=4)
    mp = raw.width * raw.height / 1e6
    sizes = (48, 96) if small else (160, 256)

    def plan_for(maxw):
        p = Pipeline.new_from_source(ImageSource.from_raw(raw))
        p.globals.settings.maxwidth = maxw
        p.globals.settings.maxheight = maxw
        return make_develop_plan(p, out_bits=8, numerics="direct")

    for maxw in sizes:
        plan = plan_for(maxw)
        assert plan.dem_path == "scaled", plan.dem_path
        sps = sep_plan_for(plan)
        kx = scaled_plan_for(plan)
        print(f"[{maxw}px] sep={'yes' if sps else 'no'} "
              f"kx-kernel={'yes' if kx else 'no'}", flush=True)
        if sps is None:
            continue
        staged = jnp.asarray(stage_sep_np(plan, raw.data))
        _tables_device(plan, sps)   # upload once (cached per plan)
        got = np.asarray(develop_sep(plan, staged, staged=True)).astype(int)
        plane = staged_raw_plane(raw)
        want = np.asarray(develop_fused(plan, plane)).astype(int)
        d = np.abs(got - want)
        print(f"[{maxw}px] sep vs XLA on chip: maxdiff={d.max()} "
              f"flips={(d > 0).mean():.2e}", flush=True)
        t_sep = _slope_ms(lambda: develop_sep(plan, staged, staged=True))
        t_xla = _slope_ms(lambda: develop_fused(plan, plane))
        print(f"[{maxw}px] DEVICE slope: sep {t_sep:.2f} ms "
              f"({mp / t_sep * 1e3:.0f} src-MP/s) vs XLA fused "
              f"{t_xla:.2f} ms ({mp / t_xla * 1e3:.0f}) = "
              f"{t_xla / t_sep:.2f}x", flush=True)
        if kx is not None and jax.default_backend() != "cpu":
            from imagepipe_tpu.kernels.develop_pallas import (
                develop_pallas, staged_plane_cached)

            kst = staged_plane_cached(plan, raw)
            t_kx = _slope_ms(lambda: develop_pallas(plan, kst, staged=True))
            print(f"[{maxw}px] kx-chunked kernel: {t_kx:.2f} ms "
                  f"({mp / t_kx * 1e3:.0f} src-MP/s)", flush=True)
        # batch-8
        planes8 = jnp.stack([staged] * 8)
        t_b8 = _slope_ms(lambda: develop_sep_batch(plan, planes8,
                                                   staged=True))
        print(f"[{maxw}px] sep batch-8: {t_b8 / 8:.2f} ms/img "
              f"({mp / (t_b8 / 8) * 1e3:.0f} src-MP/s)", flush=True)

    # ---- 3. headline sanity ---------------------------------------------
    if small:
        return 0
    from imagepipe_tpu.kernels.develop_pallas import (
        develop_pallas_batch, stage_plane_np)

    fplan = plan_for(0)
    assert fplan.dem_path == "full"
    st = jnp.stack([jnp.asarray(stage_plane_np(fplan, raw.data))] * 8)
    t = _slope_ms(lambda: develop_pallas_batch(fplan, st, staged=True),
                  iters=3)
    print(f"HEADLINE sanity: megakernel batch-8 {t / 8:.2f} ms/img "
          f"({mp / (t / 8) * 1e3:.0f} MP/s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
