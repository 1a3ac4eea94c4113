"""Round-4 hardware measurements, batched for one serialized TPU session:

  1. deep-scale thumbnails: 24MP -> 256px / 160px through the NEW
     kx-chunked scaled kernel vs the XLA fused scaled path (VERDICT r3
     item 8: target >= 2x the XLA path's ~3.6k src-MP/s)
  2. rotation 45/20/5 deg with the [R,TC]-batched weight math
     (VERDICT r3 item 7: target <= 150 ms at 45 deg normalized)
  3. mono-mode megakernel vs the XLA engine (carve-out lift, item 9)
  4. >16-knot curve megakernel sanity timing (item 9)

Run alone on the TPU (one job at a time); chained-dispatch slopes.
"""
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import bench

from imagepipe_tpu import ImageSource, Pipeline
from imagepipe_tpu.engine import make_develop_plan, develop_fused
from imagepipe_tpu.raw import synthetic_bayer, synthetic_mono
from imagepipe_tpu.kernels.develop_pallas import (develop_pallas,
                                                  pallas_supported,
                                                  stage_plane_pallas)
from imagepipe_tpu.kernels.develop_scaled import (develop_scaled,
                                                  scaled_plan_for,
                                                  stage_scaled_np)


def sync(x):
    return int(np.asarray(jnp.sum(x.ravel()[::65537].astype(jnp.int32))))


def slope(fn, iters=4):
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    t1 = time.perf_counter()
    for _ in range(3 * iters):
        out = fn()
    sync(out)
    t2 = time.perf_counter()
    return max(((t2 - t1) - (t1 - t0)) / (2 * iters), 1e-9)


def say(msg):
    print(msg, flush=True)


def sec_deepscale():
    raw = synthetic_bayer(6048, 4024, seed=3)
    mp = 6048 * 4024 / 1e6
    for maxw in (256, 160, 1024):
        p = Pipeline.new_from_source(ImageSource.from_raw(raw))
        p.globals.settings.maxwidth = maxw
        p.globals.settings.maxheight = maxw
        plan = make_develop_plan(p, out_bits=8, numerics="direct")
        sp = scaled_plan_for(plan)
        kind = "none" if sp is None else (
            "chunked" if sp.statics.get("chunked") else "single")
        say(f"# maxw={maxw}: kernel form = {kind} "
            + (f"statics={ {k: sp.statics[k] for k in ('TH','K_x','K_y','D_y','D_x','CKX','nkx') if k in sp.statics} }"
               if sp is not None else ""))
        if sp is not None:
            staged = jnp.asarray(stage_scaled_np(plan, raw.data, sp))
            dt = slope(lambda: develop_scaled(plan, staged, staged=True,
                                              sp=sp))
            say(f"deepscale maxw={maxw}: kernel {dt*1e3:.2f} ms "
                f"({mp/dt:.0f} src-MP/s)")
        # XLA fused scaled comparison.
        from imagepipe_tpu.sources import staged_raw_plane
        from imagepipe_tpu.engine import _develop_single_jit

        plane = staged_raw_plane(raw)
        dt = slope(lambda: _develop_single_jit(plane, plan.params,
                                               **plan.statics()))
        say(f"deepscale maxw={maxw}: XLA fused {dt*1e3:.2f} ms "
            f"({mp/dt:.0f} src-MP/s)")


def sec_rotation():
    from imagepipe_tpu import scaling
    from imagepipe_tpu.buffer import OpBuffer
    from imagepipe_tpu.ops.rotatecrop import OpRotateCrop

    rng = np.random.default_rng(1)
    rbuf = OpBuffer.from_hwc(rng.random((4024, 6048, 4), dtype=np.float32))
    for deg in (45, 20, 5):
        rot = OpRotateCrop.empty()
        rot.rotation = deg / 90.0
        t0 = time.perf_counter()
        rout = rot.run(None, rbuf)
        sync(rout.data)
        comp = time.perf_counter() - t0
        out_mp = rout.width * rout.height / 1e6
        dt = slope(lambda: rot.run(None, rbuf).data, iters=3)
        say(f"rotation {deg}deg: compile {comp:.0f}s, {dt*1e3:.0f} ms "
            f"({out_mp/dt:.0f} out-MP/s)")
        if deg == 45:
            # ULP check vs the gather loop on a small crop of the frame.
            small = OpBuffer.from_hwc(
                np.asarray(rbuf.to_hwc()[:600, :800]).copy())
            r2 = OpRotateCrop.empty()
            r2.rotation = rot.rotation
            got = np.asarray(r2.run(None, small).data)
            old = scaling.USE_ROTATE_PALLAS
            try:
                scaling.USE_ROTATE_PALLAS = False
                r3 = OpRotateCrop.empty()
                r3.rotation = rot.rotation
                want = np.asarray(r3.run(None, small).data)
            finally:
                scaling.USE_ROTATE_PALLAS = old
            say(f"  45deg ULP check: maxdiff "
                f"{np.abs(got - want).max():.2e}")


def sec_mono():
    raw = synthetic_mono(6000, 4000, seed=2)
    p = Pipeline.new_from_source(ImageSource.from_raw(raw))
    plan = make_develop_plan(p, out_bits=8, numerics="direct")
    assert plan.mode == "mono" and pallas_supported(plan)
    staged = stage_plane_pallas(plan, raw.data)
    dt = slope(lambda: develop_pallas(plan, staged, staged=True))
    say(f"mono 24MP megakernel: {dt*1e3:.2f} ms ({24/dt:.0f} MP/s)")
    from imagepipe_tpu.sources import staged_raw_plane
    from imagepipe_tpu.engine import _develop_single_jit

    plane = staged_raw_plane(raw)
    dt = slope(lambda: _develop_single_jit(plane, plan.params,
                                           **plan.statics()))
    say(f"mono 24MP XLA fused:  {dt*1e3:.2f} ms ({24/dt:.0f} MP/s)")


def sec_knots():
    raw = synthetic_bayer(6000, 4000, seed=4)
    p = Pipeline.new_from_source(ImageSource.from_raw(raw))
    p.ops.basecurve.points = [
        (i / 23.0, min(1.0, (i / 23.0) ** 0.85)) for i in range(24)]
    plan = make_develop_plan(p, out_bits=8, numerics="direct")
    assert plan.n_knots > 16 and pallas_supported(plan)
    staged = stage_plane_pallas(plan, raw.data)
    dt = slope(lambda: develop_pallas(plan, staged, staged=True))
    say(f"24-knot 24MP megakernel: {dt*1e3:.2f} ms ({24/dt:.0f} MP/s)")


SECTIONS = dict(deepscale=sec_deepscale, rotation=sec_rotation,
                mono=sec_mono, knots=sec_knots)

if __name__ == "__main__":
    names = sys.argv[1:] or list(SECTIONS)
    say(f"# device: {jax.devices()}")
    for n in names:
        say(f"=== {n} ===")
        t0 = time.time()
        try:
            SECTIONS[n]()
        except Exception as e:
            say(f"section {n} FAILED: {e!r}")
        say(f"=== {n} done in {time.time()-t0:.0f}s ===")
