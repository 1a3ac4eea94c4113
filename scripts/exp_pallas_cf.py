"""TPU experiment: does the closed-form Bayer Pallas path still crash Mosaic,
and how do the paths compare on 24MP?

Runs (serialized, one TPU job):
  1. XLA fused engine timing (baseline to beat).
  2. Pallas generic-mask kernel timing.
  3. Closed-form Bayer: small-frame compile repro, then 24MP timing if it
     compiles. Correctness vs the fused engine (<=1 LSB).

Prints one JSON line per result; full tracebacks on failure.
"""

import json
import sys
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from imagepipe_tpu import ImageSource, Pipeline
from imagepipe_tpu.engine import make_develop_plan, _develop_single_jit
from imagepipe_tpu.raw import synthetic_bayer
from imagepipe_tpu.kernels import develop_pallas as dp


def sync(x):
    return int(np.asarray(jnp.sum(x.ravel()[::65537].astype(jnp.int32))))


def slope_time(fn, n1=2, n2=10):
    out = fn()
    sync(out)  # warm
    t0 = time.perf_counter()
    for _ in range(n1):
        out = fn()
    sync(out)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n2):
        out = fn()
    sync(out)
    t2 = time.perf_counter() - t0
    return (t2 - t1) / (n2 - n1)


def report(name, **kw):
    print(json.dumps({"exp": name, **kw}), flush=True)


def main():
    print("devices:", jax.devices(), flush=True)
    W, H = 6000, 4000
    raw = synthetic_bayer(W, H)
    pipe = Pipeline.new_from_source(ImageSource.from_raw(raw))
    plan = make_develop_plan(pipe, out_bits=8)
    plane = jnp.asarray(raw.data)
    sync(plane)
    mp = W * H / 1e6

    # 1. XLA fused baseline
    t0 = time.perf_counter()
    want = _develop_single_jit(plane, plan.params, **plan.statics())
    sync(want)
    report("xla_compile", seconds=round(time.perf_counter() - t0, 1))
    dt = slope_time(lambda: _develop_single_jit(plane, plan.params, **plan.statics()))
    report("xla_fused_24mp", ms=round(dt * 1e3, 2), mp_s=round(mp / dt, 1))
    want_np = np.asarray(want).astype(int)

    # 2. Pallas generic-mask kernel
    try:
        t0 = time.perf_counter()
        got = dp.develop_pallas(plan, plane)
        sync(got)
        report("pallas_generic_compile", seconds=round(time.perf_counter() - t0, 1))
        diff = np.abs(np.asarray(got).astype(int) - want_np)
        dt = slope_time(lambda: dp.develop_pallas(plan, plane))
        report("pallas_generic_24mp", ms=round(dt * 1e3, 2), mp_s=round(mp / dt, 1),
               max_diff=int(diff.max()), flip_frac=float((diff != 0).mean()))
    except Exception:
        traceback.print_exc()
        report("pallas_generic_24mp", error=True)

    # 3. Closed-form Bayer: small frame first (cheap crash repro)
    dp.BAYER_CLOSED_FORM = True
    dp._develop_pallas_jit.clear_cache()
    sraw = synthetic_bayer(1152, 768)
    spipe = Pipeline.new_from_source(ImageSource.from_raw(sraw))
    splan = make_develop_plan(spipe, out_bits=8)
    splane = jnp.asarray(sraw.data)
    try:
        t0 = time.perf_counter()
        sgot = dp.develop_pallas(splan, splane)
        sync(sgot)
        report("pallas_cf_small_compile", seconds=round(time.perf_counter() - t0, 1))
        swant = np.asarray(_develop_single_jit(splane, splan.params, **splan.statics())).astype(int)
        sdiff = np.abs(np.asarray(sgot).astype(int) - swant)
        report("pallas_cf_small", max_diff=int(sdiff.max()),
               flip_frac=float((sdiff != 0).mean()))
    except Exception:
        traceback.print_exc()
        report("pallas_cf_small", error=True)
        return

    # 4. Closed-form 24MP timing
    try:
        t0 = time.perf_counter()
        got = dp.develop_pallas(plan, plane)
        sync(got)
        report("pallas_cf_compile", seconds=round(time.perf_counter() - t0, 1))
        diff = np.abs(np.asarray(got).astype(int) - want_np)
        dt = slope_time(lambda: dp.develop_pallas(plan, plane))
        report("pallas_cf_24mp", ms=round(dt * 1e3, 2), mp_s=round(mp / dt, 1),
               max_diff=int(diff.max()), flip_frac=float((diff != 0).mean()))
    except Exception:
        traceback.print_exc()
        report("pallas_cf_24mp", error=True)


if __name__ == "__main__":
    main()
