"""A/B: grid-batched megakernel (one pallas_call over [B,...]) vs the
legacy loop-of-kernels batched jit. Stable batched chained-slope
methodology (scripts/exp_r3b.py); run alone on the TPU."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import bench
# register() failures are per-process (sitecustomize swallows them), so a
# long in-process backoff can be futile -- keep this short and let the
# caller retry at process level.
bench._wait_for_backend(120)

from imagepipe_tpu import ImageSource, Pipeline
from imagepipe_tpu.engine import make_develop_plan
from imagepipe_tpu.raw import synthetic_bayer
from imagepipe_tpu.kernels import develop_pallas as dp


def sync(x):
    return int(np.asarray(jnp.sum(x.ravel()[::65537].astype(jnp.int32))))


def slope(fn, iters=4):
    out = fn(); sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out); t1 = time.perf_counter()
    for _ in range(3 * iters):
        out = fn()
    sync(out); t2 = time.perf_counter()
    return max(((t2 - t1) - (t1 - t0)) / (2 * iters), 1e-9)


raw = synthetic_bayer()
pipe = Pipeline.new_from_source(ImageSource.from_raw(raw))
plan = make_develop_plan(pipe, out_bits=8, numerics="direct")
B = 8
staged = jnp.stack([dp.stage_plane_pallas(plan, raw.data)] * B)
sync(staged)
mp = raw.width * raw.height / 1e6
plans = [plan] * B

# Correctness on hardware first: grid vs loop bit-equal.
dp.BATCH_GRID = True
g = dp.develop_pallas_batch(plan, staged, staged=True, param_plans=plans)
ga = np.asarray(g)
dp.BATCH_GRID = False
l = dp.develop_pallas_batch(plan, staged, staged=True, param_plans=plans)
la = np.asarray(l)
print("bit-equal:", np.array_equal(ga, la),
      "maxdiff:", int(np.abs(ga.astype(np.int32) - la.astype(np.int32)).max()),
      flush=True)

res = {}
for rep in range(3):
    for gridform in (False, True):
        dp.BATCH_GRID = gridform
        fn = lambda: dp.develop_pallas_batch(plan, staged, staged=True,
                                             param_plans=plans)
        out = fn(); sync(out)
        dt = slope(fn, iters=4) / B
        res.setdefault(gridform, []).append(dt * 1e3)
        print(f"rep{rep} grid={gridform}: {dt*1e3:.2f} ms/img "
              f"({mp/dt:.0f} MP/s)", flush=True)
print("summary:", {k: [f"{x:.2f}" for x in v] for k, v in res.items()},
      flush=True)

# --- Scaled (thumbnail) kernel: same A/B ---
from imagepipe_tpu.kernels import develop_scaled as ds
from imagepipe_tpu.kernels.develop_scaled import (develop_scaled_batch,
                                                  scaled_plan_for,
                                                  stage_scaled_np)

tpipe = Pipeline.new_from_source(ImageSource.from_raw(raw))
tpipe.globals.settings.maxwidth = 1024
tpipe.globals.settings.maxheight = 1024
tplan = make_develop_plan(tpipe, out_bits=8, numerics="direct")
assert tplan.dem_path == "scaled", tplan.dem_path
spn = scaled_plan_for(tplan)
tstaged = jnp.stack([jnp.asarray(stage_scaled_np(tplan, raw.data, spn))] * B)
sync(tstaged)
tplans = [tplan] * B

ds.BATCH_GRID = True
ga = np.asarray(develop_scaled_batch(tplan, tstaged, staged=True,
                                     param_plans=tplans))
ds.BATCH_GRID = False
la = np.asarray(develop_scaled_batch(tplan, tstaged, staged=True,
                                     param_plans=tplans))
print("scaled bit-equal:", np.array_equal(ga, la), flush=True)

sres = {}
for rep in range(3):
    for gridform in (False, True):
        ds.BATCH_GRID = gridform
        fn = lambda: develop_scaled_batch(tplan, tstaged, staged=True,
                                          param_plans=tplans)
        out = fn(); sync(out)
        dt = slope(fn, iters=4) / B
        sres.setdefault(gridform, []).append(dt * 1e3)
        print(f"scaled rep{rep} grid={gridform}: {dt*1e3:.2f} ms/img "
              f"({mp/dt:.0f} src-MP/s)", flush=True)
print("scaled summary:", {k: [f"{x:.2f}" for x in v]
                          for k, v in sres.items()}, flush=True)
