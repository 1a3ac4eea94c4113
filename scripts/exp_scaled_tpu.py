"""TPU check + timing of the scaled-demosaic kernel (r3): correctness vs
the XLA scaled path on hardware, then chained-dispatch slope."""
import time
import numpy as np
import jax, jax.numpy as jnp

from imagepipe_tpu import ImageSource, Pipeline
from imagepipe_tpu.engine import make_develop_plan, _develop_single_jit
from imagepipe_tpu.raw import synthetic_bayer, synthetic_xtrans
from imagepipe_tpu.sources import staged_raw_plane
from imagepipe_tpu.kernels.develop_pallas import develop_pallas, pallas_supported, staged_plane_cached
from imagepipe_tpu.kernels.develop_scaled import scaled_plan_for

def sync(x):
    return int(np.asarray(jnp.sum(x.ravel()[::65537].astype(jnp.int32))))

def slope(fn, iters=4):
    out = fn(); sync(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn()
    sync(out); t1 = time.perf_counter()
    for _ in range(3*iters): out = fn()
    sync(out); t2 = time.perf_counter()
    return max(((t2-t1)-(t1-t0))/(2*iters), 1e-9)

print("device:", jax.devices()[0], flush=True)
for mk, name in ((synthetic_bayer, "bayer24"), (synthetic_xtrans, "xtrans26")):
    raw = mk()
    p = Pipeline.new_from_source(ImageSource.from_raw(raw))
    p.globals.settings.maxwidth = 1024
    p.globals.settings.maxheight = 1024
    plan = make_develop_plan(p, out_bits=8, numerics="direct")
    sp = scaled_plan_for(plan)
    print(name, "dem", plan.dem_w, plan.dem_h, "statics", sp.statics, flush=True)
    assert pallas_supported(plan)
    mp = raw.width * raw.height / 1e6
    staged = staged_plane_cached(plan, raw)
    t0 = time.perf_counter()
    out_p = develop_pallas(plan, staged, staged=True); sync(out_p)
    print(f"{name}: pallas compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    # XLA comparison on hardware
    plane = staged_raw_plane(raw)
    t0 = time.perf_counter()
    out_x = _develop_single_jit(plane, plan.params, **plan.statics()); sync(out_x)
    print(f"{name}: xla compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    d = np.abs(np.asarray(out_p).astype(int) - np.asarray(out_x).astype(int))
    print(f"{name}: maxdiff {d.max()} flips {(d!=0).mean():.6f}", flush=True)
    dt_p = slope(lambda: develop_pallas(plan, staged, staged=True))
    dt_x = slope(lambda: _develop_single_jit(plane, plan.params, **plan.statics()))
    print(f"{name}: pallas {dt_p*1e3:.2f} ms ({mp/dt_p:.0f} src-MP/s) | xla {dt_x*1e3:.2f} ms ({mp/dt_x:.0f} src-MP/s)", flush=True)
