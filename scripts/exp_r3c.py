"""r3c: scaled-kernel TH sweep (batched, stable) + rotation TC=64 at 20deg."""
import time
import numpy as np
import jax, jax.numpy as jnp

from imagepipe_tpu import ImageSource, Pipeline
from imagepipe_tpu.engine import make_develop_plan
from imagepipe_tpu.raw import synthetic_bayer
from imagepipe_tpu.kernels import develop_scaled as ds

def sync(x):
    return int(np.asarray(jnp.sum(x.ravel()[::65537].astype(jnp.int32))))

def slope(fn, iters=6):
    out = fn(); sync(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn()
    sync(out); t1 = time.perf_counter()
    for _ in range(3*iters): out = fn()
    sync(out); t2 = time.perf_counter()
    return max(((t2-t1)-(t1-t0))/(2*iters), 1e-9)

raw = synthetic_bayer()
p = Pipeline.new_from_source(ImageSource.from_raw(raw))
p.globals.settings.maxwidth = 1024
p.globals.settings.maxheight = 1024
plan = make_develop_plan(p, out_bits=8, numerics="direct")
mp = raw.width * raw.height / 1e6

# Batched thumbnails under different VMEM budgets (TH ladder picks).
# Staging depends on the plan's Hp/Wp, so restage per budget.
for budget_mb in (11, 16):
    ds._VMEM_BUDGET = budget_mb * 1024 * 1024
    ds._GEOM_CACHE.clear()
    ds._develop_scaled_jit.clear_cache()
    ds._develop_scaled_batch_jit.clear_cache()
    sp = ds.scaled_plan_for(plan)
    planes = np.stack([ds.stage_scaled_np(plan, raw.data, sp)] * 8)
    planes_d = jnp.asarray(planes); sync(planes_d)
    print(f"budget {budget_mb}MB -> TH={sp.statics['TH']} D_y={sp.statics['D_y']}", flush=True)
    try:
        out = ds.develop_scaled_batch(plan, planes_d, staged=True); sync(out)
        dt = slope(lambda: ds.develop_scaled_batch(plan, planes_d, staged=True), iters=4) / 8
        print(f"  batched thumb: {dt*1e3:.2f} ms/img ({mp/dt:.0f} src-MP/s)", flush=True)
    except Exception as e:
        print(f"  FAILED: {str(e)[:200]}", flush=True)
