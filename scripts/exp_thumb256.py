"""Envelope-edge probe: 24MP Bayer -> 256px (scale ~23, outside the
scaled kernel's K<=16 envelope -> XLA fused path) vs -> 1024px (kernel).
Device-time slopes, same session."""
import time
import numpy as np
import jax, jax.numpy as jnp
from imagepipe_tpu import ImageSource, Pipeline
from imagepipe_tpu.engine import make_develop_plan, develop_fused
from imagepipe_tpu.kernels.develop_pallas import pallas_supported, develop_pallas
from imagepipe_tpu.kernels.develop_scaled import scaled_plan_for, stage_scaled_np
from imagepipe_tpu.raw import synthetic_bayer

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

raw = synthetic_bayer(6048, 4024, seed=3)
src_mp = raw.width * raw.height / 1e6
for maxw in (256, 416, 1024):
    p = Pipeline.new_from_source(ImageSource.from_raw(raw))
    p.globals.settings.maxwidth = maxw
    plan = make_develop_plan(p, out_bits=8, numerics="direct")
    sp = scaled_plan_for(plan)
    route = "pallas" if (pallas_supported(plan) and sp is not None) else "xla"
    if route == "pallas":
        # Device-resident staged plane: feeding host numpy would re-upload
        # 48MB through the tunnel per call and swamp the kernel time.
        staged = jnp.asarray(stage_scaled_np(plan, raw.data, sp)); sync(staged)
        dt = slope(lambda: develop_pallas(plan, staged, staged=True))
    else:
        plane = jnp.asarray(raw.data); sync(plane)
        dt = slope(lambda: develop_fused(plan, plane))
    print(f"24MP->{maxw}px [{route}]: {dt*1e3:.2f} ms "
          f"({src_mp/dt:.0f} src-MP/s)", flush=True)
