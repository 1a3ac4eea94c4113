"""TPU timing of the interior-specialized megakernel (r3 VERDICT #7)."""
import time
import numpy as np
import jax, jax.numpy as jnp

from imagepipe_tpu import ImageSource, Pipeline
from imagepipe_tpu.engine import make_develop_plan
from imagepipe_tpu.raw import synthetic_bayer, synthetic_xtrans
from imagepipe_tpu.kernels.develop_pallas import (
    develop_pallas, stage_plane_pallas, pallas_supported)

def sync(x):
    return int(np.asarray(jnp.sum(x.ravel()[::65537].astype(jnp.int32))))

def slope(fn, iters=8):
    out = fn(); sync(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn()
    sync(out); t1 = time.perf_counter()
    for _ in range(3*iters): out = fn()
    sync(out); t2 = time.perf_counter()
    return max(((t2-t1)-(t1-t0))/(2*iters), 1e-9)

print("device:", jax.devices()[0], flush=True)
for mk, name, bits in ((synthetic_bayer, "bayer24-8b", 8),
                       (synthetic_bayer, "bayer24-16b", 16),
                       (synthetic_xtrans, "xtrans26-8b", 8)):
    raw = mk()
    p = Pipeline.new_from_source(ImageSource.from_raw(raw))
    if bits == 16:
        p.globals.settings.linear = True
    plan = make_develop_plan(p, out_bits=bits, numerics="direct")
    assert pallas_supported(plan)
    mp = raw.width * raw.height / 1e6
    staged = stage_plane_pallas(plan, raw.data)
    t0 = time.perf_counter()
    out = develop_pallas(plan, staged, staged=True); sync(out)
    print(f"{name}: compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    dt = slope(lambda: develop_pallas(plan, staged, staged=True))
    print(f"{name}: {dt*1e3:.2f} ms/frame ({mp/dt:.0f} MP/s)", flush=True)
