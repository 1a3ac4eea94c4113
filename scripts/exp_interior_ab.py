"""A/B: interior-specialized megakernel vs masked-always, same process."""
import time
import numpy as np
import jax, jax.numpy as jnp

from imagepipe_tpu import ImageSource, Pipeline
from imagepipe_tpu.engine import make_develop_plan
from imagepipe_tpu.raw import synthetic_bayer
from imagepipe_tpu.kernels import develop_pallas as dp

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

raw = synthetic_bayer()
p = Pipeline.new_from_source(ImageSource.from_raw(raw))
plan = make_develop_plan(p, out_bits=8, numerics="direct")
mp = raw.width * raw.height / 1e6
staged = dp.stage_plane_pallas(plan, raw.data)
sync(staged)
outs = {}
for split in (False, True, False, True):   # interleave to cancel drift
    dp.INTERIOR_SPLIT = split
    dp._develop_pallas_jit.clear_cache()
    t0 = time.perf_counter()
    out = dp.develop_pallas(plan, staged, staged=True); sync(out)
    comp = time.perf_counter() - t0
    dt = slope(lambda: dp.develop_pallas(plan, staged, staged=True))
    outs.setdefault(split, []).append(dt)
    print(f"split={split}: compile {comp:.1f}s, {dt*1e3:.2f} ms/frame ({mp/dt:.0f} MP/s)", flush=True)
for k, v in outs.items():
    print(k, [f"{x*1e3:.2f}" for x in v])
