"""r3b: thumbnail wall after memoization + batched interior-split A/B."""
import time
import numpy as np
import jax, jax.numpy as jnp

from imagepipe_tpu import ImageSource, Pipeline
from imagepipe_tpu.engine import make_develop_plan
from imagepipe_tpu.raw import synthetic_bayer
from imagepipe_tpu.kernels import develop_pallas as dp

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

# 1) Thumbnail pipeline wall (plan + tables + staging now memoized).
raw = synthetic_bayer()
tp = Pipeline.new_from_source(ImageSource.from_raw(raw))
tp.globals.settings.maxwidth = 1024
tp.globals.settings.maxheight = 1024
t0 = time.perf_counter(); tp.output_8bit(None)
print(f"thumb first call (compile): {time.perf_counter()-t0:.1f}s", flush=True)
lats = []
for _ in range(6):
    t0 = time.perf_counter(); tp.output_8bit(None)
    lats.append(time.perf_counter() - t0)
p50 = sorted(lats)[3] * 1e3
print(f"thumb pipeline wall p50: {p50:.1f} ms ({24.5/ (p50/1e3):.0f} src-MP/s)", flush=True)

# 2) Batched interior-split A/B (stable measurement shape).
plan = make_develop_plan(tp if False else Pipeline.new_from_source(ImageSource.from_raw(raw)), out_bits=8, numerics="direct")
staged = jnp.stack([dp.stage_plane_pallas(plan, raw.data)] * 8); sync(staged)
mp = raw.width * raw.height / 1e6
res = {}
for rep in range(2):
    for split in (False, True):
        dp.INTERIOR_SPLIT = split
        dp._develop_pallas_jit.clear_cache()
        out = dp.develop_pallas_batch(plan, staged, staged=True); sync(out)
        dt = slope(lambda: dp.develop_pallas_batch(plan, staged, staged=True), iters=4) / 8
        res.setdefault(split, []).append(dt * 1e3)
        print(f"rep{rep} batched split={split}: {dt*1e3:.2f} ms/img ({mp/dt:.0f} MP/s)", flush=True)
print("summary:", {k: [f"{x:.2f}" for x in v] for k, v in res.items()}, flush=True)
