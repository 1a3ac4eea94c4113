"""r3 sweep: (interior-split x DMA depth) on 24MP Bayer; X-Trans tile
heights. Same-process, interleaved repeats, chained-dispatch slope."""
import time
import numpy as np
import jax, jax.numpy as jnp

from imagepipe_tpu import ImageSource, Pipeline
from imagepipe_tpu.engine import make_develop_plan
from imagepipe_tpu.raw import synthetic_bayer, synthetic_xtrans
from imagepipe_tpu.kernels import develop_pallas as dp

def sync(x):
    return int(np.asarray(jnp.sum(x.ravel()[::65537].astype(jnp.int32))))

def slope(fn, iters=10):
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
staged = dp.stage_plane_pallas(plan, raw.data); sync(staged)

variants = [(True, 2), (False, 2), (True, 3), (False, 3)]
res = {v: [] for v in variants}
for rep in range(3):
    for split, nbuf in variants:
        dp.INTERIOR_SPLIT = split
        dp.N_DMA_BUF = nbuf
        dp._develop_pallas_jit.clear_cache()
        out = dp.develop_pallas(plan, staged, staged=True); sync(out)
        dt = slope(lambda: dp.develop_pallas(plan, staged, staged=True))
        res[(split, nbuf)].append(dt * 1e3)
        print(f"rep{rep} split={split} nbuf={nbuf}: {dt*1e3:.2f} ms", flush=True)
print("BAYER24 summary (ms):", flush=True)
for v, xs in res.items():
    print(f"  split={v[0]} nbuf={v[1]}: min {min(xs):.2f} med {sorted(xs)[1]:.2f}", flush=True)

# X-Trans tile height sweep (r2 verdict #9).
dp.INTERIOR_SPLIT = True
dp.N_DMA_BUF = 2
xr = synthetic_xtrans()
xp = Pipeline.new_from_source(ImageSource.from_raw(xr))
xplan = make_develop_plan(xp, out_bits=8, numerics="direct")
xmp = xr.width * xr.height / 1e6
orig_thf = dp._tile_h_for
xres = {}
for th in (96, 192, 288):
    dp._tile_h_for = lambda cfa_h, ob, _th=th: _th
    dp._develop_pallas_jit.clear_cache()
    xstaged = dp.stage_plane_pallas(xplan, xr.data); sync(xstaged)
    t0 = time.perf_counter()
    out = dp.develop_pallas(xplan, xstaged, staged=True); sync(out)
    comp = time.perf_counter() - t0
    dts = []
    for rep in range(2):
        dts.append(slope(lambda: dp.develop_pallas(xplan, xstaged, staged=True), iters=6) * 1e3)
    xres[th] = dts
    print(f"xtrans tile_h={th}: compile {comp:.0f}s, {['%.2f' % d for d in dts]} ms", flush=True)
dp._tile_h_for = orig_thf
print("XTRANS summary:", {k: min(v) for k, v in xres.items()}, flush=True)
