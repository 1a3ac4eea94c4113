"""45-deg config sweep: (TC, R) combos vs the current chooser pick
(TC=64, R=8), interleaved with controls. 24MP 4ch f32."""
import time
import numpy as np
import jax, jax.numpy as jnp
from imagepipe_tpu.buffer import OpBuffer
from imagepipe_tpu.ops.rotatecrop import OpRotateCrop
from imagepipe_tpu.kernels import rotate_pallas as rp

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

rng = np.random.default_rng(1)
rbuf = OpBuffer.from_hwc(rng.random((4024, 6048, 4), dtype=np.float32))
rot = OpRotateCrop.empty(); rot.rotation = 45 / 90.0

ref = None
for tc, Rv in ((64, 8), (32, 8), (64, 16), (32, 16), (16, 16), (64, 8)):
    rp.TC = tc; rp.R = Rv
    rp._rotate_jit.clear_cache()
    out = rot.run(None, rbuf)
    got = np.asarray(out.data)
    if ref is None:
        ref = got
    ok = "exact" if np.array_equal(got, ref) else f"MAXDIFF {np.abs(got-ref).max()}"
    dt = slope(lambda: rot.run(None, rbuf).data)
    out_mp = out.width * out.height / 1e6
    print(f"45deg TC-pref={tc} R={Rv}: {dt*1e3:.0f} ms "
          f"({out_mp/dt:.0f} out-MP/s) [{ok}]", flush=True)
rp.TC = 128; rp.R = 8
