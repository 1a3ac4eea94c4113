"""Probe: force TC=64 at 20 deg and compare vs the model's TC=128 choice."""
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
rot = OpRotateCrop.empty(); rot.rotation = 20 / 90.0
for tc in (128, 64, 128):
    rp.TC = tc       # chooser: body(TC) vs body(64); TC=64 forces 64
    rp._rotate_jit.clear_cache()
    out = rot.run(None, rbuf); sync(out.data)
    dt = slope(lambda: rot.run(None, rbuf).data)
    out_mp = out.width * out.height / 1e6
    print(f"20deg TC-pref={tc}: {dt*1e3:.0f} ms ({out_mp/dt:.0f} out-MP/s)", flush=True)
rp.TC = 128
