"""Probe: rows-per-group R=8 vs R=16 in the rotation kernel (fewer,
taller selection matmuls vs larger per-group sub-windows), interleaved
same-session at 5/20/45 deg on the 24MP 4ch f32 config."""
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

for deg in (5, 20, 45):
    rot = OpRotateCrop.empty(); rot.rotation = deg / 90.0
    for Rv in (8, 16, 8):
        rp.R = Rv
        rp._rotate_jit.clear_cache()
        out = rot.run(None, rbuf); sync(out.data)
        dt = slope(lambda: rot.run(None, rbuf).data)
        out_mp = out.width * out.height / 1e6
        print(f"{deg}deg R={Rv}: {dt*1e3:.0f} ms ({out_mp/dt:.0f} out-MP/s)",
              flush=True)
rp.R = 8
