"""r3 rotation timing: channel-batched selection + kx-batched reductions
vs r2 recorded 118/151/293 ms at 5/20/45 deg (24MP 4ch f32)."""
import time
import numpy as np
import jax, jax.numpy as jnp

from imagepipe_tpu.buffer import OpBuffer
from imagepipe_tpu.ops.rotatecrop import OpRotateCrop

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
    rot = OpRotateCrop.empty()
    rot.rotation = deg / 90.0
    t0 = time.perf_counter()
    rout = rot.run(None, rbuf); sync(rout.data)
    comp = time.perf_counter() - t0
    out_mp = rout.width * rout.height / 1e6
    dt = slope(lambda: rot.run(None, rbuf).data)
    print(f"{deg}deg: compile {comp:.0f}s, {dt*1e3:.0f} ms ({out_mp/dt:.0f} out-MP/s)", flush=True)
