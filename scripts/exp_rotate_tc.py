"""TPU probe: adaptive tile width at 45 deg (correctness vs gather + slope)."""
import time
import numpy as np
import jax, jax.numpy as jnp

from imagepipe_tpu.buffer import OpBuffer
from imagepipe_tpu.ops.rotatecrop import OpRotateCrop
from imagepipe_tpu.kernels import rotate_pallas as rp
from imagepipe_tpu import scaling

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
for deg in (45, 20, 5):
    rot = OpRotateCrop.empty()
    rot.rotation = deg / 90.0
    t0 = time.perf_counter()
    rout = rot.run(None, rbuf); sync(rout.data)
    comp = time.perf_counter() - t0
    out_mp = rout.width * rout.height / 1e6
    dt = slope(lambda: rot.run(None, rbuf).data)
    print(f"{deg}deg: compile {comp:.0f}s, {dt*1e3:.0f} ms ({out_mp/dt:.0f} out-MP/s)", flush=True)
    if deg == 45:
        # ULP check vs the gather loop on a small crop region of the frame
        small = OpBuffer.from_hwc(np.asarray(rbuf.to_hwc()[:600, :800]).copy())
        r2 = OpRotateCrop.empty(); r2.rotation = rot.rotation
        got = np.asarray(r2.run(None, small).data)
        old = scaling.USE_ROTATE_PALLAS
        try:
            scaling.USE_ROTATE_PALLAS = False
            r3 = OpRotateCrop.empty(); r3.rotation = rot.rotation
            want = np.asarray(r3.run(None, small).data)
        finally:
            scaling.USE_ROTATE_PALLAS = old
        d = np.abs(got - want)
        print(f"  45deg ULP check: maxdiff {d.max():.2e}", flush=True)
