"""Round-4 rotation close-out (VERDICT r3 item 7), one TPU session:

  1. gather-loop 45 deg full-frame baseline -> the normalization anchor
     (the original recorded gather was 4.2 s; all targets are ratios)
  2. current [R,TC]-batched kernel at 45/20/5 deg
  3. the pre-776cfa0 kernel (1-sublane weight math) loaded from git as a
     sibling module and swapped in at the `kernels` package attribute
     (scaling.py resolves `from .kernels import rotate_pallas` at call
     time) -> same-session A/B of exactly the r4 change

Run alone on the TPU; chained-dispatch slopes.
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

import bench

bench._wait_for_backend(120)

from imagepipe_tpu import scaling
from imagepipe_tpu.buffer import OpBuffer
from imagepipe_tpu.ops.rotatecrop import OpRotateCrop
import imagepipe_tpu.kernels as kpkg
import imagepipe_tpu.kernels.rotate_pallas as rp_new


def sync(x):
    return int(np.asarray(jnp.sum(x.ravel()[::65537].astype(jnp.int32))))


def slope(fn, iters=3):
    out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    t1 = time.perf_counter()
    for _ in range(3 * iters):
        out = fn()
    sync(out)
    t2 = time.perf_counter()
    return max(((t2 - t1) - (t1 - t0)) / (2 * iters), 1e-9)


def say(msg):
    print(msg, flush=True)


def run_deg(deg, iters=3):
    rot = OpRotateCrop.empty()
    rot.rotation = deg / 90.0
    out = rot.run(None, rbuf)
    sync(out.data)
    dt = slope(lambda: rot.run(None, rbuf).data, iters=iters)
    return dt, out.width * out.height / 1e6


REPO = os.path.join(os.path.dirname(__file__), "..")
OLD = os.path.join(REPO, "imagepipe_tpu", "kernels", "_rotate_old_ab.py")

rng = np.random.default_rng(1)
rbuf = OpBuffer.from_hwc(rng.random((4024, 6048, 4), dtype=np.float32))
say(f"# device: {jax.devices()}")

# --- 1. gather-loop 45 deg baseline (slow: ~4-8 s/frame) ---
old_flag = scaling.USE_ROTATE_PALLAS
try:
    scaling.USE_ROTATE_PALLAS = False
    t0 = time.perf_counter()
    dt_gather, _ = run_deg(45, iters=1)
    say(f"gather 45deg: {dt_gather*1e3:.0f} ms "
        f"(section {time.perf_counter()-t0:.0f}s)")
finally:
    scaling.USE_ROTATE_PALLAS = old_flag

# --- 2. current kernel 45/20/5 ---
cur = {}
for deg in (45, 20, 5):
    dt, out_mp = run_deg(deg)
    cur[deg] = dt
    say(f"kernel(new) {deg}deg: {dt*1e3:.0f} ms ({out_mp/dt:.0f} out-MP/s)")

ratio = dt_gather / cur[45]
say(f"45deg speedup vs same-session gather: {ratio:.1f}x "
    f"(target >=28x == <=150 ms normalized to the 4.2s gather)")
say(f"45deg normalized-to-4.2s-gather: {4.2/ratio*1e3:.0f} ms")

# --- 3. old (pre-776cfa0) kernel, same session ---
src = subprocess.run(
    ["git", "-C", REPO, "show",
     "776cfa0~1:imagepipe_tpu/kernels/rotate_pallas.py"],
    capture_output=True, text=True, check=True).stdout
with open(OLD, "w") as f:
    f.write(src)
try:
    import imagepipe_tpu.kernels._rotate_old_ab as rp_old

    kpkg.rotate_pallas = rp_old
    sys.modules["imagepipe_tpu.kernels.rotate_pallas"] = rp_old
    oldres = {}
    for deg in (45, 5):
        dt, _ = run_deg(deg)
        oldres[deg] = dt
        say(f"kernel(old) {deg}deg: {dt*1e3:.0f} ms")
    say(f"same-session r4 change: 45deg {oldres[45]/cur[45]:.2f}x, "
        f"5deg {oldres[5]/cur[5]:.2f}x")
finally:
    kpkg.rotate_pallas = rp_new
    sys.modules["imagepipe_tpu.kernels.rotate_pallas"] = rp_new
    if os.path.exists(OLD):
        os.remove(OLD)
