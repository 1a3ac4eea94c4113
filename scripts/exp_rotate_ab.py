"""A/B: channel-batched rotation selection (nch=4) vs per-channel (nch=1)."""
import time
import numpy as np
import jax, jax.numpy as jnp

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

import math
rng = np.random.default_rng(1)
h, w, C = 4024, 6048, 4
src = jnp.asarray(rng.random((C, h, w), dtype=np.float32)); sync(src)

def corners(deg):
    # Mirror OpRotateCrop's geometry: rotate the full frame by deg.
    rad = math.radians(deg)
    c, s = math.cos(rad), math.sin(rad)
    nw = int(round(w * c + h * s)); nh = int(round(w * s + h * c))
    # inverse-mapped corners (reference rotate_point_reverse style)
    def rot(px, py):
        cx, cy = w / 2.0, h / 2.0
        dx, dy = px - nw / 2.0, py - nh / 2.0
        return (cx + dx * c - dy * (-s), cy + dx * (-s) * -1 + dy * c)
    tl = rot(0, 0); tr = rot(nw - 1, 0); bl = rot(0, nh - 1)
    return tl, tr, bl, nw, nh

res = {}
for deg in (5, 45):
    tl, tr, bl, nw, nh = corners(deg)
    plan = rp.rotate_plan(w, h, tl, tr, bl, nw, nh, C)
    assert plan is not None
    statics, *tabs = plan
    print(deg, "K", statics["K_x"], statics["K_y"], "D_g", statics["D_g"],
          "D_xr", statics["D_xr"], "nch", statics["nch"], flush=True)
    for rep in range(2):
        for nch in (4, 1):
            st = dict(statics); st["nch"] = min(nch, st["nch"]) if nch == 1 else st["nch"]
            st["nch"] = nch if nch <= st["components"] else st["nch"]
            pl2 = (st, *tabs)
            dt = slope(lambda: rp.rotate_resample_planar(
                src, w, h, tl, tr, bl, nw, nh, C, plan=pl2))
            res.setdefault((deg, nch), []).append(dt * 1e3)
            print(f"  rep{rep} {deg}deg nch={nch}: {dt*1e3:.0f} ms", flush=True)
print({k: [f"{x:.0f}" for x in v] for k, v in res.items()})
