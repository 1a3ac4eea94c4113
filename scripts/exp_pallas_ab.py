"""Interleaved A/B/C timing: XLA fused vs Pallas generic vs Pallas closed-form
on 24MP Bayer. Remote-tunnel timing is noisy, so each path is measured in
interleaved rounds and reported as min/median of per-round slope estimates.
"""

import json
import sys
import time
import traceback

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from imagepipe_tpu import ImageSource, Pipeline
from imagepipe_tpu.engine import make_develop_plan, _develop_single_jit
from imagepipe_tpu.raw import synthetic_bayer
from imagepipe_tpu.kernels import develop_pallas as dp


def sync(x):
    return int(np.asarray(jnp.sum(x.ravel()[::65537].astype(jnp.int32))))


def round_time(fn, iters=10):
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    print("devices:", jax.devices(), flush=True)
    W, H = 6000, 4000
    raw = synthetic_bayer(W, H)
    pipe = Pipeline.new_from_source(ImageSource.from_raw(raw))
    plan = make_develop_plan(pipe, out_bits=8)
    plane = jnp.asarray(raw.data)
    sync(plane)
    mp = W * H / 1e6

    dp.BAYER_CLOSED_FORM = True
    dp._develop_pallas_jit.clear_cache()

    def xla():
        return _develop_single_jit(plane, plan.params, **plan.statics())

    def cf():
        return dp.develop_pallas(plan, plane)

    paths = {"xla": xla, "pallas_cf": cf}

    # Warm up / compile all paths first.
    want = None
    for name, fn in paths.items():
        t0 = time.perf_counter()
        out = fn()
        sync(out)
        print(f"compile {name}: {time.perf_counter()-t0:.1f}s", flush=True)
        arr = np.asarray(out).astype(int)
        if want is None:
            want = arr
        else:
            d = np.abs(arr - want)
            print(f"  {name} vs xla: max_diff={d.max()} flips={(d!=0).mean():.4f}",
                  flush=True)

    times = {k: [] for k in paths}
    for rnd in range(6):
        for name, fn in paths.items():
            dt = round_time(fn)
            times[name].append(dt)
            print(f"round {rnd} {name}: {dt*1e3:.2f} ms", flush=True)

    for name, ts in times.items():
        best = min(ts)
        med = sorted(ts)[len(ts) // 2]
        print(json.dumps({"exp": name, "min_ms": round(best * 1e3, 2),
                          "med_ms": round(med * 1e3, 2),
                          "min_mp_s": round(mp / best, 1)}), flush=True)


if __name__ == "__main__":
    main()
