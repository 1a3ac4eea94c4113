#!/usr/bin/env python3
"""Round-5 edit-slope attribution #2: output-buffer count.

exp_r5_edit.py eliminated dispatch issue (~0 ms slope), numpy-arg
transfers (+1-4 ms) and host planning (0.44 ms) — yet the edit slope is
~30 ms fused AND staged. The remaining structural difference from the
~0-ms micro is OUTPUT COUNT: an edit produces 4-5 device buffers (one
per cached stage) where the micro produced one. This script prices:

  1. k full-size outputs per dispatch, k = 1/2/4/6
  2. same but holding all outputs alive (separates handle-creation cost
     from deletion cost of the replaced buffers)
  3. jax.device_put of a tiny array (the per-edit param upload)
  4. the real edit slope with CACHE_FUSED_INTERMEDIATES on/off,
     interleaved

Run serialized: timeout 2400 python scripts/exp_r5_edit2.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _sync(x):
    import jax.numpy as jnp

    return int(np.asarray(jnp.sum(x.ravel()[::65537].astype(jnp.int32))))


def _slope_ms(fn, iters=8):
    out = fn()
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    t1 = time.perf_counter()
    for _ in range(3 * iters):
        out = fn()
    _sync(out)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (2 * iters) * 1e3


def main():
    import jax
    import jax.numpy as jnp

    import imagepipe_tpu.pipeline as plmod
    from imagepipe_tpu import ImageSource, Pipeline
    from imagepipe_tpu.raw import synthetic_bayer

    print(f"backend: {jax.default_backend()}", flush=True)
    small = "--small" in sys.argv

    base = jnp.asarray(np.random.default_rng(0)
                       .random((3, 683, 1024), np.float32))
    tick = jnp.asarray(np.float32(1e-6))

    def make_k(k):
        @jax.jit
        def work(x, t):
            outs = []
            d = x
            for i in range(k):
                d = jax.lax.optimization_barrier(d * 0.999 + t)
                outs.append(d)
            return tuple(outs)
        return work

    # 1: k outputs, replaced each call (old buffers deleted as refs drop)
    for k in (1, 2, 4, 6):
        work = make_k(k)
        cnt = [0]

        def f():
            cnt[0] += 1
            return work(base, tick * cnt[0])[-1]

        print(f"MICRO {k} full-size outputs/dispatch (replace): "
              f"{_slope_ms(f):.2f} ms", flush=True)

    # 2: 4 outputs, all held alive in a ring (no deletions during timing)
    work4 = make_k(4)
    ring = []
    cnt = [0]

    def f_hold():
        cnt[0] += 1
        outs = work4(base, tick * cnt[0])
        ring.append(outs)
        return outs[-1]

    print(f"MICRO 4 outputs, held alive (no deletes): "
          f"{_slope_ms(f_hold):.2f} ms  [ring={len(ring)}]", flush=True)
    ring.clear()

    # 3: device_put of a tiny array per call, on top of a 1-output dispatch
    work1 = make_k(1)
    smallarr = np.zeros((5, 16), np.float32)
    cnt = [0]

    def f_dput():
        cnt[0] += 1
        smallarr[0, 0] = cnt[0]
        t = jax.device_put(smallarr)
        return work1(base, t[0, 0] * 1e-6)[0]

    print(f"MICRO 1 output + device_put(tiny)/call: "
          f"{_slope_ms(f_dput):.2f} ms", flush=True)

    # 4: real edit slope, CACHE_FUSED_INTERMEDIATES on/off, interleaved
    def make_session():
        raw = (synthetic_bayer(192, 128, seed=3) if small
               else synthetic_bayer(seed=3))
        ep = Pipeline.new_from_source(ImageSource.from_raw(raw))
        ep.globals.settings.maxwidth = 1024
        ep.globals.settings.maxheight = 1024
        return ep, Pipeline.new_cache(2 << 30), [0]

    def edit_slope(cache_inter):
        plmod.FUSE_SUFFIX = True
        plmod.CACHE_FUSED_INTERMEDIATES = cache_inter
        ep, cache, cnt = make_session()
        ep.output_8bit(cache)

        def edit_once():
            cnt[0] += 1
            ep.ops.basecurve.exposure = 0.1 + 0.0005 * cnt[0]
            return ep.run(cache).data

        return _slope_ms(edit_once)

    # correctness guard first: final output equal both ways
    outs = {}
    for ci in (True, False):
        plmod.CACHE_FUSED_INTERMEDIATES = ci
        ep, cache, _ = make_session()
        ep.ops.basecurve.exposure = 0.25
        outs[ci] = np.array(ep.output_8bit(cache).data)
    assert np.array_equal(outs[True], outs[False]), "final-only caching changed bits!"
    print("final-only caching bit-equality: OK", flush=True)

    for r in range(1 if small else 3):
        a = edit_slope(True)
        b = edit_slope(False)
        print(f"rep {r}: edit slope cache-intermediates {a:.2f} ms/edit,"
              f" final-only {b:.2f} ms/edit", flush=True)
    plmod.CACHE_FUSED_INTERMEDIATES = True
    return 0


if __name__ == "__main__":
    sys.exit(main())
