#!/usr/bin/env python3
"""Round-5 edit-slope attribution + A/B (VERDICT r4 item 1).

The r4 fused dirty-suffix dispatch did not move the edit slope (27.5 vs
27.2 ms/edit) even though it provably engaged. Hypothesis: the slope is
bound by per-edit HOST-BLOCKING work — each numpy jit argument is a
separate blocking host->device transfer through the remote tunnel, and
those transfers are identical in count for fused and staged paths —
while dispatches themselves pipeline (the headline slope at batch 8
shows per-dispatch issue cost is NOT in the slope).

Round-5 fix under test: device-cached chain params keyed by op shash
(only the edited op re-uploads, as ONE packed [5,n] array) + fused final
quantize + maximal-tail fusion.

Sections:
  0. on-chip bit-equality: fused vs staged 8-bit, default and active-crop
  1. interleaved A/B: fused(new) vs staged edit slope, 4 reps
  2. attribution micro-bench: dispatch slope of the same-size elementwise
     jit with 0 / 1 / 6 small numpy args per call vs all-device args
  3. host floor: pure cache-hit re-render (no device work)

Run serialized (nothing else on the box):
    timeout 2400 python scripts/exp_r5_edit.py
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
    small = "--small" in sys.argv  # CPU smoke: tiny frame, fewer reps

    def make_session(crop=0.0):
        raw = (synthetic_bayer(192, 128, seed=3) if small
               else synthetic_bayer(seed=3))
        ep = Pipeline.new_from_source(ImageSource.from_raw(raw))
        ep.globals.settings.maxwidth = 1024
        ep.globals.settings.maxheight = 1024
        if crop:
            ep.ops.rotatecrop.crop_left = crop
        return ep, Pipeline.new_cache(2 << 30), [0]

    # --- 0: on-chip bit-equality (default chain AND active-crop tail) ----
    for crop, label in ((0.0, "default"), (0.1, "active-crop tail")):
        outs = {}
        for fuse in (True, False):
            plmod.FUSE_SUFFIX = fuse
            ep, cache, _ = make_session(crop)
            ep.ops.basecurve.exposure = 0.25
            outs[fuse] = np.array(ep.output_8bit(cache).data)
        if np.array_equal(outs[True], outs[False]):
            print(f"on-chip bit-equality ({label}): OK", flush=True)
        else:
            diff = np.abs(outs[True].astype(int) - outs[False].astype(int))
            print(f"on-chip bit-equality ({label}): FAILED "
                  f"maxdiff={diff.max()} frac={np.mean(diff > 0):.2e}",
                  flush=True)
            return 1

    # --- 1: interleaved fused/staged edit slope -------------------------
    def edit_slope(fuse, iters=8):
        plmod.FUSE_SUFFIX = fuse
        ep, cache, cnt = make_session()
        ep.output_8bit(cache)  # populate cache so edits are suffix-only

        def edit_once():
            cnt[0] += 1
            ep.ops.basecurve.exposure = 0.1 + 0.0005 * cnt[0]
            return ep.run(cache).data

        return _slope_ms(edit_once, iters)

    rows = []
    for r in range(1 if small else 4):
        rec = {"fused": edit_slope(True), "staged": edit_slope(False)}
        rows.append(rec)
        print(f"rep {r}: fused {rec['fused']:.2f} ms/edit  "
              f"staged {rec['staged']:.2f} ms/edit", flush=True)
    f = sorted(r["fused"] for r in rows)
    s = sorted(r["staged"] for r in rows)
    print(f"EDIT SLOPE median fused {f[len(f)//2]:.2f} staged "
          f"{s[len(s)//2]:.2f} ms/edit; dispersion fused "
          f"{f[0]:.2f}-{f[-1]:.2f} staged {s[0]:.2f}-{s[-1]:.2f}",
          flush=True)

    # --- 2: attribution micro-bench --------------------------------------
    # Same-size elementwise work as the 1024px suffix; vary ONLY how many
    # small numpy arrays ride along per call.
    base = jnp.asarray(np.random.default_rng(0)
                       .random((3, 683, 1024), np.float32))
    smalls = [np.random.default_rng(i).random(24).astype(np.float32)
              for i in range(6)]
    dev_smalls = jax.device_put(smalls)

    @jax.jit
    def work(x, args):
        acc = x
        for a in args:
            acc = acc + a[0]
        return acc * 0.999

    cnt = [0]

    def run_k_numpy(k):
        def f():
            cnt[0] += 1
            # mutate one value so no arg-dedup can elide the transfer
            smalls[0][0] = cnt[0] * 1e-6
            return work(base, tuple(smalls[:k]) + tuple(dev_smalls[k:]))
        return f

    def run_all_dev():
        return work(base, tuple(dev_smalls))

    ms_dev = _slope_ms(run_all_dev)
    ms = {k: _slope_ms(run_k_numpy(k)) for k in (1, 3, 6)}
    print(f"MICRO dispatch slope, all-device args: {ms_dev:.2f} ms", flush=True)
    for k, v in ms.items():
        print(f"MICRO {k} numpy arg(s)/call: {v:.2f} ms "
              f"(delta {v - ms_dev:+.2f})", flush=True)

    # --- 3: host floor (pure cache hit) ----------------------------------
    plmod.FUSE_SUFFIX = True
    ep, cache, _ = make_session()
    ep.ops.basecurve.exposure = 0.123
    ep.output_8bit(cache)

    def hit_once():
        return ep.run(cache).data

    print(f"HOST floor (pure cache-hit re-render): "
          f"{_slope_ms(hit_once):.2f} ms", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
