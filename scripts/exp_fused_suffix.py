#!/usr/bin/env python3
"""Interleaved hardware A/B: fused dirty-suffix dispatch vs per-stage.

Measures the edit->1024px re-render device-time slope (bench.py 'edit'
section metric: monotonic exposures, chained-dispatch slope) with
pipeline.FUSE_SUFFIX ON and OFF, interleaved A/B/A/B reps so chip-state
drift cannot masquerade as a win (CLAUDE.md measurement rules). Also
asserts the fused 8-bit output is bit-equal to the staged one ON CHIP.

Run serialized (nothing else on the box):
    timeout 1800 python scripts/exp_fused_suffix.py
"""

import sys
import time

import numpy as np


def _sync(x):
    import jax.numpy as jnp

    return int(np.asarray(jnp.sum(x.ravel()[::65537].astype(jnp.int32))))


def main():
    import imagepipe_tpu.pipeline as plmod
    from imagepipe_tpu import ImageSource, Pipeline
    from imagepipe_tpu.raw import synthetic_bayer

    def make_session():
        ep = Pipeline.new_from_source(
            ImageSource.from_raw(synthetic_bayer(seed=3)))
        ep.globals.settings.maxwidth = 1024
        ep.globals.settings.maxheight = 1024
        return ep, Pipeline.new_cache(2 << 30), [0]

    def slope_ms(ep, cache, cnt, iters=8):
        def edit_once():
            cnt[0] += 1
            ep.ops.basecurve.exposure = 0.1 + 0.0005 * cnt[0]
            return ep.run(cache).data

        out = edit_once()
        _sync(out)  # warm the trace for this mode
        t0 = time.perf_counter()
        for _ in range(iters):
            out = edit_once()
        _sync(out)
        t1 = time.perf_counter()
        for _ in range(3 * iters):
            out = edit_once()
        _sync(out)
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / (2 * iters) * 1e3

    # On-chip bit-equality first (the contract the CPU tests pin, re-checked
    # on real hardware where fusion decisions differ).
    outs = {}
    for fuse in (True, False):
        plmod.FUSE_SUFFIX = fuse
        ep, cache, _ = make_session()
        ep.ops.basecurve.exposure = 0.25
        outs[fuse] = np.array(ep.output_8bit(cache).data)
    if np.array_equal(outs[True], outs[False]):
        print("on-chip bit-equality: OK")
    else:
        diff = np.abs(outs[True].astype(int) - outs[False].astype(int))
        print(f"on-chip bit-equality: FAILED maxdiff={diff.max()} "
              f"frac={np.mean(diff > 0):.2e}")
        return 1

    # Interleaved slopes: fresh session per rep per mode (the stage-cache
    # state is identical for both; trace caches persist per session).
    reps = 4
    rows = []
    for r in range(reps):
        rec = {}
        for fuse in (True, False):
            plmod.FUSE_SUFFIX = fuse
            ep, cache, cnt = make_session()
            ep.output_8bit(cache)  # populate cache so edits are suffix-only
            rec["fused" if fuse else "staged"] = slope_ms(ep, cache, cnt)
        rows.append(rec)
        print(f"rep {r}: fused {rec['fused']:.2f} ms/edit  "
              f"staged {rec['staged']:.2f} ms/edit", flush=True)
    f = sorted(r["fused"] for r in rows)
    s = sorted(r["staged"] for r in rows)
    print(f"median fused {f[len(f)//2]:.2f} ms/edit, "
          f"staged {s[len(s)//2]:.2f} ms/edit; "
          f"dispersion fused {f[0]:.2f}-{f[-1]:.2f}, "
          f"staged {s[0]:.2f}-{s[-1]:.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
