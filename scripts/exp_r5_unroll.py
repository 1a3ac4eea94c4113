#!/usr/bin/env python3
"""Round-5 continuation: static-unroll A/B for the aligned resampler.

The banded-selection close-out named the K_y*K_x fori structure (block
slices re-materialized per window step) as the next lever. The `unroll`
static makes every slice offset compile-time constant so XLA can CSE
the band slices and fuse across window steps. This measures it the only
way that counts: interleaved on/off reps on the chip at the two
fulldown shapes the banded A/B used, banded=True (the production
routing at these shapes).

    timeout 2400 python scripts/exp_r5_unroll.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _sync(x):
    import jax.numpy as jnp

    if isinstance(x, (tuple, list)):
        x = x[0]
    return int(np.asarray(jnp.sum(x.ravel()[::65537].astype(jnp.int32))))


def _slope_ms(fn, iters=2):
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

    print(f"backend: {jax.default_backend()}", flush=True)
    from imagepipe_tpu import ImageSource, Pipeline
    from imagepipe_tpu import scaling as sc
    from imagepipe_tpu.engine import make_develop_plan
    from imagepipe_tpu.raw import synthetic_bayer

    raw = synthetic_bayer(seed=5)
    rgbe = jnp.asarray(np.random.default_rng(1).random(
        (4, raw.height, raw.width), np.float32))

    e2e = "--e2e" in sys.argv
    for maxw in (4800, 3200):
        pf = Pipeline.new_from_source(ImageSource.from_raw(raw))
        pf.globals.settings.maxwidth = maxw
        pf.globals.settings.maxheight = maxw
        planf = make_develop_plan(pf, out_bits=8, numerics="direct")
        if e2e:
            # End-to-end fused fulldown under the resolved default
            # (unroll=None -> ON for small windows on accelerators);
            # record against the round-5 banded numbers 59.3 / 31.0 ms.
            from imagepipe_tpu.engine import develop_fused
            from imagepipe_tpu.sources import staged_raw_plane

            plane = staged_raw_plane(raw)
            mp = raw.width * raw.height / 1e6
            t = _slope_ms(lambda: develop_fused(planf, plane))
            print(f"e2e maxw={maxw}: XLA fused fulldown {t:.2f} ms "
                  f"({mp/t*1e3:.0f} src-MP/s)", flush=True)
            continue
        cfa_tile = jnp.zeros((48, 48), jnp.uint8)
        kwb = dict(width=planf.width, height=planf.height, topleft=(0, 0),
                   topright=(planf.width - 1, 0),
                   bottomleft=(0, planf.height - 1),
                   nwidth=planf.dem_w, nheight=planf.dem_h, components=4,
                   cfa_key=None, out_dtype=jnp.float32, planar=True,
                   banded=True)
        print(f"shape {planf.width}x{planf.height} -> "
              f"{planf.dem_w}x{planf.dem_h}", flush=True)
        # compile both variants up front so rep 0 isn't a compile
        for u in (False, True):
            t0 = time.perf_counter()
            _sync(sc._transform_aligned_impl(rgbe, cfa_tile, unroll=u, **kwb))
            print(f"  compile unroll={u}: {time.perf_counter()-t0:.1f}s",
                  flush=True)
        for rep in range(3):
            tu = _slope_ms(lambda: sc._transform_aligned_impl(
                rgbe, cfa_tile, unroll=True, **kwb))
            tf = _slope_ms(lambda: sc._transform_aligned_impl(
                rgbe, cfa_tile, unroll=False, **kwb))
            print(f"  rep {rep}: unroll {tu:.2f} ms vs fori {tf:.2f} ms "
                  f"({tf / max(tu, 1e-9):.2f}x)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
