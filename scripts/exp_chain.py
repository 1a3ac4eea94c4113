"""TPU experiment: true per-invocation kernel time via chained dispatch.

Hypothesis from exp3: every pallas-containing program pays a ~4.3ms fixed
dispatch cost on the remote runtime (noop kernel = 4.29ms), masking the true
kernel time. Chain k invocations inside ONE jit (inputs xor'd per step to
defeat CSE) and take the slope over k for (a) the closed-form Bayer
megakernel and (b) the XLA fused engine.
"""

import json
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from imagepipe_tpu import ImageSource, Pipeline
from imagepipe_tpu.engine import make_develop_plan, _develop_one
from imagepipe_tpu.raw import synthetic_bayer
from imagepipe_tpu.kernels import develop_pallas as dp
from imagepipe_tpu import color as cc


def sync(x):
    return int(np.asarray(jnp.sum(x).astype(jnp.int64)))


def main():
    print("devices:", jax.devices(), flush=True)
    W, H = 6000, 4000
    raw = synthetic_bayer(W, H)
    pipe = Pipeline.new_from_source(ImageSource.from_raw(raw))
    plan = make_develop_plan(pipe, out_bits=8)
    mp = W * H / 1e6

    dp.BAYER_CLOSED_FORM = True
    dp._develop_pallas_jit.clear_cache()

    staged = dp.stage_plane_pallas(plan, raw.data)
    plane = jnp.asarray(raw.data)

    import numpy as _np

    p = plan.params
    scal = _np.zeros((8, 16), _np.float32)
    scal[0, 0] = _np.asarray(p["mins"])[0]
    scal[0, 1] = _np.asarray(p["ranges"])[0]
    scal[1, :4] = _np.asarray(p["mul"])
    scal[2:5, :4] = _np.asarray(p["cmatrix"])
    scal[5:8, :3] = _np.asarray(p["rgbmatrix"])
    scal = jnp.asarray(scal)
    spline = _np.zeros((5, 16), _np.float32)
    n_knots = plan.n_knots if plan.apply_curve else 0
    if plan.apply_curve:
        spline[0, :n_knots] = _np.asarray(p["spline_xs"])
        spline[1, :n_knots] = _np.asarray(p["spline_ys"])
        spline[2, :n_knots] = _np.asarray(p["spline_c1"])
        spline[3, :n_knots - 1] = _np.asarray(p["spline_c2"])
        spline[4, :n_knots - 1] = _np.asarray(p["spline_c3"])
    spline = jnp.asarray(spline)
    from imagepipe_tpu.raw import CFA

    cfa = CFA(plan.cfa_name)
    cmap = jnp.asarray(dp._cmap_strip(cfa, *dp._tiles_for(plan)))
    tile_h, tile_w = dp._tiles_for(plan)
    statics = dict(cfa_name=plan.cfa_name, height=H, width=W, tile_h=tile_h,
                   tile_w=tile_w, apply_curve=plan.apply_curve,
                   n_knots=n_knots, linear=plan.linear, out_bits=8,
                   bayer=True, interpret=False)

    @partial(jax.jit, static_argnames=("k",))
    def chain_pallas(pp, cmap, scal, spline, k):
        acc = jnp.zeros((), jnp.int32)
        for i in range(k):
            out = dp._develop_pallas_jit(pp ^ jnp.uint16(i), cmap, scal,
                                         spline, **statics)
            acc = acc + jnp.sum(out[:, ::331, ::331].astype(jnp.int32))
        return acc

    est = plan.statics()

    @partial(jax.jit, static_argnames=("k",))
    def chain_xla(pl_, params, k):
        acc = jnp.zeros((), jnp.int32)
        with cc.numerics_mode(est["numerics"]):
            for i in range(k):
                out = _develop_one(pl_ ^ jnp.uint16(i), params, **est)
                acc = acc + jnp.sum(out[:, ::331, ::331].astype(jnp.int32))
        return acc

    for name, fn, arg in (
            ("pallas_cf", lambda k: chain_pallas(staged, cmap, scal, spline, k), None),
            ("xla", lambda k: chain_xla(plane, plan.params, k), None)):
        try:
            times = {}
            for k in (1, 2, 8):
                t0 = time.perf_counter()
                sync(fn(k))
                compile_s = time.perf_counter() - t0
                ts = []
                for _ in range(5):
                    t0 = time.perf_counter()
                    for _ in range(3):
                        o = fn(k)
                    sync(o)
                    ts.append((time.perf_counter() - t0) / 3)
                times[k] = min(ts)
                print(f"{name} k={k}: {times[k]*1e3:.2f} ms (compile {compile_s:.1f}s)",
                      flush=True)
            slope = (times[8] - times[2]) / 6
            print(json.dumps({"exp": name,
                              "per_invocation_ms": round(slope * 1e3, 2),
                              "mp_s": round(mp / slope, 1),
                              "k1_ms": round(times[1] * 1e3, 2),
                              "overhead_ms": round((times[1] - slope) * 1e3, 2)}),
                  flush=True)
        except Exception as e:
            import traceback

            traceback.print_exc()
            print(json.dumps({"exp": name, "error": str(e)[:500]}), flush=True)


if __name__ == "__main__":
    main()
