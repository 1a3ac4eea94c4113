#!/usr/bin/env python3
"""Round-5 edit-slope attribution #3: host-blocking breakdown.

exp_r5_edit/edit2 proved the ~30 ms/edit is not dispatch issue, not
transfers, not output buffers, not host planning (cache-hit floor is
0.44 ms). Whatever remains must BLOCK the host inside edit_once. This
script (a) cProfiles 24 chained edits, (b) hand-times each phase of the
edit path with perf_counter (no syncs - only host-blocking steps can
show up).

Run serialized: timeout 2400 python scripts/exp_r5_edit3.py
"""

import cProfile
import io
import os
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _sync(x):
    import jax.numpy as jnp

    return int(np.asarray(jnp.sum(x.ravel()[::65537].astype(jnp.int32))))


def main():
    import jax

    import imagepipe_tpu.pipeline as plmod
    from imagepipe_tpu import ImageSource, Pipeline
    from imagepipe_tpu.raw import synthetic_bayer

    print(f"backend: {jax.default_backend()}", flush=True)
    small = "--small" in sys.argv

    raw = (synthetic_bayer(192, 128, seed=3) if small
           else synthetic_bayer(seed=3))
    ep = Pipeline.new_from_source(ImageSource.from_raw(raw))
    ep.globals.settings.maxwidth = 1024
    ep.globals.settings.maxheight = 1024
    cache = Pipeline.new_cache(2 << 30)
    ep.output_8bit(cache)
    cnt = [0]

    def edit_once():
        cnt[0] += 1
        ep.ops.basecurve.exposure = 0.1 + 0.0005 * cnt[0]
        return ep.run(cache).data

    out = edit_once()
    _sync(out)

    # (a) cProfile 24 chained edits (sync only at the end).
    pr = cProfile.Profile()
    pr.enable()
    for _ in range(24):
        out = edit_once()
    pr.disable()
    t0 = time.perf_counter()
    _sync(out)
    t_sync = time.perf_counter() - t0
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(28)
    body = s.getvalue()
    print(body[:4200], flush=True)
    print(f"[trailing sync wait: {t_sync*1e3:.1f} ms]", flush=True)

    # (b) hand-timed phases inside _dispatch_fused via monkeypatch.
    times = {}

    def t(name, f):
        t0 = time.perf_counter()
        r = f()
        times[name] = times.get(name, 0.0) + time.perf_counter() - t0
        return r

    orig_dispatch = plmod.Pipeline._dispatch_fused

    def timed_dispatch(self, ops, startpos, chains, bufin, ophashes,
                       cache_, final_quant):
        import jax as _jax

        from imagepipe_tpu import color as cc
        from imagepipe_tpu.buffer import OpBuffer

        seg_ops = ops[startpos:startpos + len(chains)]
        cache_inter = plmod.CACHE_FUSED_INTERMEDIATES and cache_ is not None
        key = (startpos, final_quant, cache_inter, bufin.data.shape,
               str(bufin.data.dtype), cc.get_numerics_mode(),
               tuple(c[0] for c in chains))
        memo = self._suffix_jits
        jitted = memo.get(key)
        assert jitted is not None
        pmemo = getattr(self, "_chain_params", None)
        if pmemo is None:
            pmemo = self._chain_params = {}
        dev_params = []
        for op, c in zip(seg_ops, chains):
            if not c[2]:
                dev_params.append(())
                continue
            pkey = (op.name(), op.shash(), c[0])
            cached = pmemo.get(pkey)
            if cached is None:
                cached = t("device_put",
                           lambda: _jax.device_put(c[2]))
                pmemo[pkey] = cached
            dev_params.append(cached)
        outs, quant = t("jit_call",
                        lambda: jitted(bufin.data, tuple(dev_params)))
        def wrap():
            if cache_inter:
                result = bufin
                for i, (c, o) in enumerate(zip(chains, outs)):
                    w, h, colors, mono = c[3]
                    result = OpBuffer(w, h, colors, mono, o)
                    cache_.put_arc(ophashes[startpos + i], result,
                                   result.nbytes())
            else:
                w, h, colors, mono = chains[-1][3]
                result = OpBuffer(w, h, colors, mono, outs[-1])
                cache_.put_arc(ophashes[startpos + len(chains) - 1],
                               result, result.nbytes())
            return result
        result = t("wrap_cache", wrap)
        return result, quant

    plmod.Pipeline._dispatch_fused = timed_dispatch
    try:
        N = 24
        tall0 = time.perf_counter()
        for _ in range(N):
            t0 = time.perf_counter()
            cnt[0] += 1
            ep.ops.basecurve.exposure = 0.1 + 0.0005 * cnt[0]
            out = t("run_total", lambda: ep.run(cache).data)
        tall1 = time.perf_counter()
        _sync(out)
        tall2 = time.perf_counter()
    finally:
        plmod.Pipeline._dispatch_fused = orig_dispatch
    print(f"PHASES over {N} edits (ms/edit):", flush=True)
    for k, v in sorted(times.items(), key=lambda kv: -kv[1]):
        print(f"  {k:12s} {v / N * 1e3:8.2f}", flush=True)
    print(f"  loop wall    {(tall1 - tall0) / N * 1e3:8.2f}", flush=True)
    print(f"  final sync   {(tall2 - tall1) * 1e3:8.2f} (total)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
