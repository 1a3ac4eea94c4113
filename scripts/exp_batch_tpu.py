"""TPU smoke: BatchEngine pallas executor (compiled, shard_map on the
1-device mesh) agreement with the XLA engine, then throughput on 24MP x8."""

import json
import sys
import time

import numpy as np
import jax

sys.path.insert(0, "/root/repo")

from imagepipe_tpu import ImageSource, Pipeline
from imagepipe_tpu.engine import make_develop_plan, develop_fused, planar_to_hwc
from imagepipe_tpu.parallel import BatchEngine, make_batch_mesh
from imagepipe_tpu.raw import synthetic_bayer


def main():
    print("devices:", jax.devices(), flush=True)
    raws = [synthetic_bayer(768, 512, seed=70 + s) for s in range(3)]
    raws[1].wb_coeffs = (1.0, 1.0, 2.8, float("nan"))
    eng = BatchEngine(make_batch_mesh(), max_batch=8)
    plan0 = eng._plan_for(ImageSource.from_raw(raws[0]))
    print("use_pallas:", eng._use_pallas(plan0), "numerics:", plan0.numerics,
          flush=True)
    outs = eng.develop_sources([ImageSource.from_raw(r) for r in raws])
    ok = True
    for raw, out in zip(raws, outs):
        plan = make_develop_plan(Pipeline.new_from_source(ImageSource.from_raw(raw)))
        want = planar_to_hwc(develop_fused(plan, raw.data))
        diff = np.abs(out.astype(int) - np.asarray(want).astype(int))
        print("maxdiff", diff.max(), "flips", round(float((diff != 0).mean()), 5),
              flush=True)
        ok = ok and diff.max() <= 1
    print(json.dumps({"exp": "batch_pallas_smoke", "ok": bool(ok)}), flush=True)

    # Throughput: 8 x 24MP through the engine (dispatch+develop, amortized).
    big = [synthetic_bayer(6000, 4000, seed=s) for s in range(2)]
    srcs = [ImageSource.from_raw(big[s % 2]) for s in range(8)]
    eng2 = BatchEngine(make_batch_mesh(), max_batch=8)
    t0 = time.perf_counter()
    eng2.develop_sources(srcs)  # compile + run
    print("first batch (compile):", round(time.perf_counter() - t0, 1), "s",
          flush=True)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        eng2.develop_sources(srcs)
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    print(json.dumps({"exp": "batch_engine_8x24mp_end_to_end",
                      "s_per_batch": round(best, 2),
                      "mp_s": round(8 * 24.0 / best, 1)}), flush=True)


if __name__ == "__main__":
    main()
