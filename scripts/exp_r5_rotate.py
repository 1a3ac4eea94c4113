#!/usr/bin/env python3
"""Round-5 rotation close-out (VERDICT item 7): floor analysis + A/B.

The r4 close-out left "per-sample VPU mask/weight math over slanted
windows" as the named residual, with streaming host tables as the
queued idea. The streaming idea is structurally out for the weight
tables themselves: w is per (output pixel, ky, kx) — ~50MP x K_y x K_x
f32 per angle at 45 deg (~0.5-2 GB and seconds of host numpy per
angle), which kills the interactive slider the kernel exists for. So
this session instead QUANTIFIES the floor: count the kernel's VPU hot
elements from the plan statics (the same arithmetic rotate_plan's cost
model uses), anchor the chip's achieved VPU element rate with a fused
elementwise chain at the same dtype/shape regime, and compare.

  achieved_rate = model_elements / measured_time
  floor_frac    = achieved_rate / anchor_rate

floor_frac near 1 => the kernel is at the VPU floor for this
decomposition and the residual is closed (a faster rotation needs a
different algorithm, not a tuned kernel). Also interleaves a TC=128
force at 45 deg as the control the cost model claims it beats.

    timeout 2400 python scripts/exp_r5_rotate.py
"""

import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _sync(x):
    import jax.numpy as jnp

    return int(np.asarray(jnp.sum(x.ravel()[::65537].astype(jnp.int32))))


def _slope_ms(fn, iters=3):
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


def _corners(theta_deg, w, h, nw, nh, scale=1.0):
    f32 = np.float32
    t = math.radians(theta_deg)
    c, s = math.cos(t), math.sin(t)

    def rot(x, y):
        tx, ty = x - nw / 2, y - nh / 2
        return (int(f32((tx * c + ty * s) * scale + w / 2)),
                int(f32((-tx * s + ty * c) * scale + h / 2)))

    return rot(0, 0), rot(nw - 1, 0), rot(0, nh - 1)


def model_elements(statics):
    """The kernel's per-run VPU hot elements (prod+reduce pass over
    [nc*D_g, K_x*TC] per (group, rr, ky) x 2 ops, + mask build
    [D_g, TC] x 2, + the weight math [R, K_x*TC] x ~6), from the same
    statics the cost model prices. Returns (vpu_elems, mxu_macs)."""
    st = statics
    TC, R = st["tc"], 8
    ngr = 128 // R          # TH=128
    ntiles = st["ntr"] * st["ntc"] * ngr
    C, D_g, D_xr, K_x, K_y = (st["components"], st["D_g"], st["D_xr"],
                              st["K_x"], st["K_y"])
    vpu = ntiles * (
        R * K_y * C * D_g * K_x * TC * 2        # prod + masked reduce
        + R * K_y * D_g * TC * 2                # mask compare+band
        + K_y * R * K_x * TC * 6)               # weight/validity math
    mxu = ntiles * C * D_g * D_xr * R * K_x * TC * 3  # 3 bf16 passes
    return vpu, mxu


def main():
    import jax
    import jax.numpy as jnp

    from imagepipe_tpu.kernels import rotate_pallas as rp

    print(f"backend: {jax.default_backend()}", flush=True)
    small = "--small" in sys.argv
    # --smoke: structural check only (CPU interpret) — one kernel call
    # per angle on a tiny frame, no timing loops (interpret-mode slope
    # reps at real sizes run for tens of minutes and tell us nothing).
    smoke = "--smoke" in sys.argv
    small = small or smoke

    # ---- VPU element-rate anchor (fused elementwise chain, f32) --------
    shape = (512, 1024) if small else (4, 4024, 6048)
    xs = jnp.asarray(np.random.default_rng(0).random(shape, np.float32))

    def chain(k):
        @jax.jit
        def f(x):
            acc = x
            for i in range(k):
                acc = acc * np.float32(1.0 + 1e-7) + np.float32(1e-9)
            return acc
        return f

    f8, f40 = chain(8), chain(40)
    anchor_iters = 1 if smoke else 4
    t8 = _slope_ms(lambda: f8(xs), iters=anchor_iters)
    t40 = _slope_ms(lambda: f40(xs), iters=anchor_iters)
    n = float(np.prod(shape))
    # slope over chain length isolates the per-FMA-pass cost from the
    # HBM read/write of x (present in both).
    per_pass_ms = max((t40 - t8) / 32.0, 1e-9)
    anchor = n / (per_pass_ms * 1e-3)
    print(f"VPU anchor: {t8:.2f} ms @8, {t40:.2f} ms @40 -> "
          f"{anchor / 1e9:.1f} G fma-elems/s", flush=True)

    # ---- rotation floor + A/B -------------------------------------------
    w, h = (240, 160) if smoke else (600, 400) if small else (6048, 4024)
    src = jnp.asarray(
        np.random.default_rng(1).random((4, h, w), np.float32))

    for theta in (5, 20, 45):
        # rotatecrop-style output size (bounding box of the rotation)
        t = math.radians(theta)
        nw = int(abs(w * math.cos(t)) + abs(h * math.sin(t)))
        nh = int(abs(w * math.sin(t)) + abs(h * math.cos(t)))
        tl, tr, bl = _corners(theta, w, h, nw, nh)
        plans = {}
        for name, tcf in (("auto", None), ("tc128", 128)):
            p = rp.rotate_plan(w, h, tl, tr, bl, nw, nh, 4, tc_force=tcf)
            if p is not None:
                plans[name] = p
        if "auto" not in plans:
            print(f"[{theta}deg] no plan (gather fallback)", flush=True)
            continue
        st = plans["auto"][0]
        if plans.get("tc128") and plans["tc128"][0]["tc"] == st["tc"]:
            plans.pop("tc128")   # control identical to auto
        vpu, mxu = model_elements(st)
        print(f"[{theta}deg] auto tc={st['tc']} D_g={st['D_g']} "
              f"D_xr={st['D_xr']} K={st['K_y']}x{st['K_x']} "
              f"model: {vpu / 1e9:.1f} G vpu-elems, "
              f"{mxu / 1e12:.2f} T bf16-macs", flush=True)
        if smoke:
            out = rp.rotate_resample_planar(
                src, w, h, tl, tr, bl, nw, nh, 4, interpret=True,
                plan=plans["auto"])
            print(f"[{theta}deg] smoke: out {tuple(out.shape)} "
                  f"finite={bool(np.isfinite(np.asarray(out)).all())}",
                  flush=True)
            continue
        for rep in range(3):
            line = f"[{theta}deg] rep {rep}:"
            for name, plan in plans.items():
                ms = _slope_ms(lambda p=plan: rp.rotate_resample_planar(
                    src, w, h, tl, tr, bl, nw, nh, 4,
                    interpret=jax.default_backend() == "cpu", plan=p))
                line += f" {name} {ms:.0f} ms"
                if name == "auto":
                    rate = vpu / (ms * 1e-3)
                    line += f" (vpu-floor-frac {rate / anchor:.2f})"
            print(line, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
