"""TPU probe for the rotation Pallas kernel: compile, validate vs the gather
impl on-device, and time a 24MP free rotation. Run on the real TPU backend."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from imagepipe_tpu import scaling
from imagepipe_tpu.kernels import rotate_pallas as rp

f32 = np.float32


def corners(theta_deg, w, h, nw, nh, scale=1.0):
    a = np.deg2rad(theta_deg)
    s, c = np.sin(a), np.cos(a)

    def rot(x, y):
        tx, ty = x - nw / 2, y - nh / 2
        return (int(f32((tx * c + ty * s) * scale + w / 2)),
                int(f32((-tx * s + ty * c) * scale + h / 2)))

    return rot(0, 0), rot(nw - 1, 0), rot(0, nh - 1)


def sync(x):
    return float(jnp.sum(x[..., :1, :1]))


def main():
    print("backend:", jax.default_backend(), flush=True)

    # --- correctness: moderate size, two angles, vs the gather impl on TPU
    rng = np.random.default_rng(5)
    for theta, w, h, nw, nh in [(10, 900, 600, 860, 570), (45, 700, 700, 980, 980)]:
        tl, tr, bl = corners(theta, w, h, nw, nh)
        data = rng.random((h, w, 4), dtype=np.float32)
        src = jnp.asarray(np.moveaxis(data, -1, 0))
        plan = rp.rotate_plan(w, h, tl, tr, bl, nw, nh, 4)
        assert plan is not None
        t0 = time.time()
        pal = rp.rotate_resample_planar(src, w, h, tl, tr, bl, nw, nh, 4,
                                        interpret=False, plan=plan)
        sync(pal)
        print(f"theta={theta}: pallas compile+run {time.time()-t0:.1f}s", flush=True)
        gat = scaling._transform_impl(
            jnp.asarray(data), jnp.zeros((48, 48), jnp.uint8),
            width=w, height=h, topleft=tl, topright=tr, bottomleft=bl,
            nwidth=nw, nheight=nh, components=4, cfa_key=None,
            out_dtype=jnp.float32)
        sync(gat)
        d = np.abs(np.moveaxis(np.asarray(pal), 0, -1) - np.asarray(gat))
        print(f"theta={theta}: |pallas - gather| max={d.max():.3e} "
              f"frac>1e-5={(d > 1e-5).mean():.5f}", flush=True)
        assert d.max() < 1e-3, "mismatch vs gather impl"

    # --- perf: 24MP 4ch rotation at 5/20/45 deg, slope over two chain lengths
    w, h = 6048, 4024
    data = rng.random((h, w, 4), dtype=np.float32)
    src = jnp.asarray(np.moveaxis(data, -1, 0))
    for theta in (5, 20, 45):
        nw, nh = w - 64, h - 64
        tl, tr, bl = corners(theta, w, h, nw, nh)
        plan = rp.rotate_plan(w, h, tl, tr, bl, nw, nh, 4)
        if plan is None:
            print(f"theta={theta}: unsupported plan", flush=True)
            continue
        st = plan[0]
        print(f"theta={theta}: D_y={st['D_y']} D_x={st['D_x']} D_g={st['D_g']} "
              f"D_xr={st['D_xr']} K={st['K_y']}x{st['K_x']} "
              f"grid={st['ntr']}x{st['ntc']}", flush=True)

        def run(n):
            t0 = time.time()
            out = None
            for _ in range(n):
                out = rp.rotate_resample_planar(
                    src, w, h, tl, tr, bl, nw, nh, 4, interpret=False, plan=plan)
            sync(out)
            return time.time() - t0

        t0 = time.time()
        run(1)
        print(f"  compile+first: {time.time()-t0:.1f}s", flush=True)
        t2, t6 = run(2), run(6)
        per = (t6 - t2) / 4.0
        mps = (nw * nh) / per / 1e6
        print(f"  per-iter {per*1e3:.1f} ms -> {mps:.0f} MP/s (output px)", flush=True)

    # gather-impl baseline at 5 deg for reference (may be very slow; 1 iter)
    theta = 5
    nw, nh = w - 64, h - 64
    tl, tr, bl = corners(theta, w, h, nw, nh)
    hwc = jnp.asarray(data)
    t0 = time.time()
    g = scaling._transform_impl(
        hwc, jnp.zeros((48, 48), jnp.uint8), width=w, height=h, topleft=tl,
        topright=tr, bottomleft=bl, nwidth=nw, nheight=nh, components=4,
        cfa_key=None, out_dtype=jnp.float32)
    sync(g)
    print(f"gather impl theta=5 compile+first: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    g = scaling._transform_impl(
        hwc, jnp.zeros((48, 48), jnp.uint8), width=w, height=h, topleft=tl,
        topright=tr, bottomleft=bl, nwidth=nw, nheight=nh, components=4,
        cfa_key=None, out_dtype=jnp.float32)
    sync(g)
    t = time.time() - t0
    print(f"gather impl theta=5 per-iter ~{t*1e3:.0f} ms -> {(nw*nh)/t/1e6:.0f} MP/s", flush=True)
    print("PROBE DONE", flush=True)


if __name__ == "__main__":
    main()
