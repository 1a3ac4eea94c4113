"""TPU experiment: free-rotation resampler formulations on 24MP.

The reference's rotated resample (scaling.rs:51-130) is an inverse-mapped
window average whose source addresses vary per output pixel -- inherently a
gather. Candidates:
  cur   -- existing _transform_impl (fori over K^2 offsets, 2-D gather)
  flat  -- same loop, flattened 1-D take (y*W+x) per offset
Timed with chained dispatch (k=1/2/4 slope) where feasible; plain repeat
timing otherwise. Rotation = 45 deg of a 24MP frame -> 141%-size output.
"""

import json
import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from imagepipe_tpu import scaling


def sync(x):
    return int(np.asarray(jnp.sum(x.ravel()[::65537].astype(jnp.int32))))


_f32 = np.float32


@partial(jax.jit, static_argnames=("width", "height", "topleft", "topright",
                                   "bottomleft", "nwidth", "nheight"))
def _flat_take_impl(src, *, width, height, topleft, topright, bottomleft,
                    nwidth, nheight):
    """Same semantics as scaling._transform_impl (single channel, no CFA),
    but the per-offset gather is a flattened 1-D take."""
    import math

    f = jnp.float32
    tl0, tl1 = _f32(topleft[0]), _f32(topleft[1])
    tr0, tr1 = _f32(topright[0]), _f32(topright[1])
    bl0, bl1 = _f32(bottomleft[0]), _f32(bottomleft[1])
    skip_x_x = _f32((tr0 - tl0) / _f32(nwidth - 1))
    skip_x_y = _f32((tr1 - tl1) / _f32(nwidth - 1))
    skip_y_x = _f32((bl0 - tl0) / _f32(nheight - 1))
    skip_y_y = _f32((bl1 - tl1) / _f32(nheight - 1))

    rows_np = np.arange(nheight, dtype=_f32)
    cols_np = np.arange(nwidth, dtype=_f32)
    from_x_row = jnp.asarray(tl0 + skip_y_x * rows_np)[:, None]
    to_x_row = jnp.asarray(tl0 + skip_y_x * (rows_np + _f32(1.0)))[:, None]
    from_y_row = jnp.asarray(tl1 + skip_y_y * rows_np)[:, None]
    to_y_row = jnp.asarray(tl1 + skip_y_y * (rows_np + _f32(1.0)))[:, None]
    fx_col = jnp.asarray(skip_x_x * cols_np)[None, :]
    tx_col = jnp.asarray(skip_x_x * (cols_np + _f32(1.0)))[None, :]
    fy_col = jnp.asarray(skip_x_y * cols_np)[None, :]
    ty_col = jnp.asarray(skip_x_y * (cols_np + _f32(1.0)))[None, :]
    center_x_row = jnp.asarray(tl0 + skip_y_x * rows_np + (skip_y_x / _f32(2.0)) - _f32(0.5))[:, None]
    center_y_row = jnp.asarray(tl1 + skip_y_y * rows_np + (skip_y_y / _f32(2.0)) - _f32(0.5))[:, None]
    cx_col = jnp.asarray(skip_x_x * cols_np + (skip_x_x / _f32(2.0)))[None, :]
    cy_col = jnp.asarray(skip_x_y * cols_np + (skip_x_y / _f32(2.0)))[None, :]

    def sat_idx(v, maxv):
        v = jnp.where(jnp.isnan(v), 0.0, v)
        return jnp.minimum(jnp.maximum(jnp.floor(v), 0.0), _f32(maxv)).astype(jnp.int32)

    from_x = sat_idx(from_x_row + fx_col, width - 1)
    to_x = sat_idx(to_x_row + tx_col, width - 1)
    from_y = sat_idx(from_y_row + fy_col, height - 1)
    to_y = sat_idx(to_y_row + ty_col, height - 1)
    center_x = center_x_row + cx_col
    center_y = center_y_row + cy_col

    def bound(a, b):
        s = (0.0 if not math.isfinite(float(a)) else abs(float(a))) + (
            0.0 if not math.isfinite(float(b)) else abs(float(b)))
        return max(1, min(int(math.ceil(s)) + 2, max(width, height)))

    K_x = bound(skip_x_x, skip_y_x)
    K_y = bound(skip_x_y, skip_y_y)

    flat = src.reshape(-1)
    sums0 = jnp.zeros((nheight, nwidth), f)
    counts0 = jnp.zeros((nheight, nwidth), f)

    def body(k, acc):
        sums, counts = acc
        ky = k // K_x
        kx = k % K_x
        y = from_y + ky
        x = from_x + kx
        valid = (y <= to_y) & (x <= to_x)
        yc = jnp.minimum(y, height - 1)
        xc = jnp.minimum(x, width - 1)
        delta_x = (x.astype(f) - center_x) / skip_x_x
        delta_y = (y.astype(f) - center_y) / skip_y_y
        factor = 1.0 - delta_x * delta_x - delta_y * delta_y
        factor = jnp.where(factor < 0.0, 0.0, factor)
        w = jnp.where(valid, factor, 0.0)
        val = jnp.take(flat, yc * width + xc)
        return sums + val * w, counts + w

    sums, counts = jax.lax.fori_loop(0, K_x * K_y, body, (sums0, counts0))
    return jnp.where(counts > 0.0, sums / counts, 0.0)


def main():
    print("devices:", jax.devices(), flush=True)
    W, H = 6000, 4000
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.random((H, W), np.float32))
    sync(src)

    # 45-degree rotation corners (rotatecrop-style bounding box).
    import math

    th = math.pi / 4
    c, s = math.cos(th), math.sin(th)
    nwidth = int(abs(W * c) + abs(H * s))
    nheight = int(abs(W * s) + abs(H * c))
    # Inverse-mapped corners: source coords of output corners.
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    ncx, ncy = (nwidth - 1) / 2.0, (nheight - 1) / 2.0

    def inv(px, py):
        dx, dy = px - ncx, py - ncy
        return (cx + c * dx - s * dy, cy + s * dx + c * dy)

    topleft = tuple(int(v) for v in inv(0, 0))
    topright = tuple(int(v) for v in inv(nwidth - 1, 0))
    bottomleft = tuple(int(v) for v in inv(0, nheight - 1))
    mp_out = nwidth * nheight / 1e6
    print(f"output {nwidth}x{nheight} ({mp_out:.1f} MP)", flush=True)

    # current path (single channel HWC)
    src_hwc = src[..., None]
    cfa_tile = jnp.zeros((48, 48), jnp.uint8)
    for name, fn in (
        ("cur_2dgather", lambda: scaling._transform_impl(
            src_hwc, cfa_tile, width=W, height=H, topleft=topleft,
            topright=topright, bottomleft=bottomleft, nwidth=nwidth,
            nheight=nheight, components=1, cfa_key=None,
            out_dtype=jnp.float32)),
        ("flat_take", lambda: _flat_take_impl(
            src, width=W, height=H, topleft=topleft, topright=topright,
            bottomleft=bottomleft, nwidth=nwidth, nheight=nheight)),
    ):
        try:
            t0 = time.perf_counter()
            out = fn()
            sync(out)
            compile_s = time.perf_counter() - t0
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(2):
                    out = fn()
                sync(out)
                ts.append((time.perf_counter() - t0) / 2)
            best = min(ts)
            print(json.dumps({"exp": name, "compile_s": round(compile_s, 1),
                              "min_ms": round(best * 1e3, 1),
                              "out_mp_s": round(mp_out / best, 1)}), flush=True)
        except Exception as e:
            import traceback

            traceback.print_exc()
            print(json.dumps({"exp": name, "error": str(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
