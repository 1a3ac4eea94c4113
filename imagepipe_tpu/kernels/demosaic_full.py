"""Full-resolution CFA demosaic as a vectorized 3x3 stencil.

Re-design of `full()` (/root/reference/src/ops/demosaic.rs:67-119). The
reference walks pixels scalar-wise consulting a 48x48x9 neighbor-color
lookup; here the same lookup drives nine shifted whole-image accumulations --
each of the four color planes is a sum of masked shifts that XLA fuses into
one pass over the sensor plane, mapping cleanly onto the VPU. Works for any
periodic CFA (Bayer, X-Trans, 8x2) with identical edge handling.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from ..buffer import OpBuffer
from ..raw import CFA, PATTERN_TILE

__all__ = ["demosaic_full", "neighbor_color_lookup"]

# 3x3 neighborhood offsets in the reference's order (demosaic.rs:70-74).
OFFSETS_3X3 = [(-1, -1), (-1, 0), (-1, 1),
               (0, -1), (0, 0), (0, 1),
               (1, -1), (1, 0), (1, 1)]


@lru_cache(maxsize=64)
def _lookup_cached(cfa_name: str) -> np.ndarray:
    cfa = CFA(cfa_name)
    t = PATTERN_TILE
    lut = np.zeros((t, t, 9), dtype=np.uint8)
    for row in range(t):
        for col in range(t):
            pixcolor = cfa.color_at(row, col)
            for i, (dy, dx) in enumerate(OFFSETS_3X3):
                ocolor = cfa.color_at(row + t + dy, col + t + dx)
                # Same-color neighbors (other than the center itself) are
                # tagged 4 = discard so the center keeps its own measured
                # value (demosaic.rs:87).
                if ocolor != pixcolor or (dx == 0 and dy == 0):
                    lut[row, col, i] = ocolor
                else:
                    lut[row, col, i] = 4
    return lut


def neighbor_color_lookup(cfa: CFA) -> np.ndarray:
    """[48,48,9] neighbor-color table, exactly demosaic.rs:76-90."""
    return _lookup_cached(cfa.name)


@partial(jax.jit, static_argnames=("height", "width"))
def _demosaic_impl(plane, lut, *, height, width):
    """plane: [H,W] f32 sensor data; lut: [48,48,9] uint8 -> [H,W,4] f32."""
    f = jnp.float32
    t = PATTERN_TILE
    ymod = (jnp.arange(height, dtype=jnp.int32) % t)[:, None]
    xmod = (jnp.arange(width, dtype=jnp.int32) % t)[None, :]

    padded = jnp.pad(plane, 1)
    vmask = jnp.pad(jnp.ones((height, width), f), 1)

    sums = [jnp.zeros((height, width), f) for _ in range(4)]
    counts = [jnp.zeros((height, width), f) for _ in range(4)]
    for i, (dy, dx) in enumerate(OFFSETS_3X3):
        val = jax.lax.dynamic_slice(padded, (1 + dy, 1 + dx), (height, width))
        valid = jax.lax.dynamic_slice(vmask, (1 + dy, 1 + dx), (height, width))
        color = lut[ymod, xmod, i].astype(jnp.int32)
        for c in range(4):
            sel = jnp.where(color == c, valid, 0.0)
            sums[c] = sums[c] + val * sel
            counts[c] = counts[c] + sel
    out = [jnp.where(counts[c] > 0.0, sums[c] / counts[c], 0.0) for c in range(4)]
    return jnp.stack(out, axis=-1)


def demosaic_full(cfa: CFA, buf: OpBuffer) -> OpBuffer:
    """CFA single-plane -> 4-channel RGBE at full resolution."""
    lut = jnp.asarray(neighbor_color_lookup(cfa))
    plane = buf.data[..., 0]
    data = _demosaic_impl(plane, lut, height=buf.height, width=buf.width)
    return OpBuffer(buf.width, buf.height, 4, buf.monochrome, data)
