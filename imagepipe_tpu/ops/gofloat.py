"""Stage 1: ingest to f32 [0,1] with sensor crop and level normalization.

Re-design of OpGoFloat (/root/reference/src/ops/gofloat.rs). The reference
normalizes per pixel in rayon rows; here the whole sensor plane is staged to
the device once and normalized in a single fused elementwise pass. This is
also the host->HBM boundary: the only stage that touches host pixel data.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .base import ImageOp
from ..buffer import OpBuffer
from ..hasher import pack_u64, pack_bool, pack_f32s
from ..color import expand_srgb_gamma, input8bit, input16bit
from ..sources import ImageSource

__all__ = ["OpGoFloat"]


@partial(jax.jit, static_argnames=("mode",))
def _normalize(data, mins, ranges, *, mode):
    """data: [h,w] or [h,w,3] f32 raw counts -> normalized planar [C,h,w].

    mode: 'mono' (1ch -> 4ch replicated), 'rgb' (3ch -> 4ch), 'cfa' (1ch).
    Note the reference clamps to <= 1.0 but NOT >= 0.0, and the cfa/mono
    paths use only channel 0's levels (gofloat.rs:101-107,125-127).
    """
    if mode == "rgb":
        chans = [jnp.minimum((data[..., c] - mins[c]) / ranges[c], 1.0)
                 for c in range(3)]
        return jnp.stack(chans + [jnp.zeros_like(chans[0])], axis=0)
    v = jnp.minimum((data - mins[0]) / ranges[0], 1.0)
    if mode == "mono":
        z = jnp.zeros_like(v)
        return jnp.stack([v, v, v, z], axis=0)
    return v[None]  # cfa


@partial(jax.jit, static_argnames=("numerics",))
def _ingest_raster8(rgb_planar, *, numerics):
    """8-bit raster: sRGB gamma expansion (gofloat.rs:178-187).
    rgb_planar: [3,h,w] u8 -> [4,h,w] f32. `numerics` keys the trace on
    the LUT/direct mode resolved at call time."""
    from .. import color as _cc

    with _cc.numerics_mode(numerics):
        chans = [expand_srgb_gamma(input8bit(rgb_planar[c]))
                 for c in range(3)]
    return jnp.stack(chans + [jnp.zeros_like(chans[0])], axis=0)


@jax.jit
def _ingest_raster16(rgb_planar):
    """16-bit raster: straight /65535, no gamma removal (gofloat.rs:188-197,
    reproduced as-is for parity). rgb_planar: [3,h,w] u16 -> [4,h,w] f32."""
    chans = [input16bit(rgb_planar[c]) for c in range(3)]
    return jnp.stack(chans + [jnp.zeros_like(chans[0])], axis=0)


class OpGoFloat(ImageOp):
    NAME = "gofloat"
    FIELDS = ("crop_top", "crop_right", "crop_bottom", "crop_left",
              "is_cfa", "blacklevels", "whitelevels")

    def __init__(self, img: ImageSource):
        if img.is_raw:
            raw = img.raw
            self.crop_top, self.crop_right, self.crop_bottom, self.crop_left = (
                int(c) for c in raw.crops)
            self.is_cfa = raw.cfa.is_valid()
            self.blacklevels = [float(b) for b in raw.blacklevels]
            self.whitelevels = [float(w) for w in raw.whitelevels]
        else:
            self.crop_top = self.crop_right = self.crop_bottom = self.crop_left = 0
            self.is_cfa = False
            self.blacklevels = [0.0] * 4
            self.whitelevels = [0.0] * 4

    # -- contract ----------------------------------------------------------

    def serialize_binary(self) -> bytes:
        return (pack_u64(self.crop_top) + pack_u64(self.crop_right)
                + pack_u64(self.crop_bottom) + pack_u64(self.crop_left)
                + pack_bool(self.is_cfa)
                + pack_f32s(self.blacklevels) + pack_f32s(self.whitelevels))

    def to_settings_dict(self) -> dict:
        return {
            "crop_top": self.crop_top, "crop_right": self.crop_right,
            "crop_bottom": self.crop_bottom, "crop_left": self.crop_left,
            "is_cfa": self.is_cfa,
            "blacklevels": list(self.blacklevels),
            "whitelevels": list(self.whitelevels),
        }

    def load_settings_dict(self, d: dict) -> None:
        for k in ("crop_top", "crop_right", "crop_bottom", "crop_left"):
            setattr(self, k, int(d[k]))
        self.is_cfa = bool(d["is_cfa"])
        self.blacklevels = [float(v) for v in d["blacklevels"]]
        self.whitelevels = [float(v) for v in d["whitelevels"]]

    def transform_forward(self, width, height):
        _, _, w, h = self._size_image(width, height)
        return (w, h)

    # No transform_reverse: sizing is relative to the demosaic scale
    # (gofloat.rs:69-71).

    # -- execution ---------------------------------------------------------

    def _size_image(self, owidth, oheight):
        """Crop clamped so at least a 10x10 image survives (gofloat.rs:74-82)."""
        x = min(self.crop_left, owidth - 10)
        y = min(self.crop_top, oheight - 10)
        width = owidth - min(self.crop_left + self.crop_right, owidth - 10)
        height = oheight - min(self.crop_top + self.crop_bottom, oheight - 10)
        return (x, y, width, height)

    def run(self, globals_, buf: OpBuffer) -> OpBuffer:
        img = globals_.image
        if img.is_raw:
            return self._run_raw(img.raw)
        return self._run_other(img.other)

    def _run_raw(self, raw) -> OpBuffer:
        owidth, oheight = raw.width, raw.height
        x, y, width, height = self._size_image(owidth, oheight)
        # Host numpy: levels ride the jit dispatch, not eager transfers.
        mins = np.asarray(self.blacklevels, np.float32)
        ranges = np.asarray(
            [w - b for w, b in zip(self.whitelevels, self.blacklevels)],
            np.float32)

        from ..sources import staged_raw_plane

        data = staged_raw_plane(raw)  # uploaded once, sliced on device
        if raw.cpp == 3:
            plane = data.reshape(oheight, owidth, 3)[y:y + height, x:x + width, :]
            mode = "rgb"
            colors, mono = 4, False
        else:
            plane = data.reshape(oheight, owidth)[y:y + height, x:x + width]
            if not self.is_cfa:
                mode, colors, mono = "mono", 4, True
            else:
                mode, colors, mono = "cfa", 1, False
        dev = plane.astype(jnp.float32)
        out = _normalize(dev, mins, ranges, mode=mode)
        return OpBuffer(width, height, colors, mono, out)

    def _run_other(self, raster) -> OpBuffer:
        owidth, oheight = raster.width, raster.height
        x, y, width, height = self._size_image(owidth, oheight)
        bits = raster.bits_per_channel()
        planes = raster.staged_planes(bits)[:, y:y + height, x:x + width]
        from .. import color as _cc

        out = (_ingest_raster8(planes, numerics=_cc.get_numerics_mode())
               if bits == 8 else _ingest_raster16(planes))
        return OpBuffer(width, height, 4, False, out)
