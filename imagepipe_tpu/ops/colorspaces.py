"""Stages 4 and 6: camera RGBE -> Lab and Lab -> linear sRGB.

Re-design of OpToLab/OpFromLab (/root/reference/src/ops/colorspaces.rs).
Both are single fused elementwise passes on device; interactive white
balance (set_temp/get_temp via the Planckian locus) is host-side float math.
"""

from __future__ import annotations

import math
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .base import ImageOp
from ..buffer import OpBuffer
from ..hasher import pack_f32s
from ..sources import ImageSource
from .. import color as cc
from ..cct import temp_to_xyz, xyz_to_temp

__all__ = ["OpToLab", "OpFromLab", "normalize_wbs"]

_f32 = np.float32


def normalize_wbs(vals):
    """Normalize WB multipliers so green is 1.0; non-finite/zero/subnormal
    entries become 1.0 (colorspaces.rs:12-27)."""
    unity = float(vals[1])
    out = []
    for v in vals:
        v = float(v)
        if not math.isfinite(v) or v == 0.0 or abs(v) < 1.1754944e-38:
            out.append(1.0)
        else:
            out.append(float(_f32(_f32(v) / _f32(unity))))
    return out


def _is_normal(v: float) -> bool:
    return math.isfinite(v) and v != 0.0 and abs(v) >= 1.1754944e-38


@partial(jax.jit, static_argnames=("numerics",))
def _to_lab_kernel(data, mul, cmatrix, *, numerics):
    # data: planar [4, H, W] -> [3, H, W]. `numerics` keys the trace AND
    # pins the mode the body traces under (the LUT/direct split happens
    # at trace time inside the color functions).
    with cc.numerics_mode(numerics):
        L, A, B = cc.camera_to_lab_planar(
            mul, cmatrix, [data[c] for c in range(4)])
    return jnp.stack([L, A, B], axis=0)


@partial(jax.jit, static_argnames=("numerics",))
def _from_lab_kernel(data, rgbmatrix, *, numerics):
    # data: planar [3, H, W] -> [3, H, W]
    with cc.numerics_mode(numerics):
        r, g, b = cc.lab_to_rgb_planar(rgbmatrix, (data[0], data[1], data[2]))
    return jnp.stack([r, g, b], axis=0)


class OpToLab(ImageOp):
    NAME = "to_lab"

    def __init__(self, img: ImageSource):
        if img.is_raw:
            raw = img.raw
            wb = [float(v) for v in raw.wb_coeffs]
            if not (_is_normal(wb[0]) and _is_normal(wb[1]) and _is_normal(wb[2])):
                coeffs = normalize_wbs(raw.neutralwb())
            else:
                coeffs = normalize_wbs(wb)
            self.cam_to_xyz = np.asarray(raw.cam_to_xyz(), _f32)
            self.cam_to_xyz_normalized = np.asarray(raw.cam_to_xyz_normalized(), _f32)
            self.xyz_to_cam = np.asarray(raw.xyz_to_cam, _f32)
            self.wb_coeffs = coeffs
        else:
            self.cam_to_xyz = cc.SRGB_D65_43.copy()
            self.cam_to_xyz_normalized = cc.SRGB_D65_43.copy()
            self.xyz_to_cam = cc.XYZ_D65_34.copy()
            self.wb_coeffs = [1.0, 1.0, 1.0, 0.0]

    def serialize_binary(self) -> bytes:
        return (pack_f32s(self.cam_to_xyz) + pack_f32s(self.cam_to_xyz_normalized)
                + pack_f32s(self.xyz_to_cam) + pack_f32s(self.wb_coeffs))

    def to_settings_dict(self) -> dict:
        return {
            "cam_to_xyz": [[float(v) for v in row] for row in self.cam_to_xyz],
            "cam_to_xyz_normalized": [[float(v) for v in row] for row in self.cam_to_xyz_normalized],
            "xyz_to_cam": [[float(v) for v in row] for row in self.xyz_to_cam],
            "wb_coeffs": [float(v) for v in self.wb_coeffs],
        }

    def load_settings_dict(self, d: dict) -> None:
        self.cam_to_xyz = np.asarray(d["cam_to_xyz"], _f32)
        self.cam_to_xyz_normalized = np.asarray(d["cam_to_xyz_normalized"], _f32)
        self.xyz_to_cam = np.asarray(d["xyz_to_cam"], _f32)
        self.wb_coeffs = [float(v) for v in d["wb_coeffs"]]

    # Interactive white balance (colorspaces.rs:59-84).

    def set_temp(self, temp: float, tint: float) -> None:
        xyz = temp_to_xyz(temp)
        xyz = [float(xyz[0]), float(xyz[1]) / tint, float(xyz[2])]
        coeffs = []
        for i in range(4):
            acc = _f32(0.0)
            for j in range(3):
                acc = _f32(acc + _f32(self.xyz_to_cam[i][j]) * _f32(xyz[j]))
            coeffs.append(float(_f32(1.0) / acc) if acc != 0 else float("inf"))
        self.wb_coeffs = normalize_wbs(coeffs)

    def get_temp(self) -> tuple[float, float]:
        xyz = [0.0, 0.0, 0.0]
        for i in range(3):
            for j in range(4):
                mul = self.wb_coeffs[j]
                if mul > 0.0:
                    xyz[i] += float(self.cam_to_xyz[i][j]) / mul
        return xyz_to_temp(xyz)

    def device_chain(self, globals_, meta):
        w, h, colors, mono = meta
        if colors != 4:
            return None
        if mono:
            cmatrix = cc.SRGB_D65_43
            mul = [1.0, 1.0, 1.0, 1.0]
        else:
            cmatrix = self.cam_to_xyz_normalized
            mul = normalize_wbs(self.wb_coeffs)
        params = (np.asarray(mul, np.float32), np.asarray(cmatrix, np.float32))

        def fn(data, mul_, cmatrix_):
            L, A, B = cc.camera_to_lab_planar(
                mul_, cmatrix_, [data[c] for c in range(4)])
            return jnp.stack([L, A, B], axis=0)

        return (("to_lab",), fn, params, (w, h, 3, mono))

    def run(self, globals_, buf: OpBuffer) -> OpBuffer:
        # Monochrome: treat the camera as D65 sRGB with unity WB
        # (colorspaces.rs:90-101).
        if buf.monochrome:
            cmatrix = cc.SRGB_D65_43
            mul = [1.0, 1.0, 1.0, 1.0]
        else:
            cmatrix = self.cam_to_xyz_normalized
            mul = normalize_wbs(self.wb_coeffs)
        # Host numpy args: the jit dispatch bundles the transfer (an
        # eager asarray is a separate round-trip per array per edit).
        data = _to_lab_kernel(buf.data, np.asarray(mul, np.float32),
                              np.asarray(cmatrix, np.float32),
                              numerics=cc.get_numerics_mode())
        return OpBuffer(buf.width, buf.height, 3, buf.monochrome, data)


class OpFromLab(ImageOp):
    NAME = "from_lab"

    def __init__(self, img: ImageSource | None = None):
        pass

    def serialize_binary(self) -> bytes:
        return b""

    def to_settings_dict(self) -> dict:
        return {}

    def load_settings_dict(self, d: dict) -> None:
        pass

    def device_chain(self, globals_, meta):
        w, h, colors, mono = meta
        if colors != 3:
            return None
        params = (np.asarray(cc.XYZ_D65_33, np.float32),)

        def fn(data, rgbmatrix):
            r, g, b = cc.lab_to_rgb_planar(
                rgbmatrix, (data[0], data[1], data[2]))
            return jnp.stack([r, g, b], axis=0)

        return (("from_lab",), fn, params, meta)

    def run(self, globals_, buf: OpBuffer) -> OpBuffer:
        data = _from_lab_kernel(buf.data, np.asarray(cc.XYZ_D65_33,
                                                     np.float32),
                                numerics=cc.get_numerics_mode())
        return OpBuffer(buf.width, buf.height, 3, buf.monochrome, data)
