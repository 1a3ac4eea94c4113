"""Stage 7: sRGB gamma encode.

Re-design of OpGamma (/root/reference/src/ops/gamma.rs): clamp to [0,1] then
apply the gamma LUT on every channel; skipped entirely for linear 16-bit
output (gamma.rs:17-18).
"""

from __future__ import annotations

from functools import partial

import jax

from .base import ImageOp
from ..buffer import OpBuffer
from .. import color as cc
from ..color import apply_srgb_gamma
from ..sources import ImageSource

__all__ = ["OpGamma"]

import jax.numpy as jnp


@partial(jax.jit, static_argnames=("numerics",))
def _gamma_kernel(data, *, numerics):
    with cc.numerics_mode(numerics):
        return apply_srgb_gamma(jnp.clip(data, 0.0, 1.0))


class OpGamma(ImageOp):
    NAME = "gamma"

    def __init__(self, img: ImageSource | None = None):
        pass

    def serialize_binary(self) -> bytes:
        return b""

    def to_settings_dict(self) -> dict:
        return {}

    def load_settings_dict(self, d: dict) -> None:
        pass

    def device_chain(self, globals_, meta):
        if globals_.settings.linear:
            return (("gamma", "linear"), None, (), meta)

        def fn(data):
            return apply_srgb_gamma(jnp.clip(data, 0.0, 1.0))

        return (("gamma",), fn, (), meta)

    def run(self, globals_, buf: OpBuffer) -> OpBuffer:
        if globals_.settings.linear:
            return buf
        return buf.with_data(
            _gamma_kernel(buf.data, numerics=cc.get_numerics_mode()))
