"""Rotate/crop op tests (/root/reference/src/ops/rotatecrop.rs:166-313):
pixel-indexed crop checks on a 100x100 ramp and the size-negotiation
property sweeps."""

import numpy as np
import jax.numpy as jnp

from imagepipe_tpu.buffer import OpBuffer
from imagepipe_tpu.ops.rotatecrop import OpRotateCrop
from imagepipe_tpu.pipeline import PipelineGlobals


def _setup():
    data = np.arange(100 * 100 * 3, dtype=np.float32).reshape(100, 100, 3)
    buf = OpBuffer.from_hwc(data)
    return buf, OpRotateCrop.empty(), PipelineGlobals.mock(100, 100), data


def test_crop_top():
    buf, op, g, data = _setup()
    op.crop_top = 0.1
    out = op.run(g, buf)
    assert (out.height, out.width) == (90, 100)
    assert float(out.data[0, 0, 0]) == float(data[10, 0, 0])


def test_crop_bottom():
    buf, op, g, data = _setup()
    op.crop_bottom = 0.1
    out = op.run(g, buf)
    assert (out.height, out.width) == (90, 100)
    assert float(out.data[0, 0, 0]) == float(data[0, 0, 0])


def test_crop_vertical():
    buf, op, g, data = _setup()
    op.crop_top = 0.1
    op.crop_bottom = 0.1
    out = op.run(g, buf)
    assert (out.height, out.width) == (80, 100)
    assert float(out.data[0, 0, 0]) == float(data[10, 0, 0])


def test_crop_left():
    buf, op, g, data = _setup()
    op.crop_left = 0.1
    out = op.run(g, buf)
    assert (out.height, out.width) == (100, 90)
    assert float(out.data[0, 0, 0]) == float(data[0, 10, 0])


def test_crop_right():
    buf, op, g, data = _setup()
    op.crop_right = 0.1
    out = op.run(g, buf)
    assert (out.height, out.width) == (100, 90)
    assert float(out.data[0, 0, 0]) == float(data[0, 0, 0])


def test_crop_horizontal_and_vertical():
    buf, op, g, data = _setup()
    op.crop_left = op.crop_right = op.crop_top = op.crop_bottom = 0.1
    out = op.run(g, buf)
    assert (out.height, out.width) == (80, 80)
    assert float(out.data[0, 0, 0]) == float(data[10, 10, 0])


def test_rotate_45():
    buf, op, g, _ = _setup()
    op.rotation = 0.5
    out = op.run(g, buf)
    assert (out.height, out.width) == (141, 141)


def test_rotate_90():
    buf, op, g, _ = _setup()
    op.rotation = 1.0
    out = op.run(g, buf)
    assert (out.height, out.width) == (100, 100)


def test_roundtrip_transform():
    # rotatecrop.rs:274-294: reverse-then-forward must return the promised
    # size exactly. Strided sweep (coarser than the reference's for speed,
    # same prime-stride style).
    op = OpRotateCrop.empty()
    for dim in range(89, 10000, 89 * 5):
        for crop1 in range(0, 65535, 97 * 7):
            for crop2 in range(0, 65535, 101 * 7):
                op.crop_top = crop1 / 65535.0
                op.crop_right = crop1 / 65535.0
                op.crop_bottom = crop2 / 65535.0
                op.crop_left = crop2 / 65535.0
                inter = op.transform_reverse(dim, dim)
                result = op.transform_forward(*inter)
                assert result == (dim, dim), (
                    f"{(dim, dim)}->{inter}->{result} crops "
                    f"({op.crop_top:.3f}/{op.crop_right:.3f}/{op.crop_bottom:.3f}/{op.crop_left:.3f})")
                op.reset()


def test_roundtrip_transform_rotation():
    # rotatecrop.rs:296-312: forward -> reverse -> forward is stable.
    op = OpRotateCrop.empty()
    for width in range(89, 10000, 89 * 5):
        for height in range(97, 10000, 97 * 5):
            for rotation in range(0, 256, 5):
                op.reset()
                op.rotation = rotation / 255.0
                inter1 = op.transform_forward(width, height)
                inter2 = op.transform_reverse(*inter1)
                result = op.transform_forward(*inter2)
                assert result == inter1, (
                    f"{(width, height)}->{inter1}->{inter2}->{result} "
                    f"rotation {op.rotation:.3f}")
