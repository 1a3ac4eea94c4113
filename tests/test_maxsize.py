"""Size-planning integration tests (/root/reference/tests/maxsize_test.rs):
every assertion checked across all four output modes (8/16-bit x
fastpath/slowpath)."""

import numpy as np

from imagepipe_tpu import ImageSource, Pipeline, Rotation


def _pipeline(w=128, h=64):
    return Pipeline.new_from_source(
        ImageSource.from_raster(np.zeros((h, w, 3), np.uint8)))


def assert_width(pipeline, width, height):
    for fast in (True, False):
        pipeline.globals.settings.use_fastpath = fast
        out8 = pipeline.output_8bit(None)
        assert (out8.width, out8.height) == (width, height), f"8bit fast={fast}"
        out16 = pipeline.output_16bit(None)
        assert (out16.width, out16.height) == (width, height), f"16bit fast={fast}"


def test_default_same_size():
    assert_width(_pipeline(), 128, 64)


def test_no_upscaling():
    p = _pipeline()
    p.globals.settings.maxwidth = 256
    assert_width(p, 128, 64)


def test_downscale_keeps_ratio():
    p = _pipeline()
    p.globals.settings.maxwidth = 64
    assert_width(p, 64, 32)


def test_rotation():
    p = _pipeline()
    p.globals.settings.maxwidth = 64
    p.ops.transform.rotation = Rotation.Rotate90
    assert_width(p, 64, 128)

    p = _pipeline()
    p.globals.settings.maxwidth = 32
    p.ops.transform.rotation = Rotation.Rotate90
    assert_width(p, 32, 64)

    p = _pipeline()
    p.globals.settings.maxwidth = 256
    p.ops.transform.rotation = Rotation.Rotate90
    assert_width(p, 64, 128)


def test_crops():
    p = _pipeline()
    p.globals.settings.maxwidth = 64
    p.ops.gofloat.crop_top = 1
    p.ops.gofloat.crop_bottom = 1
    p.ops.gofloat.crop_left = 1
    p.ops.gofloat.crop_right = 1
    assert_width(p, 64, 31)


def test_rotatecrop():
    p = _pipeline()
    p.globals.settings.maxwidth = 64
    p.ops.rotatecrop.crop_top = 0.1
    p.ops.rotatecrop.crop_bottom = 0.1
    p.ops.rotatecrop.crop_left = 0.1
    p.ops.rotatecrop.crop_right = 0.1
    assert_width(p, 64, 32)
