"""Full-pipeline bit-exactness (/root/reference/tests/roundtrip_test.rs):
every RGB8 value through the whole develop chain must reproduce itself, with
the slow path (full op chain) agreeing with the fastpath passthrough."""

import numpy as np

from imagepipe_tpu import ImageSource, Pipeline


def _roundtrip_8bit(fast: bool):
    # All 16.7M RGB8 combos as a 4096x4096 image (roundtrip_test.rs:4-24).
    v = np.arange(256 ** 3, dtype=np.uint32)
    img = np.stack([(v >> 16) & 255, (v >> 8) & 255, v & 255],
                   axis=-1).astype(np.uint8).reshape(4096, 4096, 3)
    p = Pipeline.new_from_source(ImageSource.from_raster(img))
    p.globals.settings.use_fastpath = fast
    out = p.output_8bit(None)
    np.testing.assert_array_equal(out.data, img)


def test_roundtrip_8bit_fastpath():
    _roundtrip_8bit(True)


def test_roundtrip_8bit_slowpath():
    _roundtrip_8bit(False)


def _roundtrip_16bit(fast: bool):
    # Prime-strided block of u16 combos (roundtrip_test.rs:37-76), one
    # 1024x1024 block rather than the full multi-gigabyte sweep.
    r = np.arange(0, 65535, 89, dtype=np.uint16)
    g = np.arange(0, 65535, 97, dtype=np.uint16)
    b = np.arange(0, 65535, 101, dtype=np.uint16)
    n = 1024 * 1024
    rr = np.resize(np.repeat(r, len(g))[:n], n)
    gg = np.resize(np.tile(g, len(r))[:n], n)
    bb = np.resize(b, n)
    img = np.stack([rr, gg, bb], axis=-1).reshape(1024, 1024, 3)
    p = Pipeline.new_from_source(ImageSource.from_raster(img))
    p.globals.settings.use_fastpath = fast
    out = p.output_16bit(None)
    np.testing.assert_array_equal(out.data, img)


def test_roundtrip_16bit_fastpath():
    _roundtrip_16bit(True)


def test_roundtrip_16bit_slowpath():
    _roundtrip_16bit(False)
