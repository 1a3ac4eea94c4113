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


def _u16_prime_blocks():
    """The reference's full prime-strided walk of the 16-bit space
    (roundtrip_test.rs:37-76): lexicographic (r,g,b) triples with strides
    89/97/101, emitted as 4096x4096 blocks (the last block zero-padded)."""
    r = np.arange(0, 65536, 89, dtype=np.uint16)
    g = np.arange(0, 65536, 97, dtype=np.uint16)
    b = np.arange(0, 65536, 101, dtype=np.uint16)
    total = len(r) * len(g) * len(b)
    n = 4096 * 4096
    for lo in range(0, total, n):
        i = np.arange(lo, min(lo + n, total), dtype=np.int64)
        block = np.stack([r[i // (len(g) * len(b))],
                          g[(i // len(b)) % len(g)],
                          b[i % len(b)]], axis=-1)
        if len(block) < n:
            block = np.concatenate(
                [block, np.zeros((n - len(block), 3), np.uint16)])
        yield block.reshape(4096, 4096, 3)


def _roundtrip_16bit(fast: bool):
    # Full multi-block sweep as in roundtrip_test.rs:37-84: ~323M prime-
    # strided u16 combos in 4096x4096 blocks, each through the whole pipeline.
    for img in _u16_prime_blocks():
        p = Pipeline.new_from_source(ImageSource.from_raster(img))
        p.globals.settings.use_fastpath = fast
        out = p.output_16bit(None)
        np.testing.assert_array_equal(out.data, img)


def test_roundtrip_16bit_fastpath():
    _roundtrip_16bit(True)


def test_roundtrip_16bit_slowpath():
    _roundtrip_16bit(False)
