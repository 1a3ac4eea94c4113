"""Phase One IIQ (imagepipe_tpu/iiq.py + native/iiq.cc).

Strategy mirrors the other vendor codecs: the canonical encoder pins
every stream mechanism by round-trip (length establishment, keep codes,
every pair-table length, raw-16 groups, ragged tails, cross-row length
persistence), the native decoder is differential-fuzzed against the
Python one, and the container integration goes through
read_iiq/decode_file. The reference reaches Phase One backs through
rawloader (/root/reference/src/pipeline.rs:264)."""

import struct

import numpy as np
import pytest

from imagepipe_tpu import native
from imagepipe_tpu.decode import codec_family, decode_file
from imagepipe_tpu.iiq import (_FMT5_CURVE, _decode_native, _decode_python,
                               black_correct, decode_phase_one,
                               encode_phase_one, read_iiq,
                               romm_to_xyz_to_cam, swizzle_phase_one,
                               unswizzle_phase_one)
from imagepipe_tpu.raw import Orientation

_HAVE_NATIVE = native.have_native() and hasattr(native._lib, "iiq_decode")


def _smooth(h, w, seed=0, lo=2000, amp=40):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    return (lo + (yy * 13 + xx * 5) % 9000
            + rng.integers(0, amp, (h, w))).astype(np.uint16)


def _roundtrip(img):
    data, offsets = encode_phase_one(img)
    out = decode_phase_one(data, offsets, img.shape[1], img.shape[0])
    np.testing.assert_array_equal(out, img)  # codec is lossless
    return data, offsets


def test_roundtrip_smooth_exact():
    _roundtrip(_smooth(16, 40))


def test_roundtrip_random_and_extremes():
    rng = np.random.default_rng(1)
    _roundtrip(rng.integers(0, 1 << 16, (12, 32), dtype=np.uint16))
    _roundtrip(np.zeros((4, 16), np.uint16))
    _roundtrip(np.full((4, 16), 0xFFFF, np.uint16))
    # A step image exercising every pair-table length per group.
    img = np.zeros((2, 80), np.uint16)
    steps = [1, 15, 30, 120, 250, 500, 1000, 2000, 4000, 30000]
    v = 0
    for i in range(80):
        v = (v + steps[(i // 8) % len(steps)]) & 0xFFFF
        img[:, i] = v
    _roundtrip(img)


def test_roundtrip_big_endian_words():
    # dcraw's ph1_bits honors the container order mark; the "MMMM"
    # flavor packs the same MSB-first bitstream into big-endian words.
    img = _smooth(8, 24, seed=12)
    data, offsets = encode_phase_one(img, en=">")
    out = decode_phase_one(data, offsets, 24, 8, en=">")
    np.testing.assert_array_equal(out, img)
    a = _decode_python(data, offsets, 24, 8, en=">")
    np.testing.assert_array_equal(a, img)
    if _HAVE_NATIVE:
        b = _decode_native(data, offsets, 24, 8, en=">")
        np.testing.assert_array_equal(b, img)
    # The LE decode of a BE stream must NOT silently agree.
    try:
        le = decode_phase_one(data, offsets, 24, 8, en="<")
        assert (le != img).any()
    except ValueError:
        pass  # corrupt-stream rejection is equally fine


def test_roundtrip_ragged_tail_and_narrow():
    _roundtrip(_smooth(6, 37))   # width % 8 = 5 raw-16 tail columns
    _roundtrip(_smooth(6, 7))    # width < 8: every column is raw 16-bit
    _roundtrip(_smooth(1, 24))


def test_python_native_agree_on_valid_streams():
    if not _HAVE_NATIVE:
        pytest.skip("native library not built")
    for seed, (h, w) in [(0, (8, 24)), (1, (5, 37)), (2, (9, 7))]:
        img = _smooth(h, w, seed=seed)
        data, offsets = encode_phase_one(img)
        a = _decode_python(data, offsets, w, h)
        b = _decode_native(data, offsets, w, h)
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(a, img)


def test_fuzz_decoders_never_crash_and_agree():
    if not _HAVE_NATIVE:
        pytest.skip("native library not built")
    rng = np.random.default_rng(5)
    img = _smooth(8, 24, seed=40)
    data, offsets = encode_phase_one(img)
    for trial in range(60):
        b = bytearray(data)
        for _ in range(int(rng.integers(1, 5))):
            b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
        offs = offsets.copy()
        if trial % 7 == 0:  # also perturb a strip offset
            offs[int(rng.integers(0, len(offs)))] += int(
                rng.integers(-4, 5)) * 4
        try:
            py = _decode_python(bytes(b), offs, 24, 8)
        except ValueError:
            py = None
        try:
            nat = _decode_native(bytes(b), offs, 24, 8)
        except ValueError:
            nat = None
        assert (py is None) == (nat is None)
        if py is not None:
            np.testing.assert_array_equal(py, nat)


def test_format5_curve():
    # Values below 256 decompand through i*i/3.969 + 0.5; the predictor
    # chain runs on the PRE-curve codes.
    img = np.tile(np.arange(0, 512, 2, dtype=np.uint16), (2, 1))
    data, offsets = encode_phase_one(img)
    out = decode_phase_one(data, offsets, img.shape[1], img.shape[0], fmt=5)
    expect = img.copy()
    low = expect < 256
    expect[low] = _FMT5_CURVE[expect[low]]
    np.testing.assert_array_equal(out, expect)
    assert _FMT5_CURVE[255] == 16383 and _FMT5_CURVE[0] == 0


def test_swizzle_roundtrip():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 1 << 16, (6, 20), dtype=np.uint16)
    for fmt in (0, 1, 2):
        sw = swizzle_phase_one(img, 0x1234, 0xABCD, fmt)
        back = unswizzle_phase_one(sw, 0x1234, 0xABCD, fmt)
        np.testing.assert_array_equal(back, img)
    assert (swizzle_phase_one(img, 1, 2, 1) != img).any()


def test_black_correct_splits_and_clamp():
    pix = np.full((4, 6), 100, np.uint16)
    cblack = np.array([[-10, 5]] * 4, np.int16)   # per-row column pair
    rblack = np.array([[3, -600]] * 6, np.int16)  # per-col row pair
    out = black_correct(pix, fmt=3, black=50, cblack=cblack,
                        rblack=rblack, split_col=2, split_row=3)
    # fmt != 8 shifts left 2: 400 - 50 = 350 base.
    assert out[0, 0] == 350 - 10 + 3
    assert out[0, 3] == 350 + 5 + 3
    assert out[3, 0] == 0  # 350 - 10 - 600 < 0 clamps to zero
    out8 = black_correct(pix, fmt=8, black=0)
    assert (out8 == 100).all()


def test_romm_matrix_colorimetry():
    # An identity camera->ROMM matrix means camera == ProPhoto primaries;
    # the inverse of the derived xyz_to_cam must give back
    # (sRGB->XYZ) @ (ROMM->sRGB) -- composed WITHOUT inverting the tag
    # matrix (dcraw romm_coeff's form). Non-identity must enter
    # UN-inverted: cam_to_xyz(M) == cam_to_xyz(I) @ M.
    from imagepipe_tpu.color import SRGB_D65_33
    from imagepipe_tpu.iiq import _ROMM_TO_SRGB

    m = romm_to_xyz_to_cam(np.eye(3))
    assert m.shape == (4, 3) and (m[3] == 0).all()
    cam_to_xyz = np.linalg.inv(m[:3].astype(np.float64))
    np.testing.assert_allclose(
        cam_to_xyz, SRGB_D65_33.astype(np.float64) @ _ROMM_TO_SRGB,
        rtol=1e-4)
    # White (1,1,1) in camera space maps to a plausible positive XYZ.
    assert (cam_to_xyz @ np.ones(3) > 0).all()
    romm = np.array([[0.9, 0.05, 0.05], [0.1, 0.8, 0.1], [0.0, 0.1, 0.9]])
    got = np.linalg.inv(romm_to_xyz_to_cam(romm)[:3].astype(np.float64))
    np.testing.assert_allclose(got, cam_to_xyz @ romm, rtol=1e-4)


# ---------------------------------------------------------------------------
# Container.
# ---------------------------------------------------------------------------

def make_iiq(data, fmt=3, model="P65+", wb=(1.9, 1.0, 1.4),
             margins=(4, 2), visible=None, orient_code=0, black=0,
             cblack=None, rblack=None, splits=(0, 0), romm=None,
             keys=(0x1234, 0x5678)) -> bytes:
    """A Phase One IIQ container: 8-byte file magic, the "Raw" header at
    offset 8, a flat 16-byte-entry directory (all offsets base-relative,
    dcraw parse_phase_one semantics)."""
    h, w = data.shape
    top, left = margins
    if visible is None:
        visible = (h - top, w - left)
    vh, vw = visible

    heap = bytearray()

    def blob(b):
        off = len(heap)
        heap.extend(b)
        heap.extend(b"\0" * (-len(heap) % 4))
        return 12 + off  # heap sits after the 12-byte Raw header (base+12)

    entries = []  # (tag, type, len, data)
    if fmt >= 3:
        payload, offsets = encode_phase_one(data)
        entries.append((0x10F, 4, len(payload), blob(payload)))
        strips = struct.pack(f"<{h}I", *offsets)
        entries.append((0x21C, 4, len(strips), blob(strips)))
        if black:
            entries.append((0x21D, 4, 4, black))
        if cblack is not None:
            entries.append((0x223, 4, 2 * h * 2,
                            blob(np.asarray(cblack, "<i2").tobytes())))
            entries.append((0x222, 4, 4, splits[0]))
        if rblack is not None:
            entries.append((0x225, 4, 2 * w * 2,
                            blob(np.asarray(rblack, "<i2").tobytes())))
            entries.append((0x224, 4, 4, splits[1]))
    else:
        sw = swizzle_phase_one(data, keys[0], keys[1], fmt)
        entries.append((0x10F, 4, 2 * h * w, blob(sw.astype("<u2").tobytes())))
        if fmt:
            entries.append((0x112, 4, 4, keys[0] | (keys[1] << 16)))
        if black:
            entries.append((0x21D, 4, 4, black))
    entries += [
        (0x100, 4, 4, orient_code),
        (0x108, 4, 4, w), (0x109, 4, 4, h),
        (0x10A, 4, 4, left), (0x10B, 4, 4, top),
        (0x10C, 4, 4, vw), (0x10D, 4, 4, vh),
        (0x10E, 4, 4, fmt),
        (0x107, 11, 12, blob(struct.pack("<3f", *wb))),
        (0x301, 2, 64, blob(model.encode().ljust(64, b"\0"))),
    ]
    if romm is not None:
        entries.append((0x106, 11, 36,
                        blob(struct.pack("<9f", *np.asarray(
                            romm, np.float32).ravel()))))

    dir_off = 12 + len(heap)
    head = struct.pack("<4sI", b"IIII", 1)
    raw_hdr = struct.pack("<III", 0x4949, 0x52617700 | 1, dir_off)
    directory = struct.pack("<II", len(entries), 0)
    directory += b"".join(struct.pack("<4I", *e) for e in entries)
    return head + raw_hdr + bytes(heap) + directory


def test_container_compressed_end_to_end(tmp_path):
    img = _smooth(16, 24, seed=7)
    path = tmp_path / "shot.iiq"
    path.write_bytes(make_iiq(img, fmt=3, black=8))
    raw = read_iiq(str(path))
    assert (raw.make, raw.model) == ("Phase One", "P65+")
    assert raw.width == 24 and raw.height == 16
    assert raw.crops == (4, 0, 0, 2)  # top, right, bottom, left
    assert raw.cfa.name == "RGGB"
    assert raw.blacklevels == (0,) * 4  # black folded into the data
    expect = np.maximum((img.astype(np.int32) << 2) - 8, 0).astype(np.uint16)
    np.testing.assert_array_equal(raw.data, expect)
    assert raw.whitelevels == (0xFFFC - 8,) * 4  # dcraw: 0xfffc - black
    assert raw.wb_coeffs[0] == pytest.approx(1.9)
    assert codec_family(str(path)) == "iiq-fmt3"
    src = decode_file(str(path))  # full decoder-chain integration
    assert src.raw is not None and src.raw.model == "P65+"


def test_container_uncompressed_keyed(tmp_path):
    rng = np.random.default_rng(3)
    img = rng.integers(0, 1 << 16, (8, 12), dtype=np.uint16)
    for fmt in (0, 1, 2):
        path = tmp_path / f"u{fmt}.iiq"
        path.write_bytes(make_iiq(img, fmt=fmt, black=140))
        raw = read_iiq(str(path))
        np.testing.assert_array_equal(raw.data, img)
        assert raw.blacklevels == (140,) * 4  # not folded when uncompressed
        assert codec_family(str(path)) == "iiq-uncompressed"


def test_container_orientation_and_romm(tmp_path):
    img = _smooth(8, 16, seed=9)
    romm = np.array([[0.9, 0.05, 0.05], [0.1, 0.8, 0.1], [0.0, 0.1, 0.9]])
    for code, orient in [(0, Orientation.Normal), (1, Orientation.Rotate90),
                         (2, Orientation.Rotate270),
                         (3, Orientation.Rotate180)]:
        path = tmp_path / f"o{code}.iiq"
        path.write_bytes(make_iiq(img, orient_code=code, romm=romm))
        raw = read_iiq(str(path))
        assert raw.orientation is orient
        np.testing.assert_allclose(raw.xyz_to_cam,
                                   romm_to_xyz_to_cam(romm), rtol=1e-5)


def test_container_black_tables(tmp_path):
    img = _smooth(6, 16, seed=11)
    cblack = np.array([[-5, 9]] * 6, np.int16)
    rblack = np.array([[2, -3]] * 16, np.int16)
    path = tmp_path / "blk.iiq"
    path.write_bytes(make_iiq(img, black=30, cblack=cblack, rblack=rblack,
                              splits=(8, 3)))
    raw = read_iiq(str(path))
    expect = black_correct(img, 3, 30, cblack, rblack, 8, 3)
    np.testing.assert_array_equal(raw.data, expect)


def test_truncated_and_corrupt_fail_loud(tmp_path):
    img = _smooth(8, 16)
    blob = make_iiq(img)
    p = tmp_path / "trunc.iiq"
    p.write_bytes(blob[:len(blob) // 2])
    with pytest.raises(ValueError):
        read_iiq(str(p))
    p2 = tmp_path / "badsig.iiq"
    p2.write_bytes(blob[:13] + b"XXX" + blob[16:])  # clobber "waR"
    with pytest.raises(ValueError):
        read_iiq(str(p2))
