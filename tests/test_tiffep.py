"""Generic TIFF-EP CFA fallback reader (vendor.read_tiffep).

Covers the long tail of TIFF-based raws without dedicated decoders —
Epson ERF, Leica RWL, Mamiya MEF, Leaf MOS, uncompressed SRW/KDC/DCR,
3FR — which the reference reaches through rawloader
(/root/reference/src/pipeline.rs:264)."""

import numpy as np
import pytest

from imagepipe_tpu.decode import decode_file
from imagepipe_tpu.vendor import read_tiffep
from tests.tiffgen import TiffBuilder, pack_12be
from tests.test_vendor import _sensor


def make_tiffep(data, make="SEIKO EPSON CORP.", model="R-D1", bits=16,
                endian=">", compression=1, cfa=(0, 1, 1, 2),
                orientation=1) -> bytes:
    h, w = data.shape
    b = TiffBuilder(endian)
    if bits == 12:
        payload = pack_12be(data)  # big-endian packed
    else:
        payload = data.astype(f"{endian}u2").tobytes()
    strip = b.add_blob(payload)
    raw_ifd = b.add_ifd([
        (256, 4, [w]), (257, 4, [h]), (258, 3, [bits]),
        (259, 3, [compression]), (262, 3, [32803]),
        (273, 4, [strip]), (278, 4, [h]), (279, 4, [len(payload)]),
        (33421, 3, [2, 2]), (33422, 1, list(cfa)),
    ], chain=False)
    b.add_ifd([
        (271, 2, make), (272, 2, model), (274, 3, [orientation]),
        (330, 4, [raw_ifd]),
    ])
    return b.bytes()


def test_erf_16bit_decodes(tmp_path):
    data = _sensor(16, 24, seed=80)
    path = str(tmp_path / "shot.erf")
    with open(path, "wb") as f:
        f.write(make_tiffep(data))
    src = decode_file(path)
    raw = src.raw
    np.testing.assert_array_equal(raw.data, data)
    assert raw.cfa.name == "RGGB"
    assert raw.make.startswith("SEIKO")
    assert all(np.isnan(v) for v in raw.wb_coeffs[:3])


def test_packed_12bit_bigendian(tmp_path):
    data = _sensor(8, 32, seed=81, bits=12)
    path = str(tmp_path / "shot.mef")
    with open(path, "wb") as f:
        f.write(make_tiffep(data, make="Mamiya", model="ZD", bits=12))
    raw = read_tiffep(path)
    np.testing.assert_array_equal(raw.data, data)
    assert raw.whitelevels[0] == 4095


def test_little_endian_16bit(tmp_path):
    data = _sensor(8, 16, seed=82)
    path = str(tmp_path / "shot.mos")
    with open(path, "wb") as f:
        f.write(make_tiffep(data, make="Leaf", model="Aptus 22",
                            endian="<"))
    raw = read_tiffep(path)
    np.testing.assert_array_equal(raw.data, data)


def test_alternate_cfa_order(tmp_path):
    data = _sensor(8, 16, seed=83)
    path = str(tmp_path / "shot.srw")
    with open(path, "wb") as f:
        f.write(make_tiffep(data, make="SAMSUNG", model="NX100",
                            cfa=(2, 1, 1, 0)))
    assert read_tiffep(path).cfa.name == "BGGR"


def test_compressed_named_gap(tmp_path):
    data = _sensor(8, 16, seed=84)
    path = str(tmp_path / "comp.srw")
    with open(path, "wb") as f:
        f.write(make_tiffep(data, make="SAMSUNG", model="NX300",
                            compression=32770))
    with pytest.raises(ValueError, match="compression 32770"):
        read_tiffep(path)
    # Through the registry too: the error must name the gap.
    with pytest.raises(ValueError, match="NX300"):
        decode_file(path)


def test_undersized_strips_named(tmp_path):
    data = _sensor(8, 16, seed=85)
    blob = bytearray(make_tiffep(data))
    path = str(tmp_path / "short.3fr")
    # Build a container whose byte counts undershoot both layouts.
    b = TiffBuilder(">")
    payload = data.astype(">u2").tobytes()[: 8 * 16]
    strip = b.add_blob(payload)
    raw_ifd = b.add_ifd([
        (256, 4, [16]), (257, 4, [8]), (258, 3, [16]), (259, 3, [1]),
        (262, 3, [32803]), (273, 4, [strip]), (278, 4, [8]),
        (279, 4, [len(payload)]),
        (33421, 3, [2, 2]), (33422, 1, [0, 1, 1, 2]),
    ], chain=False)
    b.add_ifd([(271, 2, "Hasselblad"), (272, 2, "CFV-39"),
               (330, 4, [raw_ifd])])
    with open(path, "wb") as f:
        f.write(b.bytes())
    with pytest.raises(ValueError, match="neither 16-bit words nor"):
        read_tiffep(path)


def test_no_cfa_ifd_rejected(tmp_path):
    b = TiffBuilder(">")
    b.add_ifd([(271, 2, "Epson"), (272, 2, "R-D1")])
    path = str(tmp_path / "flat.erf")
    with open(path, "wb") as f:
        f.write(b.bytes())
    with pytest.raises(ValueError, match="no CFA raw IFD"):
        read_tiffep(path)


def test_develops_end_to_end(tmp_path):
    from imagepipe_tpu.pipeline import Pipeline

    data = _sensor(32, 48, seed=86)
    path = str(tmp_path / "dev.erf")
    with open(path, "wb") as f:
        f.write(make_tiffep(data))
    out = Pipeline.new_from_file(path).output_8bit()
    assert out.data.shape == (32, 48, 3)
    assert out.data.std() > 0


# ---------------------------------------------------------------------------
# Samsung SRW 12-bit compressed (compression 32772) — samsung.py
# ---------------------------------------------------------------------------


def make_srw_compressed(data, model="NX10") -> bytes:
    from imagepipe_tpu.samsung import encode_samsung12

    h, w = data.shape
    payload = encode_samsung12(data)
    b = TiffBuilder("<")
    strip = b.add_blob(payload)
    raw_ifd = b.add_ifd([
        (256, 4, [w]), (257, 4, [h]), (258, 3, [12]),
        (259, 3, [32772]), (262, 3, [32803]),
        (273, 4, [strip]), (278, 4, [h]), (279, 4, [len(payload)]),
        (33421, 3, [2, 2]), (33422, 1, [0, 1, 1, 2]),
    ], chain=False)
    b.add_ifd([
        (271, 2, "SAMSUNG"), (272, 2, model), (274, 3, [1]),
        (330, 4, [raw_ifd]),
    ])
    return b.bytes()


def test_srw_32772_decodes(tmp_path):
    data = _sensor(16, 64, seed=90, bits=12)
    path = str(tmp_path / "shot.srw")
    with open(path, "wb") as f:
        f.write(make_srw_compressed(data))
    from imagepipe_tpu.decode import codec_family

    assert codec_family(path) == "srw-32772"
    src = decode_file(path)
    raw = src.raw
    np.testing.assert_array_equal(raw.data, data)
    assert raw.whitelevels[0] == 4095
    assert raw.cfa.name == "RGGB"
    # end-to-end develop
    from imagepipe_tpu import Pipeline

    out = Pipeline.new_from_source(src).output_8bit(None)
    assert out.data.shape == (16, 64, 3)


def test_srw_32772_roundtrip_stress():
    from imagepipe_tpu.samsung import decode_samsung12, encode_samsung12

    rng = np.random.default_rng(91)
    for trial in range(8):
        h, w = 2 * int(rng.integers(2, 8)), 32 * int(rng.integers(1, 4))
        kind = trial % 4
        if kind == 0:
            img = rng.integers(0, 1 << 12, (h, w)).astype(np.uint16)
        elif kind == 1:
            img = np.zeros((h, w), np.uint16)
        elif kind == 2:  # smooth sensor-like (vertical prediction wins)
            img = (1000 + np.cumsum(rng.integers(-8, 9, (h, w)), 0)
                   ).clip(0, 4095).astype(np.uint16)
        else:            # alternating extremes (worst-case lengths)
            img = np.where((np.arange(w)[None, :] ^ np.arange(h)[:, None]) & 1,
                           4095, 0).astype(np.uint16)
        st = encode_samsung12(img)
        np.testing.assert_array_equal(decode_samsung12(st, w, h), img)


def test_srw_32772_truncated_fails_loud(tmp_path):
    from imagepipe_tpu.samsung import decode_samsung12, encode_samsung12

    data = _sensor(8, 32, seed=92, bits=12)
    st = encode_samsung12(data)
    with pytest.raises(ValueError):
        decode_samsung12(st[: len(st) // 2], 32, 8)
    with pytest.raises(ValueError):
        decode_samsung12(st, 48, 8)   # wrong geometry must not pass silently


def test_srw_32772_python_native_fuzz():
    from imagepipe_tpu import native
    from imagepipe_tpu.samsung import (_decode_native, _decode_python,
                                       encode_samsung12)

    if not (native.have_native()
            and hasattr(native._lib, "samsung12_decode")):
        pytest.skip("native library not built")
    rng = np.random.default_rng(93)
    img = (900 + np.cumsum(rng.integers(-9, 10, (8, 64)), 1)
           ).clip(0, 4095).astype(np.uint16)
    data = encode_samsung12(img)
    np.testing.assert_array_equal(_decode_native(data, 64, 8), img)
    np.testing.assert_array_equal(_decode_python(data, 64, 8), img)
    # adversarial: random corruptions must fail/succeed IDENTICALLY and
    # never crash either implementation
    for trial in range(60):
        b = bytearray(data)
        for _ in range(int(rng.integers(1, 5))):
            b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
        try:
            py = _decode_python(bytes(b), 64, 8)
        except ValueError:
            py = None
        try:
            nat = _decode_native(bytes(b), 64, 8)
        except ValueError:
            nat = None
        assert (py is None) == (nat is None), f"trial {trial}"
        if py is not None:
            np.testing.assert_array_equal(py, nat)


# ---------------------------------------------------------------------------
# Mamiya MEF / Leaf MOS lossless-JPEG strips (compression 7) — the
# vendor-compressed tier that shares the DNG LJ92 codec (lj92.py).
# ---------------------------------------------------------------------------


def make_tiffep_lj92(data, make="Mamiya", model="ZD", bits=12,
                     endian=">", ncomp=2, rows_per_strip=None,
                     cfa=(0, 1, 1, 2)) -> bytes:
    """Canonical TIFF-EP container with SOF3 strips: each strip is an
    independent LJ92 stream of rows_per_strip rows, components
    interleaved into consecutive columns."""
    from imagepipe_tpu.lj92 import encode as lj92_encode

    h, w = data.shape
    rps = rows_per_strip or h
    b = TiffBuilder(endian)
    offsets, counts = [], []
    for y0 in range(0, h, rps):
        rows = data[y0:y0 + rps]
        payload = lj92_encode(rows, ncomp=ncomp, precision=bits)
        offsets.append(b.add_blob(payload))
        counts.append(len(payload))
    raw_ifd = b.add_ifd([
        (256, 4, [w]), (257, 4, [h]), (258, 3, [bits]),
        (259, 3, [7]), (262, 3, [32803]),
        (273, 4, offsets), (278, 4, [rps]), (279, 4, counts),
        (33421, 3, [2, 2]), (33422, 1, list(cfa)),
    ], chain=False)
    b.add_ifd([
        (271, 2, make), (272, 2, model), (274, 3, [1]),
        (330, 4, [raw_ifd]),
    ])
    return b.bytes()


def test_mef_lj92_decodes(tmp_path):
    from imagepipe_tpu.decode import codec_family

    data = _sensor(16, 32, seed=90, bits=12)
    path = str(tmp_path / "shot.mef")
    with open(path, "wb") as f:
        f.write(make_tiffep_lj92(data))
    assert codec_family(path) == "mef-lj92"
    raw = read_tiffep(path)
    np.testing.assert_array_equal(raw.data, data)
    assert raw.whitelevels[0] == 4095      # from SOF3 precision
    assert raw.cfa.name == "RGGB"
    assert raw.make == "Mamiya"


def test_mos_lj92_multistrip_little_endian(tmp_path):
    from imagepipe_tpu.decode import codec_family

    data = _sensor(24, 16, seed=91)
    path = str(tmp_path / "back.mos")
    with open(path, "wb") as f:
        f.write(make_tiffep_lj92(data, make="Leaf", model="Aptus 75",
                                 bits=16, endian="<", ncomp=1,
                                 rows_per_strip=8))
    assert codec_family(path) == "mos-lj92"
    raw = read_tiffep(path)
    np.testing.assert_array_equal(raw.data, data)
    assert raw.whitelevels[0] == 65535


def test_tiffep_lj92_develops_end_to_end(tmp_path):
    from imagepipe_tpu import Pipeline

    data = _sensor(32, 48, seed=92, bits=12)
    path = str(tmp_path / "dev.mef")
    with open(path, "wb") as f:
        f.write(make_tiffep_lj92(data, rows_per_strip=16))
    out = Pipeline.new_from_file(path).output_8bit()
    assert out.data.shape == (32, 48, 3)
    assert out.data.std() > 0


def test_tiffep_lj92_ycbcr_refused(tmp_path):
    data = _sensor(8, 24, seed=93, bits=12)
    path = str(tmp_path / "ycc.mos")
    with open(path, "wb") as f:
        f.write(make_tiffep_lj92(data, make="Leaf", model="X",
                                 ncomp=3))
    with pytest.raises(ValueError, match="3-component"):
        read_tiffep(path)


def test_tiffep_lj92_size_mismatch_fails_loud(tmp_path):
    # Strip decodes fewer samples than rows*width -> named error, never
    # a silent short raster.
    data = _sensor(16, 32, seed=94, bits=12)
    blob = bytearray(make_tiffep_lj92(data))
    path = str(tmp_path / "bad.mef")
    # Lie about the height: container claims 18 rows, stream has 16.
    # Tag 257 (height) is a LONG; find-and-bump via rebuild instead of
    # byte surgery: rebuild with explicit wrong dims.
    from imagepipe_tpu.lj92 import encode as lj92_encode

    b = TiffBuilder(">")
    payload = lj92_encode(data, ncomp=2, precision=12)
    strip = b.add_blob(payload)
    raw_ifd = b.add_ifd([
        (256, 4, [32]), (257, 4, [18]), (258, 3, [12]),
        (259, 3, [7]), (262, 3, [32803]),
        (273, 4, [strip]), (278, 4, [18]), (279, 4, [len(payload)]),
        (33421, 3, [2, 2]), (33422, 1, [0, 1, 1, 2]),
    ], chain=False)
    b.add_ifd([(271, 2, "Mamiya"), (272, 2, "ZD"), (330, 4, [raw_ifd])])
    with open(path, "wb") as f:
        f.write(b.bytes())
    with pytest.raises(ValueError, match="expected 18x32"):
        read_tiffep(path)


def test_tiffep_lj92_truncated_and_corrupt_fail_loud(tmp_path):
    """Container-level adversarial coverage for the MEF/MOS LJ92 tier:
    truncated payloads, non-JPEG strips, and strip-count mismatches must
    raise named ValueErrors, never crash or return a silent raster."""
    from imagepipe_tpu.lj92 import encode as lj92_encode

    data = _sensor(16, 32, seed=95, bits=12)
    payload = lj92_encode(data, ncomp=2, precision=12)

    def build(strips, rps=16, h=16):
        b = TiffBuilder(">")
        offs = [b.add_blob(s) for s in strips]
        raw_ifd = b.add_ifd([
            (256, 4, [32]), (257, 4, [h]), (258, 3, [12]),
            (259, 3, [7]), (262, 3, [32803]),
            (273, 4, offs), (278, 4, [rps]),
            (279, 4, [len(s) for s in strips]),
            (33421, 3, [2, 2]), (33422, 1, [0, 1, 1, 2]),
        ], chain=False)
        b.add_ifd([(271, 2, "Mamiya"), (272, 2, "ZD"),
                   (330, 4, [raw_ifd])])
        return b.bytes()

    def write(blob, name):
        path = str(tmp_path / name)
        with open(path, "wb") as f:
            f.write(blob)
        return path

    # Truncated stream: the lj92 bit reader zero-fills past EOF (dcraw
    # semantics) when the header survives, so either outcome is valid —
    # a named error or a full-shape raster (garbage tail, never a crash
    # or short buffer).
    try:
        raw = read_tiffep(write(build([payload[: len(payload) // 3]]),
                                "t.mef"))
        assert raw.data.shape == (16, 32)
    except ValueError:
        pass
    # Garbage strip: not a JPEG stream at all -> named ValueError (a
    # regression guard for the assert->raise fix: must hold under -O).
    with pytest.raises(ValueError):
        read_tiffep(write(build([b"\x00" * 256]), "g.mef"))
    # Strip count disagrees with RowsPerStrip-derived count.
    with pytest.raises(ValueError, match="strips"):
        read_tiffep(write(build([payload, payload], rps=16), "n.mef"))
    # Random byte-flip sweep over the scan body: any outcome is fine
    # except a crash or a wrong-shape return.
    rng = np.random.default_rng(96)
    for trial in range(40):
        mut = bytearray(payload)
        for _ in range(int(rng.integers(1, 6))):
            mut[int(rng.integers(40, len(mut)))] = int(rng.integers(256))
        path = write(build([bytes(mut)]), f"m{trial}.mef")
        try:
            raw = read_tiffep(path)
            assert raw.data.shape == (16, 32)
        except ValueError:
            pass
