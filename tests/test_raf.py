"""Fujifilm RAF reader against synthesized byte-accurate containers."""

import struct

import numpy as np
import pytest

from imagepipe_tpu import ImageSource, Pipeline
from imagepipe_tpu.cameras import xyz_to_cam_for
from imagepipe_tpu.decode import decode_file
from imagepipe_tpu.raf import read_raf, raf_levels_for
from imagepipe_tpu.raw import CFA, Orientation, RawImage

XTRANS = "GBGGRGRGRBGBGBGGRGRGRBGBGBGGRGGRGGBG"
_LETTER_TO_CODE = {"R": 0, "G": 1, "B": 2, "E": 3}


def make_raf(data, model="X-T2", wb=(302, 580, 302, 1044), pattern=XTRANS,
             tiff_cfa=False, extra_recs=()) -> bytes:
    """Classic RAF: header + meta records + big-endian u16 payload. wb is
    the on-disk (G, R, G2, B) quadruple."""
    h, w = data.shape
    recs = []
    recs.append((0x0100, struct.pack(">HH", h, w)))
    if pattern is not None:
        codes = bytes(_LETTER_TO_CODE[c] for c in pattern)[::-1]  # dcraw order
        recs.append((0x0131, codes))
    recs.append((0x2FF0, struct.pack(">HHHH", *wb)))
    recs.extend(extra_recs)
    meta = struct.pack(">I", len(recs)) + b"".join(
        struct.pack(">HH", tag, len(payload)) + payload
        for tag, payload in recs)

    payload = (b"II*\0" + b"\0" * 64 if tiff_cfa
               else data.astype(">u2").tobytes())
    header_len = 0x54 + 24
    meta_off = header_len
    cfa_off = meta_off + len(meta)
    head = bytearray()
    head += b"FUJIFILMCCD-RAW "                    # 0x00
    head += b"0201"                                # 0x10
    head += b"FF119412"                            # 0x14 camera number
    head += model.encode().ljust(32, b"\0")        # 0x1c
    head += b"0100"                                # 0x3c
    head += b"\0" * (0x54 - len(head))
    head += struct.pack(">IIIIII", 0, 0, meta_off, len(meta),
                        cfa_off, len(payload))
    assert len(head) == header_len
    return bytes(head) + meta + payload


def _sensor(h, w, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 1 << 14, (h, w), dtype=np.uint16)


def test_raf_decode(tmp_path):
    data = _sensor(36, 48)
    p = tmp_path / "shot.raf"
    p.write_bytes(make_raf(data))
    got = read_raf(str(p))
    np.testing.assert_array_equal(got.data, data)
    assert (got.width, got.height, got.cpp) == (48, 36, 1)
    assert got.cfa.name == XTRANS
    assert got.make == "FUJIFILM" and got.model == "X-T2"
    # WB: on-disk (G=302, R=580, G2=302, B=1044) -> (R/G, 1, B/G).
    np.testing.assert_allclose(got.wb_coeffs[:3], (580 / 302, 1.0, 1044 / 302))
    black, white = raf_levels_for("X-T2")
    assert got.blacklevels == (black,) * 4
    assert got.whitelevels == (white,) * 4
    np.testing.assert_array_equal(got.xyz_to_cam,
                                  xyz_to_cam_for("FUJIFILM", "X-T2"))

    # Registry path + end-to-end develop parity with the same data direct.
    src = decode_file(str(p))
    want = RawImage(
        width=48, height=36, cpp=1, crops=(0, 0, 0, 0),
        blacklevels=(black,) * 4, whitelevels=(white,) * 4,
        wb_coeffs=got.wb_coeffs, xyz_to_cam=got.xyz_to_cam,
        orientation=Orientation.Normal, cfa=CFA(XTRANS), data=data,
        make="FUJIFILM", model="X-T2")
    po = Pipeline.new_from_source(src).output_8bit(None)
    pw = Pipeline.new_from_source(ImageSource.from_raw(want)).output_8bit(None)
    np.testing.assert_array_equal(po.data, pw.data)


def make_raf_tiff(data, model="X-T30", black=1022, compressed=False,
                  pattern=XTRANS, payload=None) -> bytes:
    """Newer-body RAF: the CFA section is an embedded little-endian TIFF
    whose FujiIFD (tag 0xF000) carries dims/bits/strips/black. Real files
    keep the classic meta block (pattern + WB records) alongside.
    compressed=True encodes the data as a real fuji-compressed stream
    (pass payload= to override with arbitrary strip bytes)."""
    from tiffgen import TiffBuilder

    h, w = data.shape
    b = TiffBuilder("<")
    if payload is None:
        if compressed:
            from imagepipe_tpu.fujic import encode_fuji
            from imagepipe_tpu.raw import CFA as _CFA

            payload, _snapped = encode_fuji(
                data, raw_type=16, raw_bits=14,
                cfa_grid=_CFA(pattern).pattern if pattern else None)
        else:
            payload = data.astype("<u2").tobytes()
    strip = b.add_blob(payload)
    fuji_ifd = b.add_ifd([
        (0xF001, 4, [w]), (0xF002, 4, [h]), (0xF003, 4, [14]),
        (0xF007, 4, [strip]), (0xF008, 4, [len(payload)]),
        (0xF00A, 4, [black] * 4),
    ], chain=False)
    b.add_ifd([(0xF000, 4, [fuji_ifd])])
    tiff = b.bytes()

    head = bytearray()
    head += b"FUJIFILMCCD-RAW "
    head += b"0201" + b"FF129506" + model.encode().ljust(32, b"\0") + b"0100"
    head += b"\0" * (0x54 - len(head))
    recs = []
    if pattern is not None:
        recs.append((0x0131, bytes(_LETTER_TO_CODE[c] for c in pattern)[::-1]))
    recs.append((0x2FF0, struct.pack(">HHHH", 300, 570, 300, 1020)))
    meta = struct.pack(">I", len(recs)) + b"".join(
        struct.pack(">HH", tag, len(pl)) + pl for tag, pl in recs)
    meta_off = 0x54 + 24
    cfa_off = meta_off + len(meta)
    head += struct.pack(">IIIIII", 0, 0, meta_off, len(meta),
                        cfa_off, len(tiff))
    return bytes(head) + meta + tiff


def test_raf_tiff_wrapped_decode(tmp_path):
    data = _sensor(36, 48, seed=6)
    p = tmp_path / "new.raf"
    p.write_bytes(make_raf_tiff(data))
    got = read_raf(str(p))
    np.testing.assert_array_equal(got.data, data)
    assert (got.width, got.height) == (48, 36)
    assert got.cfa.name == XTRANS   # from the meta block's 0x0131 record
    assert got.model == "X-T30"
    assert got.blacklevels == (1022,) * 4    # from FujiIFD 0xF00A
    assert got.whitelevels == ((1 << 14) - 1,) * 4
    np.testing.assert_allclose(got.wb_coeffs[:3], (570 / 300, 1.0, 1020 / 300))
    # Develops through the standard chain.
    from imagepipe_tpu.decode import decode_file
    out = Pipeline.new_from_source(decode_file(str(p))).output_8bit(None)
    assert out.width == 48 and out.height == 36


def test_raf_tiff_wrapped_compressed_decodes(tmp_path):
    # The fuji lossless stream (X-T3-onward default). The container must
    # reproduce exactly what the canonical encoder committed to (the
    # snapped image: interpolated X-Trans positions take the decoder's
    # gradient-median value).
    from imagepipe_tpu.fujic import encode_fuji

    yy, xx = np.mgrid[0:24, 0:24]
    data = (1500 + yy * 31 + xx * 17).astype(np.uint16)
    _, snapped = encode_fuji(data, raw_type=16, raw_bits=14,
                             cfa_grid=CFA(XTRANS).pattern)
    p = tmp_path / "cmp.raf"
    p.write_bytes(make_raf_tiff(data, compressed=True))
    got = read_raf(str(p))
    np.testing.assert_array_equal(got.data, snapped)
    assert got.cfa.name == XTRANS
    assert got.blacklevels == (1022,) * 4
    out = Pipeline.new_from_source(decode_file(str(p))).output_8bit(None)
    assert out.width == 24 and out.height == 24


def test_raf_tiff_wrapped_garbage_compressed_rejected(tmp_path):
    # An undersized strip that is NOT a valid fuji stream must raise,
    # not crash or mis-decode.
    data = _sensor(24, 24, seed=7)
    payload = data.astype("<u2").tobytes()[: 24 * 24 // 3]
    p = tmp_path / "bad.raf"
    p.write_bytes(make_raf_tiff(data, payload=payload))
    with pytest.raises(ValueError, match="fuji-compressed"):
        read_raf(str(p))


def test_raf_tiff_wrapped_without_pattern_rejected(tmp_path):
    """No 0x0131 record and no registered pattern -> clear error, never a
    guessed mosaic (a wrong CFA silently corrupts colors); registering a
    per-model pattern unlocks the decode."""
    from imagepipe_tpu import raf as raf_mod

    p = tmp_path / "nopat.raf"
    p.write_bytes(make_raf_tiff(_sensor(24, 24, seed=8), model="GFX100",
                                pattern=None))
    raf_mod._PATTERNS.pop("GFX100", None)
    with pytest.raises(ValueError, match="pattern"):
        read_raf(str(p))
    raf_mod.register_raf_pattern("GFX100", XTRANS)
    try:
        got = read_raf(str(p))
        assert got.cfa.name == XTRANS
    finally:
        raf_mod._PATTERNS.pop("GFX100", None)


def test_raf_rejects_unsupported_flavors(tmp_path):
    data = _sensor(12, 12)
    bayer = tmp_path / "bayer.raf"
    bayer.write_bytes(make_raf(data, pattern=None))
    with pytest.raises(ValueError, match="register_raf_pattern"):
        read_raf(str(bayer))

    # A TIFF-wrapped CFA section without a usable FujiIFD fails cleanly.
    tiffed = tmp_path / "tiff.raf"
    tiffed.write_bytes(make_raf(data, tiff_cfa=True))
    with pytest.raises(ValueError, match="FujiIFD|TIFF"):
        read_raf(str(tiffed))


def test_raf_truncations_raise(tmp_path):
    data = _sensor(12, 12)
    blob = make_raf(data)
    for cut in (8, 0x30, 0x60, len(blob) - 40):
        p = tmp_path / f"cut{cut}.raf"
        p.write_bytes(blob[:cut])
        with pytest.raises(ValueError):
            read_raf(str(p))


def test_raf_byte_fuzz_never_crashes(tmp_path):
    """Random truncations and byte corruptions either decode or raise
    ValueError -- never hang or escape with another exception type."""
    blob = bytearray(make_raf(_sensor(24, 24, seed=9)))
    rng = np.random.default_rng(17)
    for i in range(40):
        bad = bytearray(blob)
        for _ in range(int(rng.integers(1, 6))):
            bad[int(rng.integers(16, len(bad)))] = int(rng.integers(0, 256))
        if rng.random() < 0.4:
            bad = bad[:int(rng.integers(16, len(bad)))]
        p = tmp_path / f"fuzz{i}.raf"
        p.write_bytes(bytes(bad))
        try:
            read_raf(str(p))
        except ValueError:
            pass


# ---------------------------------------------------------------------------
# Classic SuperCCD + Bayer records (raf.py superccd_cfa/superccd_geometry)
# ---------------------------------------------------------------------------

def _dcraw_superccd_map(row, col, fuji_width, layout):
    """dcraw fuji_load_raw's raw->upright lattice bijection."""
    if layout:
        return (fuji_width - 1 - col + (row >> 1), col + ((row + 1) >> 1))
    return (fuji_width - 1 + row - (col >> 1), row + ((col + 1) >> 1))


@pytest.mark.parametrize("layout", [0, 1])
@pytest.mark.parametrize("fuji_width", [12, 13])
def test_superccd_cfa_matches_dcraw_mapping(layout, fuji_width):
    from imagepipe_tpu.raf import superccd_cfa
    from imagepipe_tpu.raw import CFA

    # dcraw parse_fuji: filters = fuji_width & 1 ? 0x94949494 (RGGB)
    #                                            : 0x49494949 (GBRG)
    base = CFA("GBRG" if fuji_width % 2 == 0 else "RGGB")
    cfa = superccd_cfa(fuji_width, layout)
    assert (cfa.height, cfa.width) == ((4, 2) if layout else (2, 4))
    seen = set()
    h, w = (24, fuji_width) if layout else (24, 2 * fuji_width)
    for row in range(h):
        for col in range(w):
            r, c = _dcraw_superccd_map(row, col, fuji_width, layout)
            # The color our raw-frame pattern assigns must equal the
            # upright-frame mosaic color dcraw assigns the same sample.
            assert cfa.color_at(row, col) == base.color_at(r % 2, c % 2), \
                (row, col, r, c)
            # And the lattice map is injective (each upright cell gets
            # at most one raw sample -- no double writes).
            assert (r, c) not in seen
            seen.add((r, c))


def test_superccd_geometry_preserves_samples():
    from imagepipe_tpu.raf import superccd_geometry

    oh, ow = superccd_geometry(2144, 2880, layout=0)
    assert abs(oh * ow - 2144 * 2880) / (2144 * 2880) < 0.01
    assert oh > 2144 and ow < 2880
    th, tw = superccd_geometry(2880, 2144, layout=1)
    assert (th, tw) == (ow, oh)


def test_superccd_classic_decodes(tmp_path):
    data = _sensor(16, 24, seed=21)
    extra = [(0x0130, bytes([0x00, 0x00])),          # layout 0, SuperCCD
             (0x0121, struct.pack(">HH", 16, 24))]
    p = tmp_path / "s2.raf"
    p.write_bytes(make_raf(data, model="FinePixS2Pro", pattern=None,
                           extra_recs=extra))
    raw = read_raf(str(p))
    np.testing.assert_array_equal(raw.data, data)
    assert (raw.cfa.height, raw.cfa.width) == (2, 4)
    # fuji_width = 24 >> 1 = 12 (even) -> GBRG upright mosaic; spot-check
    # the first pattern row against the dcraw mapping.
    from imagepipe_tpu.raw import CFA
    base = CFA("GBRG")
    for col in range(4):
        r, c = _dcraw_superccd_map(0, col, 12, 0)
        assert raw.cfa.color_at(0, col) == base.color_at(r % 2, c % 2)


def test_superccd_hr_layout_decodes(tmp_path):
    data = _sensor(24, 13, seed=22)
    extra = [(0x0130, bytes([0x80, 0x00]))]          # layout 1, SuperCCD
    p = tmp_path / "hr.raf"
    p.write_bytes(make_raf(data, model="FinePixF700", pattern=None,
                           extra_recs=extra))
    raw = read_raf(str(p))
    assert (raw.cfa.height, raw.cfa.width) == (4, 2)
    np.testing.assert_array_equal(raw.data, data)


def test_superccd_develops_end_to_end(tmp_path):
    """The 2x4 lattice pattern demosaics through the generic-CFA engine."""
    from imagepipe_tpu.pipeline import Pipeline

    data = (_sensor(48, 96, seed=23) % 8000 + 800).astype(np.uint16)
    extra = [(0x0130, bytes([0x00, 0x00])),
             (0x0121, struct.pack(">HH", 48, 96))]
    p = tmp_path / "dev.raf"
    p.write_bytes(make_raf(data, model="FinePixS5Pro", pattern=None,
                           extra_recs=extra))
    out = Pipeline.new_from_file(str(p)).output_8bit()
    assert out.data.shape == (48, 96, 3)
    assert out.data.std() > 0


def test_bayer_classic_registry_path(tmp_path):
    import imagepipe_tpu.raf as raf_mod
    from imagepipe_tpu.raf import register_raf_pattern

    data = _sensor(12, 16, seed=24)
    p = tmp_path / "bayer.raf"
    p.write_bytes(make_raf(data, model="FinePixS9000", pattern=None,
                           extra_recs=[(0x0130, bytes([0x00, 0x08]))]))
    try:
        register_raf_pattern("FinePixS9000", "BGGR")
        raw = read_raf(str(p))
        np.testing.assert_array_equal(raw.data, data)
        assert raw.cfa.name == "BGGR"
    finally:
        raf_mod._PATTERNS.pop("FINEPIXS9000", None)
