"""Sigma X3F (Foveon) container + format-6 Huffman raw — x3f.py.

Canonical-encoder round-trips pin the recalled container/bitstream
semantics (provenance notes at the top of x3f.py); the native twin
(native/x3f.cc) is held bit-identical by differential fuzz, including
identical fates on corrupted streams."""

import numpy as np
import pytest

from imagepipe_tpu.decode import codec_family, decode_file
from imagepipe_tpu.x3f import (decode_x3f_raw, encode_x3f,
                               encode_x3f_raw_payload, parse_x3f,
                               _decode_python)


def _scene(h, w, seed=0, top=1023):
    rng = np.random.default_rng(seed)
    img = (top // 2 + np.cumsum(rng.integers(-6, 7, (h, w, 3)), 1))
    return img.clip(0, top).astype(np.uint16)


def test_x3f_decodes_end_to_end(tmp_path):
    img = _scene(20, 36, seed=1)
    path = str(tmp_path / "shot.x3f")
    with open(path, "wb") as f:
        f.write(encode_x3f(img, model="SD10"))
    assert codec_family(path) == "x3f-huffman"
    src = decode_file(path)
    raw = src.raw
    assert (raw.cpp, raw.make, raw.model) == (3, "SIGMA", "SD10")
    assert raw.whitelevels[0] == 1023
    np.testing.assert_array_equal(raw.data.reshape(20, 36, 3), img)
    from imagepipe_tpu import Pipeline

    out = Pipeline.new_from_source(src).output_8bit(None)
    assert out.data.shape == (20, 36, 3)


def test_x3f_rotation_maps_to_orientation(tmp_path):
    from imagepipe_tpu.raw import Orientation

    img = _scene(12, 16, seed=2)
    for rot, orient, shape in ((0, Orientation.Normal, (12, 16, 3)),
                               (90, Orientation.Rotate90, (16, 12, 3)),
                               (180, Orientation.Rotate180, (12, 16, 3)),
                               (270, Orientation.Rotate270, (16, 12, 3))):
        path = str(tmp_path / f"rot{rot}.x3f")
        with open(path, "wb") as f:
            f.write(encode_x3f(img, rotation=rot))
        src = decode_file(path)
        assert src.raw.orientation is orient
        from imagepipe_tpu import Pipeline

        assert Pipeline.new_from_source(src).output_8bit(None).data.shape \
            == shape


def test_x3f_payload_roundtrip_stress():
    rng = np.random.default_rng(3)
    for trial in range(8):
        h, w = int(rng.integers(2, 24)), int(rng.integers(2, 24))
        kind = trial % 4
        if kind == 0:     # smooth sensor-like
            img = _scene(h, w, seed=trial)
        elif kind == 1:   # constant (single-symbol Huffman alphabet)
            img = np.full((h, w, 3), 700, np.uint16)
        elif kind == 2:   # full-range random u16 (big diffs, wide alphabet)
            img = rng.integers(0, 1 << 15, (h, w, 3)).astype(np.uint16)
        else:             # alternating extremes per row/column/channel
            img = np.where((np.arange(h)[:, None, None]
                            + np.arange(w)[None, :, None]
                            + np.arange(3)[None, None, :]) & 1,
                           1023, 0).astype(np.uint16)
        payload = encode_x3f_raw_payload(img)
        np.testing.assert_array_equal(_decode_python(payload, w, h), img,
                                      err_msg=f"trial {trial}")


def test_x3f_container_adversarial(tmp_path):
    img = _scene(8, 12, seed=4)
    blob = encode_x3f(img)
    # bad magic
    with pytest.raises(ValueError, match="magic"):
        parse_x3f(b"XXXX" + blob[4:])
    # truncation sweep: every prefix must fail loud, never crash/hang
    for cut in range(0, len(blob), 97):
        with pytest.raises(ValueError):
            x = parse_x3f(blob[:cut])
            decode_x3f_raw(x.raw_section())
    # directory offset out of range
    bad = blob[:-4] + np.uint32(len(blob) + 100).tobytes()
    with pytest.raises(ValueError):
        parse_x3f(bad)
    # rotation out of spec
    bad = bytearray(blob)
    bad[36:40] = np.uint32(45).tobytes()
    with pytest.raises(ValueError, match="rotation"):
        parse_x3f(bytes(bad))


def test_x3f_unsupported_formats_refuse_by_name(tmp_path):
    img = _scene(8, 12, seed=5)
    for fmt, name in ((30, "TRUE/Merrill"), (35, "Quattro"),
                      (8, "TRUE engine"), (5, "X530")):
        path = str(tmp_path / f"fmt{fmt}.x3f")
        with open(path, "wb") as f:
            f.write(encode_x3f(img, raw_format=fmt))
        assert codec_family(path) == f"x3f-fmt{fmt}-unsupported"
        with pytest.raises(ValueError) as ei:
            decode_file(path)
        assert name in str(ei.value)


def test_x3f_truncated_bitstream_fails_loud():
    img = _scene(10, 14, seed=6)
    payload = encode_x3f_raw_payload(img)
    with pytest.raises(ValueError):
        _decode_python(payload[: len(payload) - 4], 14, 10)
    with pytest.raises(ValueError):
        _decode_python(payload, 15, 10)   # wrong geometry must not pass


def test_x3f_python_native_fuzz():
    from imagepipe_tpu import native
    from imagepipe_tpu.x3f import _decode_native

    if not (native.have_native()
            and hasattr(native._lib, "x3f_huffman_decode")):
        pytest.skip("native library not built")
    rng = np.random.default_rng(7)
    img = _scene(10, 20, seed=7)
    payload = encode_x3f_raw_payload(img)
    np.testing.assert_array_equal(_decode_native(payload, 20, 10), img)
    # adversarial: corruptions must fail/succeed IDENTICALLY (including
    # corrupted diff/code tables) and never crash either implementation
    for trial in range(80):
        b = bytearray(payload)
        for _ in range(int(rng.integers(1, 5))):
            b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
        try:
            py = _decode_python(bytes(b), 20, 10)
        except ValueError:
            py = None
        try:
            nat = _decode_native(bytes(b), 20, 10)
        except ValueError:
            nat = None
        assert (py is None) == (nat is None), f"trial {trial}"
        if py is not None:
            np.testing.assert_array_equal(py, nat)


def test_x3f_properties_and_cli(tmp_path):
    img = _scene(16, 24, seed=8)
    path = str(tmp_path / "shot.x3f")
    with open(path, "wb") as f:
        f.write(encode_x3f(img, make="SIGMA", model="SD9",
                           extra_props={"WB_DESC": "Sunlight"}))
    x = parse_x3f(open(path, "rb").read())
    assert x.properties["WB_DESC"] == "Sunlight"
    from imagepipe_tpu.cli import main

    outp = str(tmp_path / "out.jpg")
    assert main(["converter", path, outp]) == 0
    from PIL import Image

    assert Image.open(outp).size == (24, 16)
