"""Orientation tests with the ASCII-art F fixture
(/root/reference/src/ops/transform.rs:146-279)."""

from imagepipe_tpu import from_rgb_str_vec, Orientation
from imagepipe_tpu.ops.transform import rotate_buffer

F = from_rgb_str_vec([
    "        ",
    " RRRRRR ",
    " GG     ",
    " BBBB   ",
    " GG     ",
    " GG     ",
    "        ",
])


def test_rotate_unknown():
    assert rotate_buffer(F, Orientation.Unknown) == F


def test_rotate_normal():
    assert rotate_buffer(F, Orientation.Normal) == F


def test_rotate_flip_x():
    out = from_rgb_str_vec([
        "        ",
        " RRRRRR ",
        "     GG ",
        "   BBBB ",
        "     GG ",
        "     GG ",
        "        ",
    ])
    assert rotate_buffer(F, Orientation.HorizontalFlip) == out


def test_rotate_flip_y():
    out = from_rgb_str_vec([
        "        ",
        " GG     ",
        " GG     ",
        " BBBB   ",
        " GG     ",
        " RRRRRR ",
        "        ",
    ])
    assert rotate_buffer(F, Orientation.VerticalFlip) == out


def test_rotate_rotate90_cw():
    out = from_rgb_str_vec([
        "       ",
        " GGBGR ",
        " GGBGR ",
        "   B R ",
        "   B R ",
        "     R ",
        "     R ",
        "       ",
    ])
    assert rotate_buffer(F, Orientation.Rotate90) == out


def test_rotate_rotate270_cw():
    out = from_rgb_str_vec([
        "       ",
        " R     ",
        " R     ",
        " R B   ",
        " R B   ",
        " RGBGG ",
        " RGBGG ",
        "       ",
    ])
    assert rotate_buffer(F, Orientation.Rotate270) == out


def test_rotate_rotate180():
    out = from_rgb_str_vec([
        "        ",
        "     GG ",
        "     GG ",
        "   BBBB ",
        "     GG ",
        " RRRRRR ",
        "        ",
    ])
    assert rotate_buffer(F, Orientation.Rotate180) == out


def test_rotate_transpose():
    out = from_rgb_str_vec([
        "       ",
        " RGBGG ",
        " RGBGG ",
        " R B   ",
        " R B   ",
        " R     ",
        " R     ",
        "       ",
    ])
    assert rotate_buffer(F, Orientation.Transpose) == out


def test_rotate_transverse():
    out = from_rgb_str_vec([
        "       ",
        "     R ",
        "     R ",
        "   B R ",
        "   B R ",
        " GGBGR ",
        " GGBGR ",
        "       ",
    ])
    assert rotate_buffer(F, Orientation.Transverse) == out


def test_flips_roundtrip():
    for o in Orientation:
        if o is Orientation.Unknown:
            continue
        assert Orientation.from_flips(o.to_flips()) is o
