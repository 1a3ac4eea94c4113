"""Stage 8: orientation fix (90-degree rotations and flips).

Re-design of OpTransform (/root/reference/src/ops/transform.rs). The
reference implements a strided gather; on device the same permutation is
just flips + transpose, which XLA lowers to a copy with a permuted layout.
"""

from __future__ import annotations

import enum

from .base import ImageOp
from ..buffer import OpBuffer
from ..raw import Orientation
from ..sources import ImageSource

__all__ = ["Rotation", "OpTransform", "rotate_buffer"]


class Rotation(enum.Enum):
    Normal = "Normal"
    Rotate90 = "Rotate90"
    Rotate180 = "Rotate180"
    Rotate270 = "Rotate270"


_ROT_TO_ORIENT = {
    Rotation.Normal: Orientation.Normal,
    Rotation.Rotate90: Orientation.Rotate90,
    Rotation.Rotate180: Orientation.Rotate180,
    Rotation.Rotate270: Orientation.Rotate270,
}
_ROT_INDEX = {r: i for i, r in enumerate(Rotation)}


def rotate_buffer(buf: OpBuffer, orientation: Orientation) -> OpBuffer:
    """Apply an EXIF orientation (transform.rs:87-144): decompose into
    (transpose, flip_x, flip_y) and permute. out[r,c] = in[...]:
    without transpose y=flip_y?H-1-r:r, x=flip_x?W-1-c:c; with transpose the
    roles of r and c swap -- identical to the reference's strided gather."""
    assert buf.colors == 3
    if orientation in (Orientation.Normal, Orientation.Unknown):
        return buf

    transpose, flip_x, flip_y = orientation.to_flips()
    data = buf.data  # planar [3, H, W]
    if flip_x:
        data = data[:, :, ::-1]
    if flip_y:
        data = data[:, ::-1, :]
    if transpose:
        data = data.transpose(0, 2, 1)
        return OpBuffer(buf.height, buf.width, 3, buf.monochrome, data)
    return OpBuffer(buf.width, buf.height, 3, buf.monochrome, data)


class OpTransform(ImageOp):
    NAME = "transform"

    def __init__(self, img: ImageSource):
        if img.is_raw:
            # EXIF orientation -> rotation + flips (transform.rs:24-41).
            o = img.raw.orientation
            table = {
                Orientation.Normal: (Rotation.Normal, False, False),
                Orientation.Unknown: (Rotation.Normal, False, False),
                Orientation.VerticalFlip: (Rotation.Normal, False, True),
                Orientation.HorizontalFlip: (Rotation.Normal, True, False),
                Orientation.Rotate180: (Rotation.Rotate180, False, False),
                Orientation.Transpose: (Rotation.Rotate90, False, True),
                Orientation.Rotate90: (Rotation.Rotate90, False, False),
                Orientation.Rotate270: (Rotation.Rotate270, False, False),
                Orientation.Transverse: (Rotation.Rotate270, True, False),
            }
            self.rotation, self.fliph, self.flipv = table[o]
        else:
            self.rotation, self.fliph, self.flipv = Rotation.Normal, False, False

    def serialize_binary(self) -> bytes:
        from ..hasher import pack_enum, pack_bool

        return (pack_enum(_ROT_INDEX[self.rotation])
                + pack_bool(self.fliph) + pack_bool(self.flipv))

    def to_settings_dict(self) -> dict:
        return {"rotation": self.rotation.value,
                "fliph": self.fliph, "flipv": self.flipv}

    def load_settings_dict(self, d: dict) -> None:
        self.rotation = Rotation(d["rotation"])
        self.fliph = bool(d["fliph"])
        self.flipv = bool(d["flipv"])

    def _orientation(self) -> Orientation:
        # Compose base rotation with user flips (transform.rs:57-66).
        f1, f2, f3 = _ROT_TO_ORIENT[self.rotation].to_flips()
        return Orientation.from_flips((f1, f2 != self.fliph, f3 != self.flipv))

    def device_chain(self, globals_, meta):
        w, h, colors, mono = meta
        orientation = self._orientation()
        if orientation in (Orientation.Normal, Orientation.Unknown):
            return (("transform", None), None, (), meta)
        if colors != 3:
            return None
        transpose, flip_x, flip_y = orientation.to_flips()

        def fn(data):
            # Same permutation as rotate_buffer, traced into the suffix.
            if flip_x:
                data = data[:, :, ::-1]
            if flip_y:
                data = data[:, ::-1, :]
            if transpose:
                data = data.transpose(0, 2, 1)
            return data

        out_meta = (h, w, 3, mono) if transpose else (w, h, 3, mono)
        return (("transform", transpose, flip_x, flip_y), fn, (), out_meta)

    def run(self, globals_, buf: OpBuffer) -> OpBuffer:
        orientation = self._orientation()
        if orientation in (Orientation.Normal, Orientation.Unknown):
            return buf
        return rotate_buffer(buf, orientation)

    def transform_forward(self, width, height):
        if self.rotation in (Rotation.Rotate90, Rotation.Rotate270):
            return (height, width)
        return (width, height)

    def transform_reverse(self, width, height):
        return self.transform_forward(width, height)
