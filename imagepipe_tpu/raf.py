"""Fujifilm RAF container reader (classic CFA-record flavor).

Covers the rawloader surface the reference reaches through
/root/reference/src/pipeline.rs:264 for Fuji bodies: the proprietary RAF
wrapper (it is NOT a TIFF) around an uncompressed 16-bit X-Trans sensor
dump. Layout:

  0x00  16 bytes  magic "FUJIFILMCCD-RAW "
  0x10   4 bytes  format version (ascii)
  0x14   8 bytes  camera number id
  0x1c  32 bytes  camera model (nul padded)
  0x3c   4 bytes  directory version
  0x54  u32be x6  jpeg offset/len, meta offset/len, cfa offset/len

The meta block is a big-endian record list (u32 count, then
{u16 tag, u16 size, bytes}):

  0x0100  sensor dims (u16 height, u16 width)
  0x0131  X-Trans 6x6 pattern, 36 bytes of 0/1/2 color codes stored in
          reverse raster order (dcraw's parse_fuji semantics)
  0x2ff0  white balance, four u16: G, R, G2, B (dcraw's c^1 swizzle)

The CFA payload is big-endian u16 raster data. Newer bodies that embed a
TIFF inside the CFA section, compressed RAFs, and Bayer/SuperCCD bodies
raise a clear ValueError naming the gap rather than mis-decoding.
"""

from __future__ import annotations

import struct

import numpy as np

from .cameras import xyz_to_cam_for
from .raw import CFA, Orientation, RawImage

__all__ = ["read_raf", "RAF_MAGIC"]

RAF_MAGIC = b"FUJIFILMCCD-RAW "

_CODE_TO_LETTER = {0: "R", 1: "G", 2: "B", 3: "E"}


def _records(buf: bytes, off: int, length: int) -> dict[int, bytes]:
    end = min(off + length, len(buf))
    if off + 4 > len(buf):
        raise ValueError("RAF: meta block out of bounds")
    (count,) = struct.unpack_from(">I", buf, off)
    if count > 4096:
        raise ValueError("RAF: implausible meta record count")
    recs: dict[int, bytes] = {}
    p = off + 4
    for _ in range(count):
        if p + 4 > end:
            raise ValueError("RAF: truncated meta record")
        tag, size = struct.unpack_from(">HH", buf, p)
        p += 4
        if p + size > end:
            raise ValueError("RAF: meta record payload out of bounds")
        recs[tag] = buf[p:p + size]
        p += size
    return recs


def read_raf(path: str) -> RawImage:
    with open(path, "rb") as f:
        buf = f.read()
    if len(buf) < 0x70 or buf[:16] != RAF_MAGIC:
        raise ValueError("not a RAF container")
    model = buf[0x1C:0x3C].split(b"\0", 1)[0].decode("ascii", "replace").strip()
    (_jpeg_off, _jpeg_len, meta_off, meta_len, cfa_off, cfa_len
     ) = struct.unpack_from(">IIIIII", buf, 0x54)

    recs = _records(buf, meta_off, meta_len)
    dims = recs.get(0x0100)
    if dims is None or len(dims) < 4:
        raise ValueError("RAF: missing sensor dimensions record (0x0100)")
    height, width = struct.unpack_from(">HH", dims, 0)
    if height <= 0 or width <= 0 or height * width > 500_000_000:
        raise ValueError("RAF: implausible sensor dimensions")

    pat = recs.get(0x0131)
    if pat is None or len(pat) != 36:
        raise ValueError(
            "RAF: only X-Trans bodies with a 6x6 pattern record (0x0131) are "
            "supported; Bayer/SuperCCD RAFs are not decoded yet")
    # dcraw parse_fuji reads the 36 bytes in reverse raster order.
    codes = [b & 3 for b in pat[::-1]]
    cfa = CFA("".join(_CODE_TO_LETTER[c] for c in codes))

    wb = (float("nan"),) * 4
    wbrec = recs.get(0x2FF0)
    if wbrec is not None and len(wbrec) >= 8:
        g, r, g2, b = struct.unpack_from(">HHHH", wbrec, 0)
        if g > 0:
            wb = (r / g, 1.0, b / g, float("nan"))

    if cfa_off + 2 > len(buf):
        raise ValueError("RAF: CFA payload out of bounds")
    if buf[cfa_off:cfa_off + 4] in (b"II*\0", b"MM\0*"):
        raise ValueError(
            "RAF: TIFF-wrapped CFA sections (newer bodies) not yet supported")
    need = height * width * 2
    if cfa_len < need or cfa_off + need > len(buf):
        raise ValueError("RAF: CFA payload truncated "
                         f"(need {need} bytes, have {min(cfa_len, len(buf) - cfa_off)})")
    data = np.frombuffer(buf, dtype=">u2", count=height * width,
                         offset=cfa_off).astype(np.uint16).reshape(height, width)

    # Classic RAF carries no black/white level records; like rawloader,
    # levels come from the per-body registry (X-Trans sensors are 14-bit).
    black, white = raf_levels_for(model)
    return RawImage(
        width=width, height=height, cpp=1, crops=(0, 0, 0, 0),
        blacklevels=(black,) * 4, whitelevels=(white,) * 4,
        wb_coeffs=wb, xyz_to_cam=xyz_to_cam_for("FUJIFILM", model),
        orientation=Orientation.Normal, cfa=cfa, data=data,
        make="FUJIFILM", model=model)


# model (uppercased) -> (black, white); 14-bit default otherwise.
_LEVELS: dict[str, tuple[int, int]] = {}


def raf_levels_for(model: str) -> tuple[int, int]:
    return _LEVELS.get((model or "").strip().upper(), (0, 16383))


def register_raf_levels(model: str, black: int, white: int) -> None:
    _LEVELS[model.strip().upper()] = (int(black), int(white))
