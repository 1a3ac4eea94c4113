"""Synthesized vendor RAW containers (NEF/CR2/ARW) for decoder tests.

No real camera files exist in CI, so these builders construct byte-accurate
TIFF-EP containers around synthetic sensor data, exercising the same layout
the vendor readers parse (SubIFD trees, EXIF + maker notes, packed
bitstreams, lossless-JPEG slices, calibration tags).
"""

from __future__ import annotations

import struct

import numpy as np


def pack_12be(vals: np.ndarray) -> bytes:
    v = np.asarray(vals, np.uint32).ravel()
    assert v.size % 2 == 0
    p0, p1 = v[0::2], v[1::2]
    out = np.empty(v.size // 2 * 3, np.uint8)
    out[0::3] = (p0 >> 4) & 0xFF
    out[1::3] = ((p0 & 0xF) << 4) | (p1 >> 8)
    out[2::3] = p1 & 0xFF
    return out.tobytes()


def pack_12le(vals: np.ndarray) -> bytes:
    v = np.asarray(vals, np.uint32).ravel()
    assert v.size % 2 == 0
    p0, p1 = v[0::2], v[1::2]
    out = np.empty(v.size // 2 * 3, np.uint8)
    out[0::3] = p0 & 0xFF
    out[1::3] = ((p1 & 0xF) << 4) | (p0 >> 8)
    out[2::3] = (p1 >> 4) & 0xFF
    return out.tobytes()


def pack_14be(vals: np.ndarray) -> bytes:
    v = np.asarray(vals, np.uint64).ravel()
    assert v.size % 4 == 0
    q = v.reshape(-1, 4)
    acc = (q[:, 0] << 42) | (q[:, 1] << 28) | (q[:, 2] << 14) | q[:, 3]
    out = np.empty((len(q), 7), np.uint8)
    for k in range(7):
        out[:, k] = (acc >> (8 * (6 - k))) & 0xFF
    return out.tobytes()


class TiffBuilder:
    """Append-only TIFF writer with patchable pointers."""

    def __init__(self, endian: str = "<", header_extra: bytes = b""):
        self.endian = endian
        bom = b"II" if endian == "<" else b"MM"
        self.buf = bytearray(struct.pack(endian + "2sHI", bom, 42, 0))
        self.buf += header_extra
        self._first_patch = 4
        self._last_next_patch: int | None = None

    def tell(self) -> int:
        return len(self.buf)

    def align(self, n: int = 2) -> None:
        while len(self.buf) % n:
            self.buf += b"\0"

    def add_blob(self, data: bytes) -> int:
        self.align()
        off = len(self.buf)
        self.buf += data
        return off

    def patch_u32(self, at: int, value: int) -> None:
        struct.pack_into(self.endian + "I", self.buf, at, value)

    @staticmethod
    def _pack_values(endian, typ, vals):
        if isinstance(vals, (bytes, bytearray)):
            return bytes(vals)
        if typ == 1 or typ == 7:
            return struct.pack(f"{len(vals)}B", *vals)
        if typ == 2:
            s = vals if isinstance(vals, str) else vals[0]
            return s.encode("ascii") + b"\0"
        if typ == 3:
            return struct.pack(endian + f"{len(vals)}H", *vals)
        if typ == 8:
            return struct.pack(endian + f"{len(vals)}h", *vals)
        if typ == 4:
            return struct.pack(endian + f"{len(vals)}I", *vals)
        if typ == 9:
            return struct.pack(endian + f"{len(vals)}i", *vals)
        if typ in (5, 10):
            flat = []
            for pair in vals:
                flat.extend(pair)
            fmt = "I" if typ == 5 else "i"
            return struct.pack(endian + f"{2 * len(vals)}{fmt}", *flat)
        raise ValueError(typ)

    @staticmethod
    def _count(typ, vals):
        if isinstance(vals, (bytes, bytearray)):
            return len(vals)
        if typ == 2:
            s = vals if isinstance(vals, str) else vals[0]
            return len(s) + 1
        return len(vals)

    def add_ifd(self, entries: list, chain: bool = True) -> int:
        """entries: [(tag, type, values)]; values may be a list, bytes, or a
        string. Appends the IFD + out-of-line data; links it into the main
        chain unless chain=False. Returns the IFD offset."""
        entries = sorted(entries, key=lambda t: t[0])
        self.align()
        ifd_off = len(self.buf)
        n = len(entries)
        body_len = 2 + n * 12 + 4
        ext_off = ifd_off + body_len
        ext = bytearray()
        self.buf += struct.pack(self.endian + "H", n)
        for tag, typ, vals in entries:
            if isinstance(vals, tuple) and len(vals) == 3 and vals[0] == "ptr":
                # Raw pointer entry: (tag, typ, ("ptr", count, offset)) --
                # points at bytes already in the buffer (maker-note IFDs).
                _, count, ptr = vals
                self.buf += struct.pack(self.endian + "HHII", tag, typ, count, ptr)
                continue
            payload = self._pack_values(self.endian, typ, vals)
            count = self._count(typ, vals)
            if len(payload) <= 4:
                self.buf += struct.pack(self.endian + "HHI", tag, typ, count)
                self.buf += payload.ljust(4, b"\0")
            else:
                self.buf += struct.pack(self.endian + "HHII", tag, typ, count,
                                        ext_off + len(ext))
                ext += payload
                if len(ext) % 2:
                    ext += b"\0"
        next_patch = len(self.buf)
        self.buf += struct.pack(self.endian + "I", 0)
        self.buf += ext
        if chain:
            if self._last_next_patch is None:
                self.patch_u32(self._first_patch, ifd_off)
            else:
                self.patch_u32(self._last_next_patch, ifd_off)
            self._last_next_patch = next_patch
        return ifd_off

    def bytes(self) -> bytes:
        return bytes(self.buf)
