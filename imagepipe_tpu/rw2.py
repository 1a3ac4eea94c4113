"""Panasonic RW2: container reader + the classic 12-bit codec.

The reference reaches Panasonic bodies through rawloader at
/root/reference/src/pipeline.rs:264. RW2 files are TIFF containers with
vendor magic 0x55 whose IFD0 carries Panasonic's private tags:

  0x0002/0x0003  SensorWidth/SensorHeight (the full decoded plane)
  0x0004..0x0007 sensor borders top/left/bottom/right (the visible crop)
  0x0009         CFA pattern code 1..4 -> RGGB/GRBG/GBRG/BGGR
  0x000A         BitsPerSample (12 for every classic body)
  0x001C..0x001E black level R/G/B (stored 15 below the effective level:
                 the public RawSpeed/rawloader convention adds 15)
  0x0011/0x0012  red/blue balance x256 (older bodies)
  0x0024..0x0026 WB red/green/blue levels (newer bodies)
  0x002D         RawFormat: >=5 selects the newer 14-bit codecs
                 (refused by name); absent/<=4 is the classic stream
  0x0118         raw data offset

The classic codec (dcraw `panasonic_load_raw` + `pana_bits`, which
rawloader mirrors) is a variable-rate predictive stream read through a
peculiar addressing scheme: the file is split into 0x4000-byte sections,
each stored rotated by 0x2008 bytes (`load_flags`), and within a section
a descending 17-bit cursor reads 16-bit little-endian windows at byte
address `(vbits>>3) ^ 0x3ff0` -- i.e. 16-byte chunks consumed high byte
first, chunks in order. Pixels come in groups of 14 per row (groups
reset the predictor state; the 2-bit shift selector at in-group
positions 2/5/8/11 persists across groups and rows): per pixel an 8-bit
symbol either establishes a channel's 12-bit base value (symbol<<4 plus
4 explicit low bits), repeats the channel's previous value (symbol 0),
or steps it by `symbol << sh` from a rebased predictor.

The decoder prefers the native C++ implementation (native/rw2.cc, via
ctypes) and falls back to pure Python; the encoder exists for tests: it
greedily picks shift selectors and snaps unencodable values so
decode(encode(x)) round-trips pin every mechanism on arbitrary input.
Real-file cross-validation (tests/test_realfiles.py) is the external
check, exactly as for the Nikon/Olympus/Pentax codecs.
"""

from __future__ import annotations

import ctypes
import struct

import numpy as np

from . import native
from .cameras import xyz_to_cam_for
from .raw import CFA, Orientation, RawImage
from .tiff import TiffFile, exif_to_orientation

__all__ = ["read_rw2", "decode_panasonic", "encode_panasonic"]

_SECTION = 0x4000
_LOAD_FLAGS = 0x2008
_SPLIT = _SECTION - _LOAD_FLAGS  # bytes of the section stored first

_CFA_BY_CODE = {1: "RGGB", 2: "GRBG", 3: "GBRG", 4: "BGGR"}

# Shift selector: 2-bit code c -> sh = 4 >> (3 - c) -> {0, 0?}: codes
# 0..3 give shifts 0, 1, 2, 4 (code 0's `4 >> 3` is 0 too; the encoder
# only emits codes 1..3 for shifts 1/2/4 and code 0 for shift 0).
_SH_BY_CODE = (0, 1, 2, 4)
_CODE_BY_SH = {0: 0, 1: 1, 2: 2, 4: 3}


def _derotate(payload: bytes) -> bytes:
    """Undo the per-section 0x2008-byte rotation: each 0x4000 file
    section stores its logical tail first (dcraw reads `buf+load_flags`
    then `buf`)."""
    out = bytearray()
    for s in range(0, len(payload), _SECTION):
        sec = payload[s:s + _SECTION]
        if len(sec) < _SECTION:
            sec = sec + b"\0" * (_SECTION - len(sec))
        out += sec[_SPLIT:] + sec[:_SPLIT]
    return bytes(out)


class _PanaBits:
    """dcraw's pana_bits over the de-rotated logical stream: a 17-bit
    descending cursor; byte address `(vbits>>3) ^ 0x3ff0` within the
    current section."""

    def __init__(self, logical: bytes):
        self.data = logical
        self.off = 0
        self.vbits = 0
        self.buf = b""

    def __call__(self, n: int) -> int:
        if self.vbits == 0:
            if self.off >= len(self.data):
                raise ValueError("RW2: bitstream exhausted")
            sec = self.data[self.off:self.off + _SECTION]
            # dcraw's 2-byte window can touch buf[0x4000]; pad one zero.
            self.buf = sec + b"\0" * (_SECTION + 1 - len(sec))
            self.off += _SECTION
        elif (self.vbits & 127) and (self.vbits & 127) < n:
            # dcraw's descending-cursor addressing reads each field from
            # a 2-byte window inside one 16-byte chunk; a field crossing
            # a 128-bit chunk boundary would silently pull bits from the
            # wrong chunk. Well-formed streams never do this (full
            # 14-pixel groups cost exactly 128 bits and raw widths are
            # multiples of 14), so fail loud instead.
            raise ValueError("RW2: field straddles a 128-bit chunk "
                             "boundary (malformed stream)")
        self.vbits = (self.vbits - n) & 0x1FFFF
        byte = (self.vbits >> 3) ^ 0x3FF0
        word = self.buf[byte] | (self.buf[byte + 1] << 8)
        return (word >> (self.vbits & 7)) & ((1 << n) - 1)


def _decode_python(logical: bytes, width: int, height: int) -> np.ndarray:
    bits = _PanaBits(logical)
    out = np.zeros((height, width), np.uint16)
    sh = 0
    for row in range(height):
        pred = [0, 0]
        nonz = [0, 0]
        for col in range(width):
            i = col % 14
            ch = i & 1
            if i == 0:
                pred = [0, 0]
                nonz = [0, 0]
            if i % 3 == 2:
                sh = 4 >> (3 - bits(2))
            if nonz[ch]:
                j = bits(8)
                if j:
                    p = pred[ch] - (0x80 << sh)
                    if p < 0 or sh == 4:
                        p = pred[ch] & ~(-1 << sh)
                    pred[ch] = p + (j << sh)
            else:
                nonz[ch] = bits(8)
                if nonz[ch] or i > 11:
                    pred[ch] = (nonz[ch] << 4) | bits(4)
            out[row, col] = pred[ch] & 0xFFFF
    return out


def _decode_native(logical: bytes, width: int, height: int) -> np.ndarray:
    lib = native._lib
    fn = lib.rw2_decode
    fn.restype = ctypes.c_int
    fn.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                   ctypes.c_int, ctypes.c_int,
                   ctypes.POINTER(ctypes.c_uint16)]
    out = np.empty((height, width), np.uint16)
    rc = fn(logical, len(logical), width, height,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)))
    if rc != 0:
        raise ValueError("RW2: bitstream exhausted")
    return out


def decode_panasonic(payload: bytes, width: int, height: int) -> np.ndarray:
    """Decode a classic Panasonic-compressed payload (file-order bytes,
    rotation included) to a (height, width) u16 sensor plane."""
    logical = _derotate(bytes(payload))
    if native.have_native() and hasattr(native._lib, "rw2_decode"):
        return _decode_native(logical, width, height)
    return _decode_python(logical, width, height)


class _PanaBitsWriter:
    """Mirror of _PanaBits for the test encoder: places bits at the
    exact addresses the reader consumes, emits rotated file sections."""

    def __init__(self):
        self.sections: list[bytearray] = []
        self.buf: bytearray | None = None
        self.vbits = 0

    def put(self, n: int, v: int) -> None:
        if self.vbits == 0:
            self.buf = bytearray(_SECTION + 1)
            self.sections.append(self.buf)
            self.vbits = 0x20000
        if (self.vbits & 127) and (self.vbits & 127) < n:
            raise ValueError("RW2 encoder: field would straddle a "
                             "128-bit chunk boundary (group invariant "
                             "broken)")
        self.vbits = (self.vbits - n) & 0x1FFFF
        byte = (self.vbits >> 3) ^ 0x3FF0
        word = (v & ((1 << n) - 1)) << (self.vbits & 7)
        self.buf[byte] |= word & 0xFF
        self.buf[byte + 1] |= (word >> 8) & 0xFF

    def file_bytes(self) -> bytes:
        out = bytearray()
        for sec in self.sections:
            # Inverse of _derotate: the file stores the logical tail
            # (from _LOAD_FLAGS) first, then the logical head.
            logical = sec[:_SECTION]
            out += logical[_LOAD_FLAGS:] + logical[:_LOAD_FLAGS]
        return bytes(out)


def encode_panasonic(img: np.ndarray,
                     snap: bool = False) -> bytes | tuple[bytes, np.ndarray]:
    """Encode a u16 sensor plane (< 4096) as a classic Panasonic stream.

    The scheme cannot represent every pixel sequence (a channel's first
    value in a group must be 0 or >= 16 except at positions 12/13, and
    steps are `j << sh` from a rebased predictor). With snap=False,
    unencodable values raise; with snap=True they are snapped to the
    nearest encodable value and the (stream, snapped_image) pair is
    returned -- decode(stream) == snapped_image exactly.
    """
    img = np.asarray(img)
    if img.ndim != 2:
        raise ValueError("expected a 2-D sensor plane")
    if img.max(initial=0) > 4095:
        raise ValueError("classic RW2 stream is 12-bit (values < 4096)")
    height, width = img.shape
    if width % 14:
        # Rows must stay 128-bit chunk-aligned (each full group costs
        # exactly 128 bits): a partial tail group would make later
        # fields straddle the 16-byte chunks dcraw's descending-cursor
        # addressing assumes, corrupting the stream. Real Panasonic v4
        # raw widths are multiples of 14 for exactly this reason.
        raise ValueError("classic RW2 width must be a multiple of 14")
    w = _PanaBitsWriter()
    snapped = img.astype(np.uint16).copy()
    sh = 0

    def reachable(value, pred_ch, nonz_ch, i, cur_sh):
        """(encodable?, nearest encodable value, symbol) for one pixel
        under current channel state and shift."""
        if nonz_ch:
            if value == pred_ch:
                return True, value, 0
            p = pred_ch - (0x80 << cur_sh)
            if p < 0 or cur_sh == 4:
                p = pred_ch & ~(-1 << cur_sh)
            j = max(1, min(255, (value - p) >> cur_sh))
            cand = [p + (j << cur_sh)]
            if j < 255:
                cand.append(p + ((j + 1) << cur_sh))
            cand.append(pred_ch)  # symbol 0 keeps the old value
            best = min(cand, key=lambda c: abs(c - value))
            if best == pred_ch:
                return best == value, best, 0
            jj = (best - p) >> cur_sh
            return best == value, best, jj
        # First symbol of this channel in the group: always establish a
        # 12-bit value >= 16 so nonz becomes nonzero and every full
        # group costs exactly 128 bits (the section-alignment invariant
        # real streams keep; sensor data sits above black ~143 anyway).
        if i > 11:
            best = min(max(int(value), 0), 4095)
            return best == value, best, best >> 4
        if value < 16:
            return False, 16, 1
        return True, int(value), int(value) >> 4

    for row in range(height):
        pred = [0, 0]
        nonz = [0, 0]
        col = 0
        while col < width:
            i = col % 14
            ch = i & 1
            if i == 0:
                pred = [0, 0]
                nonz = [0, 0]
            if i % 3 == 2:
                # Choose the shift for this selector's span (this pixel
                # and the next two) minimizing snap error.
                span = [(c, c % 14 & 1) for c in range(col, min(col + 3, width))
                        if c % 14 != 0 or c == col]
                best_sh, best_err = sh, None
                for cand_sh in (0, 1, 2, 4):
                    err = 0
                    p2, n2 = list(pred), list(nonz)
                    for c2, ch2 in span:
                        v2 = int(snapped[row, c2])
                        ok, near, sym = reachable(v2, p2[ch2], n2[ch2],
                                                  c2 % 14, cand_sh)
                        err += abs(near - v2)
                        if n2[ch2]:
                            if sym:
                                p2[ch2] = near
                        else:
                            n2[ch2] = sym
                            p2[ch2] = near
                    if best_err is None or err < best_err:
                        best_err, best_sh = err, cand_sh
                sh = best_sh
                w.put(2, _CODE_BY_SH[sh])
            v = int(snapped[row, col])
            ok, near, sym = reachable(v, pred[ch], nonz[ch], i, sh)
            if not ok:
                if not snap:
                    raise ValueError(
                        f"value {v} not encodable at ({row},{col}) "
                        "(use snap=True)")
                snapped[row, col] = near
                v = near
            if nonz[ch]:
                w.put(8, sym)
                if sym:
                    pred[ch] = v
            else:
                w.put(8, v >> 4)
                w.put(4, v & 15)
                pred[ch] = v
                nonz[ch] = v >> 4
            col += 1
    blob = w.file_bytes()
    return (blob, snapped) if snap else blob


def read_rw2(path: str) -> RawImage:
    """Panasonic RW2 (TIFF container, vendor magic 0x55): classic
    12-bit compressed stream or plain 16-bit LE payloads. RawFormat
    (tag 0x2D) >= 5 -- the newer 14-bit codecs -- refuses with the
    version named."""
    with open(path, "rb") as f:
        buf = f.read()
    tf = TiffFile(buf, magics=(42, 85))
    ifd = tf.ifds[0]
    make = (tf.find1(271) or "").strip()
    model = (tf.find1(272) or "").strip()
    if 0x0118 not in ifd or 0x0002 not in ifd:
        raise ValueError("RW2: missing Panasonic raw tags")
    width = int(ifd.get1(0x0002) or 0)
    height = int(ifd.get1(0x0003) or 0)
    if not width or not height or width * height > 500_000_000:
        raise ValueError("RW2: missing/implausible sensor dimensions")
    bits = int(ifd.get1(0x000A, 12) or 12)
    if not 8 <= bits <= 16:
        raise ValueError(f"RW2: implausible BitsPerSample {bits}")
    rawformat = ifd.get1(0x002D)
    off = int(ifd.get1(0x0118) or 0)
    if not 0 <= off < len(buf):
        raise ValueError("RW2: raw data offset out of range")
    avail = len(buf) - off
    # Uncompressed discrimination is EXACT (rawloader's convention): the
    # plain-16-bit plane matches width*height*2 bytes precisely, by the
    # byte-count tag when present or by the data-to-EOF extent. A mere
    # `>=` would let trailing data after a compressed payload silently
    # reinterpret the bitstream as pixels.
    counts = ifd.get(0x0117) or []
    extent = sum(int(c) for c in counts) if counts else avail
    if extent == width * height * 2 and avail >= extent:
        data = np.frombuffer(
            buf, "<u2", count=width * height, offset=off
        ).reshape(height, width).copy()
    elif rawformat is not None and int(rawformat) >= 5:
        raise ValueError(
            f"RW2: RawFormat {int(rawformat)} (the newer 14-bit codec) "
            "is not supported; convert to DNG")
    else:
        data = decode_panasonic(buf[off:], width, height)

    code = int(ifd.get1(0x0009, 0) or 0)
    cfa_name = _CFA_BY_CODE.get(code)
    if cfa_name is None:
        raise ValueError(f"RW2: unrecognized CFA pattern code {code}")

    # Visible-area crop from the sensor borders; RawImage.crops order is
    # [top, right, bottom, left].
    top = int(ifd.get1(0x0004, 0) or 0)
    left = int(ifd.get1(0x0005, 0) or 0)
    bottom = int(ifd.get1(0x0006, height) or height)
    right = int(ifd.get1(0x0007, width) or width)
    if not (0 <= top < bottom <= height and 0 <= left < right <= width):
        top, left, bottom, right = 0, 0, height, width
    crops = (top, width - right, height - bottom, left)

    # Black level tags store the effective level minus 15 (the public
    # RawSpeed/rawloader convention); stored R G B order.
    blk = [ifd.get1(t) for t in (0x001C, 0x001D, 0x001E)]
    if all(b is not None for b in blk):
        blacks = (int(blk[0]) + 15, int(blk[1]) + 15,
                  int(blk[2]) + 15, int(blk[1]) + 15)
    else:
        blacks = (0, 0, 0, 0)
    white = (1 << bits) - 1

    wb = (float("nan"),) * 4
    wbl = [ifd.get1(t) for t in (0x0024, 0x0025, 0x0026)]
    if all(v is not None for v in wbl) and float(wbl[1]) > 0:
        g = float(wbl[1])
        wb = (float(wbl[0]) / g, 1.0, float(wbl[2]) / g, float("nan"))
    else:
        red = ifd.get1(0x0011)
        blue = ifd.get1(0x0012)
        if red and blue and float(red) > 0 and float(blue) > 0:
            wb = (float(red) / 256.0, 1.0, float(blue) / 256.0,
                  float("nan"))

    orient = Orientation.Normal
    o = tf.find1(274)
    if o:
        got = exif_to_orientation(int(o))
        if got is not None:
            orient = got
    return RawImage(
        width=width, height=height, cpp=1, crops=crops,
        blacklevels=blacks, whitelevels=(white,) * 4,
        wb_coeffs=wb, xyz_to_cam=xyz_to_cam_for(make, model),
        orientation=orient, cfa=CFA(cfa_name), data=data,
        make=make, model=model)
