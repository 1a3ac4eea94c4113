"""Minimal DNG (TIFF-EP) camera RAW reader/writer: uncompressed CFA images.

The reference leans on the rawloader crate for hundreds of camera formats
(SURVEY.md section 2.4). This framework's native-format strategy: DNG is the
archival/interchange format every camera RAW converts to losslessly, so a
solid uncompressed-DNG path plus the pluggable decoder registry
(decode.register_raw_decoder) covers real camera files; 12/14-bit packed
bitstreams unpack through the native host library (native/host_pack.cc).

Reader surface: strip-based, Compression=1, BitsPerSample 8/12/14/16,
CFA (PhotometricInterpretation 32803) or linear gray; pulls the DNG
calibration tags the pipeline needs (ColorMatrix1 == xyz_to_cam,
AsShotNeutral -> wb_coeffs, BlackLevel/WhiteLevel, ActiveArea/DefaultCrop,
Orientation, CFAPattern).
"""

from __future__ import annotations

import struct

import numpy as np

from .raw import CFA, Orientation, RawImage
from . import native

__all__ = ["read_dng", "write_dng"]

# TIFF tag ids.
T_NEWSUBFILETYPE = 254
T_WIDTH = 256
T_LENGTH = 257
T_BITS = 258
T_COMPRESSION = 259
T_PHOTOMETRIC = 262
T_STRIP_OFFSETS = 273
T_ORIENTATION = 274
T_SAMPLES_PER_PIXEL = 277
T_ROWS_PER_STRIP = 278
T_STRIP_BYTECOUNTS = 279
T_SUBIFDS = 330
T_TILE_WIDTH = 322
T_TILE_LENGTH = 323
T_TILE_OFFSETS = 324
T_TILE_BYTECOUNTS = 325
T_CFA_REPEAT = 33421
T_CFA_PATTERN = 33422
T_DNG_VERSION = 50706
T_COLOR_MATRIX_1 = 50721
T_AS_SHOT_NEUTRAL = 50728
T_BLACK_LEVEL = 50714
T_WHITE_LEVEL = 50717
T_DEFAULT_CROP_ORIGIN = 50719
T_DEFAULT_CROP_SIZE = 50720
T_ACTIVE_AREA = 50829

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}

_EXIF_TO_ORIENTATION = {
    1: Orientation.Normal, 2: Orientation.HorizontalFlip,
    3: Orientation.Rotate180, 4: Orientation.VerticalFlip,
    5: Orientation.Transpose, 6: Orientation.Rotate90,
    7: Orientation.Transverse, 8: Orientation.Rotate270,
}
_ORIENTATION_TO_EXIF = {v: k for k, v in _EXIF_TO_ORIENTATION.items()}


def _read_ifd(buf, offset, endian):
    n = struct.unpack_from(endian + "H", buf, offset)[0]
    entries = {}
    for i in range(n):
        tag, typ, count = struct.unpack_from(endian + "HHI", buf, offset + 2 + i * 12)
        val_off = offset + 2 + i * 12 + 8
        size = _TYPE_SIZES.get(typ, 1) * count
        if size > 4:
            (data_off,) = struct.unpack_from(endian + "I", buf, val_off)
        else:
            data_off = val_off
        entries[tag] = (typ, count, data_off)
    (next_off,) = struct.unpack_from(endian + "I", buf, offset + 2 + n * 12)
    return entries, next_off


def _values(buf, endian, entry):
    typ, count, off = entry
    if typ in (3,):
        return list(struct.unpack_from(endian + f"{count}H", buf, off))
    if typ in (4,):
        return list(struct.unpack_from(endian + f"{count}I", buf, off))
    if typ in (1, 7):
        return list(struct.unpack_from(f"{count}B", buf, off))
    if typ == 5:  # RATIONAL
        raw = struct.unpack_from(endian + f"{2 * count}I", buf, off)
        return [raw[2 * i] / raw[2 * i + 1] if raw[2 * i + 1] else 0.0 for i in range(count)]
    if typ == 10:  # SRATIONAL
        raw = struct.unpack_from(endian + f"{2 * count}i", buf, off)
        return [raw[2 * i] / raw[2 * i + 1] if raw[2 * i + 1] else 0.0 for i in range(count)]
    if typ == 11:
        return list(struct.unpack_from(endian + f"{count}f", buf, off))
    if typ == 12:
        return list(struct.unpack_from(endian + f"{count}d", buf, off))
    if typ == 2:
        return [buf[off:off + count].split(b"\0")[0].decode("ascii", "replace")]
    raise ValueError(f"unhandled TIFF type {typ}")


def _collect_ifds(buf, endian, first):
    """All IFDs: main chain plus SubIFD trees."""
    out = []
    stack = [first]
    seen = set()
    while stack:
        off = stack.pop()
        if off in (0,) or off in seen or off >= len(buf):
            continue
        seen.add(off)
        entries, nxt = _read_ifd(buf, off, endian)
        out.append(entries)
        if nxt:
            stack.append(nxt)
        if T_SUBIFDS in entries:
            stack.extend(_values(buf, endian, entries[T_SUBIFDS]))
    return out


def read_dng(path: str) -> RawImage:
    with open(path, "rb") as f:
        buf = f.read()
    if buf[:2] == b"II":
        endian = "<"
    elif buf[:2] == b"MM":
        endian = ">"
    else:
        raise ValueError("not a TIFF")
    magic, first = struct.unpack_from(endian + "HI", buf, 2)
    if magic != 42:
        raise ValueError("not a TIFF")

    ifds = _collect_ifds(buf, endian, first)

    def get(e, tag, default=None):
        if tag not in e:
            return default
        return _values(buf, endian, e[tag])

    # Pick the RAW IFD: CFA photometric preferred, else largest main image.
    raw_ifd = None
    for e in ifds:
        pm = get(e, T_PHOTOMETRIC, [None])[0]
        if pm == 32803:
            raw_ifd = e
            break
    if raw_ifd is None:
        candidates = [e for e in ifds
                      if T_WIDTH in e and (T_STRIP_OFFSETS in e or T_TILE_OFFSETS in e)]
        if not candidates:
            raise ValueError("no raster IFD found")
        raw_ifd = max(candidates, key=lambda e: get(e, T_WIDTH, [0])[0] * get(e, T_LENGTH, [0])[0])

    e = raw_ifd
    width = get(e, T_WIDTH)[0]
    height = get(e, T_LENGTH)[0]
    bits = get(e, T_BITS, [16])[0]
    compression = get(e, T_COMPRESSION, [1])[0]
    if compression not in (1, 7):
        raise ValueError(
            f"unsupported DNG compression {compression} (uncompressed=1 and lossless JPEG=7)")
    spp = get(e, T_SAMPLES_PER_PIXEL, [1])[0]
    if spp != 1:
        raise ValueError("only 1 sample/pixel CFA or gray DNGs supported")

    def decode_uncompressed(chunk, npix):
        if bits == 16:
            if endian == "<":
                return np.frombuffer(chunk[: npix * 2].tobytes(), "<u2").astype(np.uint16)
            return native.swap_16be(chunk, npix)
        elif bits == 12:
            return native.unpack_12be(chunk, npix)
        elif bits == 14:
            return native.unpack_14be(chunk, npix)
        elif bits == 8:
            return chunk[:npix].astype(np.uint16)
        raise ValueError(f"unsupported BitsPerSample {bits}")

    if T_TILE_OFFSETS in e:
        # Tiled layout (the common shape for Compression=7 DNGs).
        tw = get(e, T_TILE_WIDTH)[0]
        tl = get(e, T_TILE_LENGTH)[0]
        offsets = get(e, T_TILE_OFFSETS)
        counts = get(e, T_TILE_BYTECOUNTS)
        tiles_x = -(-width // tw)
        tiles_y = -(-height // tl)
        data = np.zeros((tiles_y * tl, tiles_x * tw), np.uint16)
        for ti, (off, cnt) in enumerate(zip(offsets, counts)):
            chunk = np.frombuffer(buf, np.uint8, cnt, off)
            if compression == 7:
                from .lj92 import decode as lj92_decode

                tile = lj92_decode(chunk.tobytes())
                tile = tile.reshape(tl, tw)
            else:
                tile = decode_uncompressed(chunk, tl * tw).reshape(tl, tw)
            ty, tx = divmod(ti, tiles_x)
            data[ty * tl:(ty + 1) * tl, tx * tw:(tx + 1) * tw] = tile
        data = data[:height, :width]
    else:
        offsets = get(e, T_STRIP_OFFSETS)
        counts = get(e, T_STRIP_BYTECOUNTS)
        rows_per_strip = get(e, T_ROWS_PER_STRIP, [height])[0]
        rows = []
        for si, (off, cnt) in enumerate(zip(offsets, counts)):
            nrows = min(rows_per_strip, height - si * rows_per_strip)
            npix = nrows * width
            chunk = np.frombuffer(buf, np.uint8, cnt, off)
            if compression == 7:
                from .lj92 import decode as lj92_decode

                vals = lj92_decode(chunk.tobytes()).reshape(nrows, width)
            else:
                vals = decode_uncompressed(chunk, npix).reshape(nrows, width)
            rows.append(vals)
        data = np.concatenate(rows, axis=0)
    assert data.shape == (height, width)

    # CFA pattern.
    pm = get(e, T_PHOTOMETRIC, [1])[0]
    if pm == 32803:
        ph, pw = get(e, T_CFA_REPEAT, [2, 2])
        pat = get(e, T_CFA_PATTERN, [0, 1, 1, 2])
        letters = "RGBE"
        # Honor CFARepeatPatternDim: e.g. a 16-entry pattern may be 2x8 or
        # 4x4, not the 8x2 the length-based fallback would assume.
        cfa = CFA("".join(letters[v] for v in pat[: ph * pw]),
                  height=int(ph), width=int(pw))
    else:
        cfa = CFA("")

    # Levels.
    white = int(get(e, T_WHITE_LEVEL, [(1 << bits) - 1])[0])
    blacks = get(e, T_BLACK_LEVEL, [0])
    if len(blacks) == 1:
        blacks = blacks * 4
    blacks = [int(round(b)) for b in blacks[:4]]

    # Crops: ActiveArea (top,left,bottom,right) then DefaultCrop within it.
    aa = get(e, T_ACTIVE_AREA, [0, 0, height, width])
    crop_origin = get(e, T_DEFAULT_CROP_ORIGIN, [0, 0])
    crop_size = get(e, T_DEFAULT_CROP_SIZE, [aa[3] - aa[1], aa[2] - aa[0]])
    top = aa[0] + int(crop_origin[1])
    left = aa[1] + int(crop_origin[0])
    cw, ch = int(crop_size[0]), int(crop_size[1])
    crops = (top, max(0, width - left - cw), max(0, height - top - ch), left)

    # Calibration: search all IFDs (usually IFD0) for DNG color tags.
    cm = neutral = orient_v = None
    for ee in ifds:
        if cm is None and T_COLOR_MATRIX_1 in ee:
            cm = get(ee, T_COLOR_MATRIX_1)
        if neutral is None and T_AS_SHOT_NEUTRAL in ee:
            neutral = get(ee, T_AS_SHOT_NEUTRAL)
        if orient_v is None and T_ORIENTATION in ee:
            orient_v = get(ee, T_ORIENTATION)[0]
    if cm is not None and len(cm) >= 9:
        xyz_to_cam = np.array(cm[:9], np.float32).reshape(3, 3)
        xyz_to_cam = np.concatenate([xyz_to_cam, np.zeros((1, 3), np.float32)], axis=0)
    else:
        xyz_to_cam = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [0, 0, 0]], np.float32)
    if neutral is not None and len(neutral) >= 3 and all(v > 0 for v in neutral[:3]):
        wb = (1.0 / neutral[0], 1.0 / neutral[1], 1.0 / neutral[2], float("nan"))
    else:
        wb = (float("nan"),) * 4
    orientation = _EXIF_TO_ORIENTATION.get(orient_v or 1, Orientation.Normal)

    return RawImage(
        width=width, height=height, cpp=1, crops=crops,
        blacklevels=tuple(blacks), whitelevels=(white,) * 4,
        wb_coeffs=wb, xyz_to_cam=xyz_to_cam, orientation=orientation,
        cfa=cfa, data=data)


# ---------------------------------------------------------------------------
# Writer (uncompressed 16-bit CFA DNG) -- for interchange and tests.
# ---------------------------------------------------------------------------


def write_dng(path: str, raw: RawImage, compression: int = 1) -> None:
    """compression: 1 = uncompressed 16-bit, 7 = lossless JPEG (LJ92)."""
    assert raw.cpp == 1, "writer supports single-plane CFA/gray"
    assert compression in (1, 7)
    data = np.ascontiguousarray(np.asarray(raw.data, np.uint16).reshape(raw.height, raw.width))
    is_cfa = raw.cfa.is_valid()
    if compression == 7:
        from .lj92 import encode as lj92_encode

        # Two interleaved components for even-width CFA rows (like real DNG
        # encoders): each component then predicts from its own color plane.
        ncomp = 2 if (is_cfa and raw.width % 2 == 0) else 1
        payload = lj92_encode(data, ncomp=ncomp, precision=16)
    else:
        payload = data.astype("<u2").tobytes()

    entries = []  # (tag, type, count, values)

    def add(tag, typ, vals):
        entries.append((tag, typ, vals))

    add(T_NEWSUBFILETYPE, 4, [0])
    add(T_WIDTH, 4, [raw.width])
    add(T_LENGTH, 4, [raw.height])
    add(T_BITS, 3, [16])
    add(T_COMPRESSION, 3, [compression])
    add(T_PHOTOMETRIC, 3, [32803 if is_cfa else 34892])
    add(T_ORIENTATION, 3, [_ORIENTATION_TO_EXIF.get(raw.orientation, 1)])
    add(T_SAMPLES_PER_PIXEL, 3, [1])
    add(T_ROWS_PER_STRIP, 4, [raw.height])
    add(T_STRIP_BYTECOUNTS, 4, [len(payload)])
    if is_cfa:
        inv = {"R": 0, "G": 1, "B": 2, "E": 3}
        add(T_CFA_REPEAT, 3, [raw.cfa.height, raw.cfa.width])
        add(T_CFA_PATTERN, 1, [inv[c] for c in raw.cfa.name])
    add(T_DNG_VERSION, 1, [1, 4, 0, 0])
    add(T_BLACK_LEVEL, 3, [int(b) for b in raw.blacklevels])
    add(T_WHITE_LEVEL, 3, [int(raw.whitelevels[0])])
    top, right, bottom, left = raw.crops
    add(T_DEFAULT_CROP_ORIGIN, 4, [left, top])
    add(T_DEFAULT_CROP_SIZE, 4, [raw.width - left - right, raw.height - top - bottom])
    # ColorMatrix1 as SRATIONALs with denominator 10000.
    cmvals = []
    for v in np.asarray(raw.xyz_to_cam[:3], np.float64).ravel():
        cmvals.append((int(round(v * 10000)), 10000))
    add(T_COLOR_MATRIX_1, 10, cmvals)
    wb = raw.wb_coeffs
    if all(np.isfinite(wb[i]) and wb[i] > 0 for i in range(3)):
        neut = [(int(round(1.0 / wb[i] * 10000)), 10000) for i in range(3)]
        add(T_AS_SHOT_NEUTRAL, 5, neut)

    # Layout: header(8) + IFD + ext data + strip data.
    entries.append((T_STRIP_OFFSETS, 4, [0]))  # patched below
    entries.sort(key=lambda t: t[0])

    def pack_vals(typ, vals):
        if typ == 3:
            return struct.pack(f"<{len(vals)}H", *vals)
        if typ == 4:
            return struct.pack(f"<{len(vals)}I", *vals)
        if typ == 1:
            return struct.pack(f"{len(vals)}B", *vals)
        if typ == 5:
            flat = [x for pair in vals for x in pair]
            return struct.pack(f"<{len(flat)}I", *flat)
        if typ == 10:
            flat = [x for pair in vals for x in pair]
            return struct.pack(f"<{len(flat)}i", *flat)
        raise ValueError(typ)

    n = len(entries)
    ifd_off = 8
    ext_off = ifd_off + 2 + n * 12 + 4
    ext = bytearray()
    packed = []
    for tag, typ, vals in entries:
        count = len(vals)
        raw_bytes = pack_vals(typ, vals)
        if len(raw_bytes) <= 4:
            packed.append((tag, typ, count, raw_bytes.ljust(4, b"\0"), None))
        else:
            packed.append((tag, typ, count, None, ext_off + len(ext)))
            ext += raw_bytes
    strip_off = ext_off + len(ext)

    out = bytearray()
    out += struct.pack("<2sHI", b"II", 42, ifd_off)
    out += struct.pack("<H", n)
    for tag, typ, count, inline, off in packed:
        if tag == T_STRIP_OFFSETS:
            inline, off = struct.pack("<I", strip_off), None
        if inline is not None:
            out += struct.pack("<HHI", tag, typ, count) + inline
        else:
            out += struct.pack("<HHII", tag, typ, count, off)
    out += struct.pack("<I", 0)  # next IFD
    out += ext
    out += payload
    with open(path, "wb") as f:
        f.write(out)
