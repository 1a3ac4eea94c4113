"""Sigma X3F (Foveon) container + SD9/SD10-era Huffman raw decode.

The reference chain reaches Sigma bodies through rawloader
(/root/reference/src/pipeline.rs:264). An X3F file is Sigma's own
container (magic "FOVb"), documented in Sigma's published "X3F Raw Data
Format Specification" and pinned by two open implementations (dcraw's
foveon_sd_load_raw / Kalpanika x3f_tools):

  * header at offset 0: "FOVb", u32 version (major<<16|minor), 16-byte
    unique id, u32 mark bits, u32 columns, u32 rows, u32 rotation
    (degrees clockwise to display upright: 0/90/180/270);
  * the LAST 4 bytes of the file are the u32 offset of the directory
    section: "SECd", u32 version, u32 count, then count 12-byte entries
    (u32 offset, u32 length, 4-char type "PROP"/"IMAG"/"IMA2"/"CAMF");
  * a property list ("SECp") is a table of UTF-16LE name/value string
    pairs (CAMMANUF/CAMMODEL carry make/model);
  * an image section ("SECi") has u32 type (2 = processed thumbnail,
    3 = raw), u32 format, u32 columns, u32 rows, u32 row_stride (bytes,
    0 when variable), then the payload.

Raw payload, format 6 ("Huffman-coded 10-bit", the SD9/SD10 era —
dcraw foveon_sd_load_raw semantics):

  * i16 LE x1024 DIFF table (the Huffman alphabet: leaf i means
    "add diff[i]");
  * u32 LE x1024 code table: entry i = (length<<27) | code, the code in
    the LOW `length` bits, built MSB-first (dcraw foveon_decoder's
    `(len+1)<<27 | code<<1` recursion; lengths 1..26, 0 = unused leaf);
  * one continuous bitstream, MSB-first within each byte, rows NOT
    byte-realigned: per row the three layer predictors reset to 0, then
    per pixel the three channels each walk the tree once and accumulate
    pred[c] += diff[leaf]; the running pred IS the sample.

Foveon sensels stack all three colors at every site, so the decoded
raw is already full-color: a cpp=3 RawImage on the LinearRaw develop
path (engine rgb mode, no demosaic — like gofloat.rs:101-127 consumes
rawloader's 3-component raws).

PROVENANCE: container and bitstream recalled from the public spec +
dcraw; implemented from memory and pinned mechanically by the canonical
encoder round-trips (a desync shifts the bitstream framing and shows as
gross garbage, not subtle tint). Named uncertain recalls, confirmation
gate = the first real SD9/SD10 file through tests/test_realfiles.py:
  * dcraw conditionally skips a u32 at some row starts on SD9/SD10
    (`if (!bit && atoi(model+2) < 14) get4()`); the trigger is recalled
    too weakly to reproduce, so this decoder omits it — a real pre-SD14
    file that desyncs mid-frame points HERE first;
  * x3f_tools reads a per-row byte-offset table for some Huffman
    sections; dcraw's raw path does not, and this decoder follows dcraw.
Formats other than 6 refuse by name: 5 (X530 u32-packed indices — the
packing recall is unreliable), 8/30 (TRUE/Merrill engine), 35 (Quattro),
37/39 (sd Quattro) — the TRUE-engine plane codec is not reliably
recallable.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

__all__ = ["parse_x3f", "decode_x3f_raw", "encode_x3f",
           "X3FFile", "X3FImageSection"]

_RAW_FORMAT_NAMES = {
    5: "X530 packed-index",
    8: "TRUE engine",
    30: "TRUE/Merrill engine",
    35: "Quattro",
    37: "sd Quattro",
    39: "sd Quattro H",
}


@dataclass
class X3FImageSection:
    type: int          # 2 = processed thumbnail, 3 = raw
    format: int        # 3 plain, 11 huffman thumb, 18 JPEG, 6 huffman raw...
    columns: int
    rows: int
    row_stride: int
    data: bytes        # payload after the 28-byte SECi header


@dataclass
class X3FFile:
    version: int
    columns: int
    rows: int
    rotation: int
    properties: dict = field(default_factory=dict)
    images: list = field(default_factory=list)

    @property
    def make(self) -> str:
        return self.properties.get("CAMMANUF", "SIGMA")

    @property
    def model(self) -> str:
        return self.properties.get("CAMMODEL", "")

    def raw_section(self) -> X3FImageSection:
        for im in self.images:
            if im.type == 3:
                return im
        raise ValueError("X3F: no raw image section in directory")


def _u32(buf: bytes, off: int) -> int:
    if off + 4 > len(buf):
        raise ValueError("X3F: truncated (u32 read past end)")
    return struct.unpack_from("<I", buf, off)[0]


def parse_x3f(buf: bytes) -> X3FFile:
    """Parse the container: header, directory, PROP + image sections."""
    if len(buf) < 44 or buf[:4] != b"FOVb":
        raise ValueError("X3F: bad magic (want FOVb)")
    version = _u32(buf, 4)
    columns = _u32(buf, 28)
    rows = _u32(buf, 32)
    rotation = _u32(buf, 36)
    if rotation not in (0, 90, 180, 270):
        raise ValueError(f"X3F: rotation {rotation} out of spec")
    dir_off = _u32(buf, len(buf) - 4)
    if dir_off + 12 > len(buf) - 4:
        raise ValueError("X3F: directory offset out of range")
    if buf[dir_off:dir_off + 4] != b"SECd":
        raise ValueError("X3F: directory magic missing (want SECd)")
    n_entries = _u32(buf, dir_off + 8)
    if n_entries > 64:
        raise ValueError(f"X3F: implausible directory ({n_entries} entries)")
    out = X3FFile(version=version, columns=columns, rows=rows,
                  rotation=rotation)
    for i in range(n_entries):
        base = dir_off + 12 + 12 * i
        off = _u32(buf, base)
        length = _u32(buf, base + 4)
        etype = buf[base + 8:base + 12]
        if off + length > len(buf):
            raise ValueError(f"X3F: entry {etype!r} out of range")
        body = buf[off:off + length]
        if etype == b"PROP":
            out.properties.update(_parse_prop(body))
        elif etype in (b"IMAG", b"IMA2"):
            out.images.append(_parse_image_section(body))
        # CAMF (calibration blob) is carried but not interpreted.
    return out


def _parse_prop(body: bytes) -> dict:
    if body[:4] != b"SECp":
        raise ValueError("X3F: property section magic missing (want SECp)")
    n = _u32(body, 8)
    char_format = _u32(body, 12)
    if char_format != 0:
        raise ValueError(f"X3F: property character format {char_format} "
                         "unsupported (spec defines 0 = CHAR16)")
    if n > 4096:
        raise ValueError(f"X3F: implausible property count {n}")
    table_end = 24 + 8 * n
    if table_end > len(body):
        raise ValueError("X3F: property entry table truncated")
    data = body[table_end:]

    def read_str(char_off: int) -> str:
        b = data[2 * char_off:]
        end = 0
        while end + 1 < len(b) and b[end:end + 2] != b"\x00\x00":
            end += 2
        return b[:end].decode("utf-16-le", errors="replace")

    props = {}
    for i in range(n):
        name_off = _u32(body, 24 + 8 * i)
        val_off = _u32(body, 24 + 8 * i + 4)
        if 2 * max(name_off, val_off) >= len(data):
            raise ValueError("X3F: property offset out of range")
        props[read_str(name_off)] = read_str(val_off)
    return props


def _parse_image_section(body: bytes) -> X3FImageSection:
    if body[:4] != b"SECi":
        raise ValueError("X3F: image section magic missing (want SECi)")
    if len(body) < 28:
        raise ValueError("X3F: image section header truncated")
    return X3FImageSection(
        type=_u32(body, 8), format=_u32(body, 12),
        columns=_u32(body, 16), rows=_u32(body, 20),
        row_stride=_u32(body, 24), data=body[28:])


# ---------------------------------------------------------------------------
# Huffman raw payload (format 6).
# ---------------------------------------------------------------------------

_TABLE_SIZE = 1024
_MAX_CODE_LEN = 26   # dcraw foveon_decoder stops recursing at len > 26


def decode_x3f_raw(section: X3FImageSection) -> np.ndarray:
    """Raw image section -> [rows, columns, 3] u16. Dispatches to the
    native twin (native/x3f.cc) when built; the Python body is the
    reference implementation the differential fuzz pins it to."""
    if section.type != 3:
        raise ValueError("X3F: not a raw image section")
    if section.format != 6:
        name = _RAW_FORMAT_NAMES.get(section.format, "unknown")
        raise ValueError(
            f"X3F: raw data format {section.format} ({name}) is not "
            "supported; only the SD9/SD10-era Huffman format (6) decodes. "
            "Convert with Sigma Photo Pro or to DNG")
    if not (0 < section.columns <= 65535 and 0 < section.rows <= 65535):
        raise ValueError("X3F: implausible raw geometry "
                         f"{section.columns}x{section.rows}")
    return huffman_payload_decoder()(section.data, section.columns,
                                     section.rows)


def huffman_payload_decoder():
    """The format-6 payload decoder in use: native when the host library
    exports it, else the python form (the single dispatch point — bench
    and tests measure through this so they can't drift from the real
    route)."""
    from . import native

    if native.have_native() and hasattr(native._lib, "x3f_huffman_decode"):
        return _decode_native
    return _decode_python


def _decode_native(data: bytes, width: int, height: int) -> np.ndarray:
    import ctypes

    from . import native

    fn = native._lib.x3f_huffman_decode
    fn.restype = ctypes.c_int
    fn.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_int,
                   ctypes.c_int, ctypes.POINTER(ctypes.c_uint16)]
    out = np.empty((height, width, 3), np.uint16)
    rc = fn(bytes(data), len(data), width, height,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)))
    if rc != 0:
        raise ValueError(f"X3F: corrupt Huffman raw stream (rc={rc})")
    return out


def _build_code_map(codes: np.ndarray) -> dict:
    """u32 code-table entries -> {(length, code): leaf}; rejects
    overlapping/prefix-colliding codes (corrupt table)."""
    cmap: dict = {}
    cover = 0.0  # Kraft sum; > 1 means the code is not a prefix code
    for leaf in range(_TABLE_SIZE):
        e = int(codes[leaf])
        length = e >> 27
        if length == 0:
            continue
        if length > _MAX_CODE_LEN:
            raise ValueError(f"X3F: code length {length} out of range")
        code = e & ((1 << 27) - 1)
        if code >> length:
            raise ValueError("X3F: code wider than its declared length")
        key = (length, code)
        if key in cmap:
            raise ValueError("X3F: duplicate Huffman code")
        cmap[key] = leaf
        cover += 2.0 ** -length
    if not cmap:
        raise ValueError("X3F: empty Huffman code table")
    if cover > 1.0 + 1e-9:
        raise ValueError("X3F: Huffman table is not a prefix code")
    for length, code in cmap:
        # Explicit prefix-freedom (a shorter code shadowing a longer one
        # is rejected, not silently preferred — matches the native twin's
        # trie insertion, so the differential fuzz sees identical fates).
        for plen in range(1, length):
            if (plen, code >> (length - plen)) in cmap:
                raise ValueError("X3F: Huffman code shadows a longer code")
    return cmap


def _decode_python(data: bytes, width: int, height: int) -> np.ndarray:
    head = 2 * _TABLE_SIZE + 4 * _TABLE_SIZE
    if len(data) < head:
        raise ValueError("X3F: raw payload shorter than its tables")
    diffs = np.frombuffer(data, "<i2", _TABLE_SIZE, 0)
    codes = np.frombuffer(data, "<u4", _TABLE_SIZE, 2 * _TABLE_SIZE)
    cmap = _build_code_map(codes)
    bits = data[head:]
    nbits_total = 8 * len(bits)
    out = np.zeros((height, width, 3), np.int32)
    pos = 0
    for row in range(height):
        pred = [0, 0, 0]
        for col in range(width):
            for ch in range(3):
                length = 0
                code = 0
                while True:
                    if pos >= nbits_total:
                        raise ValueError("X3F: Huffman bitstream truncated")
                    code = (code << 1) | ((bits[pos >> 3]
                                           >> (7 - (pos & 7))) & 1)
                    pos += 1
                    length += 1
                    leaf = cmap.get((length, code))
                    if leaf is not None:
                        break
                    if length > _MAX_CODE_LEN:
                        raise ValueError("X3F: bit pattern matches no code")
                pred[ch] += int(diffs[leaf])
                if not 0 <= pred[ch] <= 0xFFFF:
                    raise ValueError("X3F: decoded sample out of u16 range")
                out[row, col, ch] = pred[ch]
    return out.astype(np.uint16)


# ---------------------------------------------------------------------------
# Canonical encoder (tests/fixtures): exact inverse of the decoder.
# ---------------------------------------------------------------------------

def _huffman_lengths(freqs: dict) -> dict:
    """Symbol -> code length (plain Huffman; deterministic tie-breaks)."""
    import heapq

    if len(freqs) == 1:
        return {next(iter(freqs)): 1}
    heap = [(f, (sym,), sym) for sym, f in sorted(freqs.items())]
    heapq.heapify(heap)
    lengths = {s: 0 for s in freqs}
    while len(heap) > 1:
        fa, syms_a, ta = heapq.heappop(heap)
        fb, syms_b, tb = heapq.heappop(heap)
        for s in syms_a + syms_b:
            lengths[s] += 1
        heapq.heappush(heap, (fa + fb, syms_a + syms_b, min(ta, tb)))
    if max(lengths.values()) > _MAX_CODE_LEN:
        raise ValueError("X3F encoder: Huffman depth exceeds 26 "
                         "(pathological diff distribution)")
    return lengths


def _canonical_codes(lengths: dict) -> dict:
    """Symbol -> (length, code), canonical assignment (short codes first,
    symbol order as tie-break)."""
    code = 0
    prev_len = 0
    out = {}
    for sym, length in sorted(lengths.items(), key=lambda kv: (kv[1], kv[0])):
        code <<= (length - prev_len)
        out[sym] = (length, code)
        code += 1
        prev_len = length
    return out


def encode_x3f_raw_payload(img: np.ndarray) -> bytes:
    """[rows, columns, 3] u16 -> format-6 payload
    ([i16 diff table][u32 code table][bitstream])."""
    img = np.asarray(img)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("X3F encoder: want [rows, cols, 3]")
    height, width, _ = img.shape
    cur = img.astype(np.int32)
    prev = np.zeros_like(cur)
    prev[:, 1:, :] = cur[:, :-1, :]          # per-row DPCM, pred resets to 0
    d = cur - prev
    if d.min() < -32768 or d.max() > 32767:
        raise ValueError("X3F encoder: diff outside i16")
    syms, counts = np.unique(d, return_counts=True)
    if len(syms) > _TABLE_SIZE:
        raise ValueError(f"X3F encoder: {len(syms)} distinct diffs "
                         f"(table holds {_TABLE_SIZE})")
    codes = _canonical_codes(_huffman_lengths(
        {int(s): int(c) for s, c in zip(syms, counts)}))
    diff_table = np.zeros(_TABLE_SIZE, np.int16)
    code_table = np.zeros(_TABLE_SIZE, np.uint32)
    leaf_of = {}
    for i, s in enumerate(int(s) for s in syms):
        diff_table[i] = s
        length, code = codes[s]
        code_table[i] = (length << 27) | code
        leaf_of[s] = (length, code)
    acc = 0
    nacc = 0
    stream = bytearray()
    flat = d.reshape(-1)
    for v in flat:
        length, code = leaf_of[int(v)]
        acc = (acc << length) | code
        nacc += length
        while nacc >= 8:
            nacc -= 8
            stream.append((acc >> nacc) & 0xFF)
        acc &= (1 << nacc) - 1
    if nacc:
        stream.append((acc << (8 - nacc)) & 0xFF)
    return diff_table.tobytes() + code_table.tobytes() + bytes(stream)


_ROTATION_TO_ORIENTATION = {0: "Normal", 90: "Rotate90",
                            180: "Rotate180", 270: "Rotate270"}


def read_x3f(path: str):
    """X3F file -> cpp=3 RawImage (LinearRaw develop path). The header
    rotation field maps to the EXIF orientation the output transform
    consumes (transform.rs:25-35); black 0 / white 1023 are the format's
    nominal 10-bit envelope (per-shot CAMF calibration is not
    interpreted); WB NaN falls back to neutralwb() downstream."""
    from .cameras import xyz_to_cam_for
    from .raw import CFA, Orientation, RawImage

    with open(path, "rb") as f:
        buf = f.read()
    x = parse_x3f(buf)
    sec = x.raw_section()
    data = decode_x3f_raw(sec)
    h, w = data.shape[:2]
    return RawImage(
        width=w, height=h, cpp=3, crops=(0, 0, 0, 0),
        blacklevels=(0,) * 4, whitelevels=(1023,) * 4,
        wb_coeffs=(float("nan"),) * 4,
        xyz_to_cam=xyz_to_cam_for(x.make, x.model),
        orientation=Orientation(_ROTATION_TO_ORIENTATION[x.rotation]),
        cfa=CFA(""), data=data.reshape(h, w * 3),
        make=x.make, model=x.model)


def _prop_section(props: dict) -> bytes:
    names = list(props)
    data = bytearray()
    offsets = []
    for name in names:
        noff = len(data) // 2
        data += name.encode("utf-16-le") + b"\x00\x00"
        voff = len(data) // 2
        data += str(props[name]).encode("utf-16-le") + b"\x00\x00"
        offsets.append((noff, voff))
    body = bytearray(b"SECp")
    body += struct.pack("<IIIII", 0x00020000, len(names), 0, 0,
                        len(data) // 2)
    for noff, voff in offsets:
        body += struct.pack("<II", noff, voff)
    body += data
    return bytes(body)


def encode_x3f(img: np.ndarray, make: str = "SIGMA", model: str = "SD10",
               rotation: int = 0, raw_format: int = 6,
               extra_props: dict | None = None) -> bytes:
    """Canonical X3F container around a format-6 raw (tests/fixtures).
    `raw_format` != 6 stamps that format id over an EMPTY payload —
    for exercising the named refusals."""
    img = np.asarray(img)
    height, width = img.shape[:2]
    if raw_format == 6:
        payload = encode_x3f_raw_payload(img)
    else:
        payload = b""
    head = bytearray(b"FOVb")
    head += struct.pack("<I", 0x00020001)          # version 2.1
    head += b"\x00" * 16                           # unique id
    head += struct.pack("<IIII", 0, width, height, rotation)
    head += b"AUTO".ljust(32, b"\x00")             # ver>=2.1 WB label
    props = {"CAMMANUF": make, "CAMMODEL": model}
    props.update(extra_props or {})
    prop = _prop_section(props)
    image = (b"SECi" + struct.pack("<IIIIII", 0x00020001, 3, raw_format,
                                   width, height, 0) + payload)
    out = bytearray(head)
    entries = []
    for body, etype in ((prop, b"PROP"), (image, b"IMA2")):
        entries.append((len(out), len(body), etype))
        out += body
        while len(out) % 4:
            out += b"\x00"
    dir_off = len(out)
    out += b"SECd" + struct.pack("<II", 0x00020001, len(entries))
    for off, length, etype in entries:
        out += struct.pack("<II", off, length) + etype
    out += struct.pack("<I", dir_off)
    return bytes(out)
