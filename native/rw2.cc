// Panasonic RW2 classic-codec decoder (fast path for
// imagepipe_tpu/rw2.py; sections are de-rotated host-side into the
// logical stream).
//
// Mirrors the public dcraw `panasonic_load_raw`/`pana_bits` semantics
// the Python reference implementation documents: a 17-bit descending
// cursor reads 16-bit LE windows at byte address `(vbits>>3) ^ 0x3ff0`
// within each 0x4000-byte section; pixels come in groups of 14 per row
// (predictor state resets per group, the 2-bit shift selector at
// in-group positions 2/5/8/11 persists); per pixel an 8-bit symbol
// establishes a channel's 12-bit value, repeats it, or steps it by
// `symbol << sh` from a rebased predictor. Must stay bit-identical to
// rw2.py::_decode_python (tests/test_rw2.py runs a differential fuzz
// across both).

// The RawFormat 5/6/7 decoders below follow the same pattern: they
// mirror rw2.py's Python reference implementations of the public
// LibRaw/RawSpeed-documented newer Panasonic codecs and must stay
// bit-identical to them (differential fuzz in tests/test_rw2.py).

#include <cstdint>
#include <cstring>

namespace {
constexpr int64_t kSection = 0x4000;
}

extern "C" int rw2_decode(const char* logical, int64_t nbytes, int width,
                          int height, uint16_t* out) {
  if (width <= 0 || height <= 0 || nbytes <= 0) return 1;
  const uint8_t* data = reinterpret_cast<const uint8_t*>(logical);
  uint8_t buf[kSection + 1];
  int64_t off = 0;
  int32_t vbits = 0;

  auto bits = [&](int n, int* err) -> uint32_t {
    if (vbits == 0) {
      if (off >= nbytes) {
        *err = 3;  // exhausted
        return 0;
      }
      int64_t take = nbytes - off < kSection ? nbytes - off : kSection;
      std::memcpy(buf, data + off, take);
      std::memset(buf + take, 0, kSection + 1 - take);
      off += kSection;
    } else if ((vbits & 127) && (vbits & 127) < n) {
      *err = 4;  // field straddles a 128-bit chunk boundary
      return 0;
    }
    vbits = (vbits - n) & 0x1FFFF;
    int byte = (vbits >> 3) ^ 0x3FF0;
    uint32_t word = buf[byte] | (buf[byte + 1] << 8);
    return (word >> (vbits & 7)) & ((1u << n) - 1);
  };

  int err = 0;
  int sh = 0;
  for (int row = 0; row < height; row++) {
    int32_t pred[2] = {0, 0};
    int32_t nonz[2] = {0, 0};
    for (int col = 0; col < width; col++) {
      int i = col % 14;
      int ch = i & 1;
      if (i == 0) {
        pred[0] = pred[1] = nonz[0] = nonz[1] = 0;
      }
      if (i % 3 == 2) sh = 4 >> (3 - static_cast<int>(bits(2, &err)));
      if (nonz[ch]) {
        uint32_t j = bits(8, &err);
        if (j) {
          int32_t p = pred[ch] - (0x80 << sh);
          // (1<<sh)-1 == ~(-1<<sh) without the UB of shifting a
          // negative value (UBSan-caught).
          if (p < 0 || sh == 4) p = pred[ch] & ((1 << sh) - 1);
          pred[ch] = p + (static_cast<int32_t>(j) << sh);
        }
      } else {
        nonz[ch] = static_cast<int32_t>(bits(8, &err));
        if (nonz[ch] || i > 11) {
          pred[ch] = (nonz[ch] << 4) | static_cast<int32_t>(bits(4, &err));
        }
      }
      if (err) return err;
      out[static_cast<int64_t>(row) * width + col] =
          static_cast<uint16_t>(pred[ch]);
    }
  }
  return 0;
}

// --- RawFormat 5/7: plain LSB-first packed 16-byte packets -----------------

namespace {
// Unpack one 16-byte packet of continuous LSB-first `bps`-bit fields.
inline void unpack_packet(const uint8_t* p, int bps, uint16_t* out) {
  int ppp = 128 / bps;
  uint64_t lo, hi;
  std::memcpy(&lo, p, 8);
  std::memcpy(&hi, p + 8, 8);
  uint32_t mask = (1u << bps) - 1;
  for (int k = 0; k < ppp; k++) {
    int bit = k * bps;
    uint64_t window;
    if (bit + bps <= 64) {
      window = lo >> bit;
    } else if (bit >= 64) {
      window = hi >> (bit - 64);
    } else {
      window = (lo >> bit) | (hi << (64 - bit));
    }
    out[k] = static_cast<uint16_t>(window & mask);
  }
}
}  // namespace

// payload = the DE-ROTATED logical stream (host Python undoes the 0x4000
// section rotation, as for the classic codec). bits = 12 or 14.
extern "C" int rw2_decode_v5(const char* logical, int64_t nbytes, int width,
                             int height, int bits, uint16_t* out) {
  if (width <= 0 || height <= 0 || (bits != 12 && bits != 14)) return 1;
  const uint8_t* data = reinterpret_cast<const uint8_t*>(logical);
  int ppp = 128 / bits;
  int64_t npix = static_cast<int64_t>(width) * height;
  int64_t npackets = (npix + ppp - 1) / ppp;
  if (nbytes < npackets * 16) return 3;
  uint16_t buf[10];
  int64_t i = 0;
  for (int64_t pk = 0; pk < npackets; pk++) {
    unpack_packet(data + pk * 16, bits, buf);
    for (int k = 0; k < ppp && i < npix; k++) out[i++] = buf[k];
  }
  return 0;
}

// RawFormat 7 ("pana8"): per-row blocks, no rotation; width must be a
// multiple of pixels-per-block (9 at 14 bits, 10 at 12).
extern "C" int rw2_decode_v7(const char* payload, int64_t nbytes, int width,
                             int height, int bits, uint16_t* out) {
  if (width <= 0 || height <= 0 || (bits != 12 && bits != 14)) return 1;
  int ppp = 128 / bits;
  if (width % ppp) return 2;
  const uint8_t* data = reinterpret_cast<const uint8_t*>(payload);
  int64_t blocks_per_row = width / ppp;
  if (nbytes < blocks_per_row * 16 * height) return 3;
  for (int64_t row = 0; row < height; row++) {
    uint16_t* o = out + row * width;
    const uint8_t* r = data + row * blocks_per_row * 16;
    for (int64_t b = 0; b < blocks_per_row; b++)
      unpack_packet(r + b * 16, bits, o + b * ppp);
  }
  return 0;
}

// --- RawFormat 6: 16-byte pages of scaled-delta pixels ---------------------

namespace {
// Page fields (big-endian over the page's bytes REVERSED). 14-bit: two
// 14-bit absolute pixels + 3 x [2-bit selector + three 10-bit values],
// 4 pad bits (11 pixels). 12-bit: two 12-bit absolutes + 4 x [2-bit
// selector + three 8-bit values] filling all 128 bits (14 pixels). The
// selector base starts at 0x200 (14-bit) / 0x80 (12-bit); the rebase
// threshold is base0 << 4. See rw2.py's _V6Layout.
struct V6Layout {
  int nfields;
  const int* fields;     // bit width per field
  int ppb;               // pixels per page
  const int* pix_field;  // field index per pixel
  const int* sel_field;  // field index per selector group (pix/3)
  int64_t base0, thresh;
};

const int kF14[14] = {14, 14, 2, 10, 10, 10, 2, 10, 10, 10, 2, 10, 10, 10};
const int kP14[11] = {0, 1, 3, 4, 5, 7, 8, 9, 11, 12, 13};
const int kS14[3] = {2, 6, 10};
const int kF12[18] = {12, 12, 2, 8, 8, 8, 2, 8, 8, 8, 2, 8, 8, 8, 2, 8, 8, 8};
const int kP12[14] = {0, 1, 3, 4, 5, 7, 8, 9, 11, 12, 13, 15, 16, 17};
const int kS12[4] = {2, 6, 10, 14};
const V6Layout kV6_14 = {14, kF14, 11, kP14, kS14, 0x200, 0x2000};
const V6Layout kV6_12 = {18, kF12, 14, kP12, kS12, 0x80, 0x800};

inline void v6_parse_page(const uint8_t* page, const V6Layout& lay,
                          uint32_t* f) {
  uint8_t rev[16];
  for (int i = 0; i < 16; i++) rev[i] = page[15 - i];
  int bitpos = 0;
  for (int k = 0; k < lay.nfields; k++) {
    uint32_t v = 0;
    for (int b = 0; b < lay.fields[k]; b++) {
      int bit = bitpos + b;
      v = (v << 1) | ((rev[bit >> 3] >> (7 - (bit & 7))) & 1);
    }
    f[k] = v;
    bitpos += lay.fields[k];
  }
}
}  // namespace

extern "C" int rw2_decode_v6(const char* payload, int64_t nbytes, int width,
                             int height, int bits, uint16_t* out) {
  if (width <= 0 || height <= 0) return 1;
  if (bits != 14 && bits != 12) return 1;
  const V6Layout& lay = bits == 14 ? kV6_14 : kV6_12;
  const uint8_t* data = reinterpret_cast<const uint8_t*>(payload);
  int64_t blocks = width / lay.ppb;
  if (nbytes < blocks * 16 * height) return 3;
  for (int64_t row = 0; row < height; row++) {
    uint16_t* o = out + row * width;
    const uint8_t* r = data + row * blocks * 16;
    for (int w = blocks * lay.ppb; w < width; w++) o[w] = 0;
    for (int64_t blk = 0; blk < blocks; blk++) {
      uint32_t f[18];
      v6_parse_page(r + blk * 16, lay, f);
      int64_t oddeven[2] = {0, 0}, nonzero[2] = {0, 0};
      int64_t pmul = 0, pbase = 0;
      for (int pix = 0; pix < lay.ppb; pix++) {
        int p = pix & 1;
        if (pix % 3 == 2) {
          int64_t sel = f[lay.sel_field[pix / 3]];
          if (sel == 3) sel = 4;
          pbase = lay.base0 << sel;
          pmul = static_cast<int64_t>(1) << sel;
        }
        int64_t e = f[lay.pix_field[pix]];
        int64_t val;
        if (oddeven[p]) {
          val = e * pmul;
          if (pbase < lay.thresh && nonzero[p] > pbase)
            val += nonzero[p] - pbase;
          nonzero[p] = val;
        } else {
          oddeven[p] = e;
          val = e ? e : nonzero[p];
          nonzero[p] = val;
        }
        // Clamp both ways like the published decoder: floor 0, and
        // saturate chains grown past the pixel mask (crafted streams).
        const int64_t maxval = (lay.base0 << 5) - 1;  // 0xFFF / 0x3FFF
        int64_t s = val - 0xF;
        if (s < 0) s = 0;
        if (s > maxval) s = maxval;
        o[blk * lay.ppb + pix] = static_cast<uint16_t>(s);
      }
    }
  }
  return 0;
}
