// Olympus ORF compressed-stream decoder (fast path for
// imagepipe_tpu/olympus.py; the 7-byte preamble is stripped host-side).
//
// Mirrors the public dcraw `olympus_load_raw` semantics the Python
// reference implementation documents: MSB-first bitstream; per pixel a
// 3-bit sign+low field, a unary magnitude class (v zeros then a 1 for
// v<=11, 12 zeros escaping to an explicit 16-nbits field whose LSB is
// dropped), and an adaptive-width mantissa driven by the per-column-parity
// carry state; gradient-medium spatial predictor over same-parity
// W/N/NW neighbors. Must stay bit-identical to olympus.py::_decode_python
// (tests/test_olympus.py runs a differential fuzz across both).

#include <cstdint>

#include "bitreader.h"

namespace {

using imagepipe::CachedBitReader;

// One refill serves the whole per-pixel read: the 3-bit sign+low field,
// the 12-bit unary window, the escape field (<= 14 bits), and the
// adaptive mantissa (<= 16 bits) total at most 31 bits of the 57-bit
// cache. Returns c0; *low_out/*sign_out get the prefix fields.
inline int32_t read_sample(CachedBitReader& br, int nbits, int32_t* low_out,
                           int32_t* sign_out) {
  br.refill();
  uint64_t buf = br.buf;
  uint32_t b3 = static_cast<uint32_t>(buf >> 61);
  *low_out = static_cast<int32_t>(b3 & 3);
  *sign_out = (b3 & 4) ? -1 : 0;
  // Unary class: count of leading zeros before a 1, capped at 12
  // (12 zeros carry no terminator).
  uint32_t win = static_cast<uint32_t>((buf << 3) >> 52);
  int used = 3;
  int high;
  if (win == 0) {
    high = 12;
    used += 12;
  } else {
    high = __builtin_clz(win) - 20;  // leading zeros in the 12-bit window
    used += high + 1;
  }
  if (high == 12) {  // escape: explicit (16-nbits)-bit field, LSB dropped
    int n = 16 - nbits;
    high = n > 0
               ? static_cast<int>((buf << used) >> (64 - n)) >> 1
               : 0;
    used += n > 0 ? n : 0;
  }
  int32_t mant = nbits > 0
                     ? static_cast<int32_t>((buf << used) >> (64 - nbits))
                     : 0;
  used += nbits > 0 ? nbits : 0;
  br.skip(used);
  return (static_cast<int32_t>(high) << nbits) | mant;
}

inline int32_t iabs(int32_t v) { return v < 0 ? -v : v; }

}  // namespace

extern "C" int olympus_decode(const char* payload, int64_t nbytes, int width,
                              int height, uint16_t* out) {
  if (width <= 0 || height <= 0 || nbytes <= 0) return 1;
  CachedBitReader br{reinterpret_cast<const uint8_t*>(payload), nbytes};
  for (int row = 0; row < height; row++) {
    int32_t carry[2][3] = {{0, 0, 0}, {0, 0, 0}};
    for (int col = 0; col < width; col++) {
      int32_t* c = carry[col & 1];
      int i2 = (c[2] < 3) ? 2 : 0;
      int nbits = 2 + i2;
      while (static_cast<uint16_t>(c[0]) >> (nbits + i2)) nbits++;
      int32_t low, sign;
      int32_t c0 = read_sample(br, nbits, &low, &sign);
      int32_t diff = (c0 ^ sign) + c[1];
      c[1] = (diff * 3 + c[1]) >> 5;
      c[2] = (c0 > 16) ? 0 : c[2] + 1;
      c[0] = c0;
      int32_t pred;
      const int64_t at = static_cast<int64_t>(row) * width + col;
      if (row < 2 && col < 2) {
        pred = 0;
      } else if (row < 2) {
        pred = out[at - 2];
      } else if (col < 2) {
        pred = out[at - 2 * width];
      } else {
        int32_t w = out[at - 2];
        int32_t n = out[at - 2 * width];
        int32_t nw = out[at - 2 * width - 2];
        if ((w < nw && nw < n) || (n < nw && nw < w)) {
          if (iabs(w - nw) > 32 || iabs(n - nw) > 32)
            pred = w + n - nw;
          else
            pred = (w + n) >> 1;
        } else {
          pred = iabs(w - nw) > iabs(n - nw) ? w : n;
        }
      }
      out[at] = static_cast<uint16_t>(pred + diff * 4 + low);
    }
    if (br.overrun) return 3;  // exhausted mid-image
  }
  return 0;
}
