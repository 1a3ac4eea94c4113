// Pentax PEF compressed-stream decoder (fast path for
// imagepipe_tpu/pentax.py; the Huffman table is parsed host-side into a
// 4096-entry 12-bit-window lookup, value `len<<8 | category`).
//
// Mirrors the public dcraw `pentax_load_raw` semantics the Python
// reference implementation documents: MSB-first bitstream; per pixel a
// Huffman-coded JPEG difference category then that many mantissa bits,
// sign-extended (category 0 -> 0, 16 -> -32768, no mantissa); the first
// two columns of each row predict vertically per row parity (two rows
// up), the rest horizontally per column parity (two columns left);
// predictors wrap at 16 bits. Must stay bit-identical to
// pentax.py::_decode_python (tests/test_pentax.py runs a differential
// fuzz across both).

#include <cstdint>

#include "bitreader.h"

namespace {

using imagepipe::CachedBitReader;

}  // namespace

extern "C" int pentax_decode(const char* payload, int64_t nbytes, int width,
                             int height, const uint16_t* table,
                             uint16_t* out) {
  if (width <= 0 || height <= 0 || nbytes <= 0) return 1;
  CachedBitReader br{reinterpret_cast<const uint8_t*>(payload), nbytes};
  uint16_t vpred[2][2] = {{0, 0}, {0, 0}};
  for (int row = 0; row < height; row++) {
    uint16_t hpred[2] = {0, 0};
    for (int col = 0; col < width; col++) {
      // One refill serves the 12-bit Huffman window AND the mantissa
      // (12 + 16 bits fit the 57-bit cache).
      br.refill();
      uint16_t ent = table[br.buf >> 52];
      int length = ent >> 8;
      if (length == 0) return 2;  // window not covered (corrupt table)
      int c = ent & 0xFF;
      int32_t diff;
      if (c == 0) {
        br.skip(length);
        diff = 0;
      } else if (c == 16) {
        br.skip(length);
        diff = -32768;
      } else {
        uint32_t mant;
        if (c <= 16) {
          mant = static_cast<uint32_t>((br.buf << length) >> (64 - c));
          br.skip(length + c);
        } else {  // degenerate host-built table: keep the two-step read
          br.skip(length);
          mant = br.get(c);
        }
        diff = (mant & (1u << (c - 1)))
                   ? static_cast<int32_t>(mant)
                   : static_cast<int32_t>(mant) - (1 << c) + 1;
      }
      if (br.overrun) return 3;
      if (col < 2) {
        vpred[row & 1][col] = static_cast<uint16_t>(vpred[row & 1][col] + diff);
        hpred[col] = vpred[row & 1][col];
      } else {
        hpred[col & 1] = static_cast<uint16_t>(hpred[col & 1] + diff);
      }
      out[static_cast<int64_t>(row) * width + col] = hpred[col & 1];
    }
  }
  return 0;
}
