// Nikon NEF compression-34713 decoder (fast path for imagepipe_tpu/nikon.py).
//
// Mirrors the public dcraw `nikon_load_raw` stream semantics: MSB-first
// bitstream (no JPEG marker stuffing), fixed Huffman tables selected by
// (variant, bit depth) with the high-nibble `shl` shift trick in the
// lossy-after-split tables, JPEG-style signed difference decoding, vertical
// predictors for columns 0/1 and horizontal column-parity predictors
// elsewhere, output through the linearization curve. Tables and curve are
// parsed host-side (imagepipe_tpu/nikon.py parse_linearization) and passed
// in; `tree` indexes NIKON_TREES there.

#include <cstdint>
#include <cstring>

#include "bitreader.h"

namespace {

using imagepipe::CachedBitReader;

// Must match imagepipe_tpu/nikon.py NIKON_TREES.
static const unsigned char kTrees[6][32] = {
    {0, 1, 5, 1, 1, 1, 1, 1, 1, 2, 0, 0, 0, 0, 0, 0,
     5, 4, 3, 6, 2, 7, 1, 0, 8, 9, 11, 10, 12},
    {0, 1, 5, 1, 1, 1, 1, 1, 1, 2, 0, 0, 0, 0, 0, 0,
     0x39, 0x5a, 0x38, 0x27, 0x16, 5, 4, 3, 2, 1, 0, 11, 12, 12},
    {0, 1, 4, 2, 3, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0,
     5, 4, 6, 3, 7, 2, 8, 1, 9, 0, 10, 11, 12},
    {0, 1, 4, 3, 1, 1, 1, 1, 1, 2, 0, 0, 0, 0, 0, 0,
     5, 6, 4, 7, 8, 3, 9, 2, 1, 0, 10, 11, 12, 13, 14},
    {0, 1, 5, 1, 1, 1, 1, 1, 1, 1, 2, 0, 0, 0, 0, 0,
     8, 0x5c, 0x4b, 0x3a, 0x29, 7, 6, 5, 4, 3, 2, 1, 0, 13, 14},
    {0, 1, 4, 2, 2, 3, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0,
     7, 6, 8, 5, 9, 4, 10, 3, 11, 12, 2, 0, 1, 13, 14},
};

constexpr int kPeek = 16;

struct Lut {
  // peek-indexed: value = leaf, len = code length (0 => invalid).
  unsigned char leaf[1 << kPeek];
  unsigned char len[1 << kPeek];
};

void build_lut(int tree, Lut* lut) {
  std::memset(lut->len, 0, sizeof(lut->len));
  const unsigned char* t = kTrees[tree];
  int code = 0, vi = 0;
  int nvals = 0;
  for (int i = 0; i < 16; i++) nvals += t[i];
  for (int length = 1; length <= 16; length++) {
    for (int c = 0; c < t[length - 1]; c++) {
      int v = (16 + vi < 32 && vi < nvals) ? t[16 + vi] : 0;
      int lo = code << (kPeek - length);
      int hi = (code + 1) << (kPeek - length);
      for (int k = lo; k < hi; k++) {
        lut->leaf[k] = static_cast<unsigned char>(v);
        lut->len[k] = static_cast<unsigned char>(length);
      }
      code++;
      vi++;
    }
    code <<= 1;
  }
}

}  // namespace

extern "C" int nikon_decode(const char* payload, int64_t nbytes,
                            uint16_t* out, int width, int height, int tree,
                            int split, const int32_t* vpred_in,
                            const uint16_t* curve) {
  if (tree < 0 || tree > 5 || width <= 0 || height <= 0) return 1;
  if (split && tree + 1 > 5) return 1;
  Lut lut, lut2;
  build_lut(tree, &lut);
  if (split) build_lut(tree + 1, &lut2);

  CachedBitReader br{reinterpret_cast<const uint8_t*>(payload), nbytes};
  int32_t vpred[2][2] = {{vpred_in[0], vpred_in[1]},
                         {vpred_in[2], vpred_in[3]}};
  int32_t hpred[2] = {0, 0};
  const Lut* cur = &lut;
  for (int row = 0; row < height; row++) {
    if (split && row == split) cur = &lut2;
    for (int col = 0; col < width; col++) {
      // One refill serves the 16-bit Huffman window AND the mantissa
      // (16 + 14 bits fit the 57-bit cache).
      br.refill();
      uint32_t idx = static_cast<uint32_t>(br.buf >> (64 - kPeek));
      int length = cur->len[idx];
      if (length == 0) return 2;  // invalid code
      int leaf = cur->leaf[idx];
      int len = leaf & 15;
      int shl = leaf >> 4;
      int nmant = len - shl;
      uint32_t mant =
          nmant > 0
              ? static_cast<uint32_t>((br.buf << length) >> (64 - nmant))
              : 0;
      br.skip(length + (nmant > 0 ? nmant : 0));
      int32_t diff = ((static_cast<int32_t>(mant) << 1) + 1) << shl >> 1;
      if (len > 0 && (diff & (1 << (len - 1))) == 0)
        diff -= (1 << len) - (shl ? 0 : 1);
      if (col < 2) {
        vpred[row & 1][col] += diff;
        hpred[col] = vpred[row & 1][col];
      } else {
        hpred[col & 1] += diff;
      }
      int32_t p = hpred[col & 1];
      if (p < 0) p = 0;
      if (p > 0x3fff) p = 0x3fff;
      out[static_cast<int64_t>(row) * width + col] = curve[p];
    }
    if (br.overrun) return 3;  // exhausted mid-image
  }
  return 0;
}
