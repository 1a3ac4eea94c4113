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
          if (p < 0 || sh == 4) p = pred[ch] & ~(-1 << sh);
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
