// Sony ARW v1 (DSLR-A100) decoder — fast path for
// imagepipe_tpu/arw1.py::decode_arw1; see that module's layout and
// provenance notes (dcraw sony_arw_load_raw semantics).
//
// Must stay bit-identical to the Python reference, including the fates
// of corrupt streams (differential fuzz in tests/test_arw1.py): bits
// may be PEEKED past the end as zeros but never consumed past it.

#include <cstdint>
#include <vector>

namespace {

constexpr uint16_t kTab[18] = {
    0xF11, 0xF10, 0xE0F, 0xD0E, 0xC0D, 0xB0C, 0xA0B, 0x90A, 0x809,
    0x708, 0x607, 0x506, 0x405, 0x304, 0x303, 0x300, 0x202, 0x201};
constexpr int kPeek = 15;

struct Bits {
  const uint8_t* data;
  int64_t nbits;

  inline uint32_t at(int64_t p, int n) const {
    uint32_t v = 0;
    for (int k = 0; k < n; k++) {
      const int64_t q = p + k;
      v = (v << 1) |
          (q < nbits ? (data[q >> 3] >> (7 - (q & 7))) & 1 : 0);
    }
    return v;
  }
};

}  // namespace

extern "C" int arw1_decode(const char* payload, int64_t nbytes, int width,
                           int height, uint16_t* out) {
  if (width <= 0 || height <= 0 || (height & 1)) return 1;
  std::vector<uint16_t> peek(1 << kPeek);
  int slot = 0;
  for (uint16_t e : kTab) {
    const int n = 1 << (kPeek - (e >> 8));
    for (int i = 0; i < n; i++) peek[slot + i] = e;
    slot += n;
  }
  std::vector<int> rows;
  rows.reserve(height);
  for (int r = 0; r < height; r += 2) rows.push_back(r);
  for (int r = 1; r < height; r += 2) rows.push_back(r);
  Bits bits{reinterpret_cast<const uint8_t*>(payload), 8 * nbytes};
  int64_t pos = 0;
  int32_t total = 0;
  for (int col = width - 1; col >= 0; col--) {
    for (int row : rows) {
      const uint16_t e = peek[bits.at(pos, kPeek)];
      const int clen = e >> 8, dlen = e & 0xFF;
      pos += clen;
      int32_t diff;
      if (dlen == 16) {
        diff = -32768;
      } else if (dlen == 0) {
        diff = 0;
      } else {
        const uint32_t v = bits.at(pos, dlen);
        pos += dlen;
        diff = (v & (1u << (dlen - 1)))
                   ? static_cast<int32_t>(v)
                   : static_cast<int32_t>(v) - ((1 << dlen) - 1);
      }
      if (pos > bits.nbits) return 2;  // bitstream truncated
      total += diff;
      if (total < 0 || total > 0xFFF) return 3;  // out of 12-bit range
      out[static_cast<int64_t>(row) * width + col] =
          static_cast<uint16_t>(total);
    }
  }
  return 0;
}
