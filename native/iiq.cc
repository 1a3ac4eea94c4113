// Phase One IIQ compressed-stream decoder (fast path for
// imagepipe_tpu/iiq.py).
//
// Mirrors the public dcraw `phase_one_load_raw_c` semantics the Python
// reference implementation documents: the bitstream is 32-bit
// little-endian words consumed MSB-first; two parity chains; every 8
// columns a unary-coded update (a leading 1 keeps the chain's current
// difference length, j zeros pick from the pair table
// {8,7},{6,9},{11,10},{5,12},{14,13}); length 14 reads a raw 16-bit
// value, otherwise the predictor steps by bits(len) + 1 - 2^(len-1);
// the trailing width % 8 columns are raw 16-bit and pin both chains'
// persistent length state to 14 (the state survives across rows). Must
// stay bit-identical to iiq.py::_decode_python (tests/test_iiq.py runs
// a differential fuzz across both).

#include <cstdint>

namespace {

struct Ph1BitReader {
  const uint8_t* data;
  int64_t nbytes;
  int64_t pos;
  bool big_endian;  // word order follows the container order mark
  uint64_t bitbuf = 0;
  int vbits = 0;
  bool exhausted = false;

  inline uint32_t get(int n) {
    if (n == 0) return 0;
    if (vbits < n) {
      if (pos + 4 > nbytes) {
        exhausted = true;
        return 0;
      }
      uint32_t w;
      if (big_endian) {
        w = static_cast<uint32_t>(data[pos]) << 24 |
            static_cast<uint32_t>(data[pos + 1]) << 16 |
            static_cast<uint32_t>(data[pos + 2]) << 8 |
            static_cast<uint32_t>(data[pos + 3]);
      } else {
        w = static_cast<uint32_t>(data[pos]) |
            static_cast<uint32_t>(data[pos + 1]) << 8 |
            static_cast<uint32_t>(data[pos + 2]) << 16 |
            static_cast<uint32_t>(data[pos + 3]) << 24;
      }
      pos += 4;
      bitbuf = bitbuf << 32 | w;
      vbits += 32;
    }
    uint32_t c = static_cast<uint32_t>(bitbuf << (64 - vbits) >> (64 - n));
    vbits -= n;
    return c;
  }
};

const int kLenTable[10] = {8, 7, 6, 9, 11, 10, 5, 12, 14, 13};

}  // namespace

extern "C" int iiq_decode(const char* payload, int64_t nbytes,
                          const int64_t* offsets, int width, int height,
                          int big_endian, uint16_t* out) {
  if (width <= 0 || height <= 0) return 1;
  const uint8_t* data = reinterpret_cast<const uint8_t*>(payload);
  const int tail_start = width & ~7;
  int len[2] = {0, 0};  // persists across rows (dcraw scope)
  for (int row = 0; row < height; row++) {
    const int64_t off = offsets[row];
    if (off < 0 || off > nbytes) return 2;  // strip offset out of range
    Ph1BitReader br{data, nbytes, off, big_endian != 0};
    int32_t pred[2] = {0, 0};
    for (int col = 0; col < width; col++) {
      int l;
      if (col >= tail_start) {
        len[0] = len[1] = l = 14;
      } else {
        if ((col & 7) == 0) {
          for (int i = 0; i < 2; i++) {
            int j = 0;
            while (j < 5 && !br.get(1)) j++;
            if (j) len[i] = kLenTable[(j - 1) * 2 + br.get(1)];
          }
        }
        l = len[col & 1];
        if (l == 0) return 5;  // length never established
      }
      const int p = col & 1;
      if (l == 14) {
        pred[p] = static_cast<int32_t>(br.get(16));
      } else {
        pred[p] += static_cast<int32_t>(br.get(l)) + 1 - (1 << (l - 1));
      }
      if (br.exhausted) return 4;  // bitstream exhausted
      if (pred[p] < 0 || pred[p] > 0xFFFF) return 3;  // corrupt stream
      out[static_cast<int64_t>(row) * width + col] =
          static_cast<uint16_t>(pred[p]);
    }
  }
  return 0;
}
