// Samsung SRW 12-bit compressed decoder (compression 32772; fast path
// for imagepipe_tpu/samsung.py — see that module's algorithm and
// provenance notes; dcraw samsung_load_raw semantics).
//
// Payload layout (canonical): height u32 LE per-row offsets, then the
// row bitstreams (Phase-One-style reader: LE 32-bit words, bits
// MSB-first per word). Must stay bit-identical to
// samsung.py::decode_samsung12 (differential fuzz in tests/test_fuzz.py).

#include <cstdint>
#include <cstring>

namespace {

struct Ph1BitReader {
  const uint8_t* data;
  int64_t nbytes;
  int64_t pos;
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
      uint32_t w = static_cast<uint32_t>(data[pos]) |
                   static_cast<uint32_t>(data[pos + 1]) << 8 |
                   static_cast<uint32_t>(data[pos + 2]) << 16 |
                   static_cast<uint32_t>(data[pos + 3]) << 24;
      pos += 4;
      bitbuf = bitbuf << 32 | w;
      vbits += 32;
    }
    uint32_t c = static_cast<uint32_t>(bitbuf << (64 - vbits) >> (64 - n));
    vbits -= n;
    return c;
  }
};

}  // namespace

extern "C" int samsung12_decode(const char* payload, int64_t nbytes,
                                int width, int height, uint16_t* out) {
  if (width <= 0 || height <= 0 || width % 32 || height % 2) return 1;
  const uint8_t* data = reinterpret_cast<const uint8_t*>(payload);
  const int64_t table_bytes = 4ll * height;
  if (table_bytes > nbytes) return 2;  // offset table out of range
  // int32 scratch: diffs can step outside u16 transiently only on corrupt
  // streams; range-check before committing.
  int32_t* buf = new int32_t[static_cast<int64_t>(width) * height];
  int rc = 0;
  for (int row = 0; row < height && rc == 0; row++) {
    uint32_t rel;
    std::memcpy(&rel, data + 4ll * row, 4);
    const int64_t off = table_bytes + rel;
    if (off < 0 || off > nbytes) { rc = 3; break; }
    Ph1BitReader br{data, nbytes, off};
    int len[4];
    for (int c = 0; c < 4; c++) len[c] = row < 2 ? 7 : 4;
    for (int col = 0; col < width && rc == 0; col += 16) {
      const int dir = br.get(1);
      if (dir && row < 2) { rc = 4; break; }
      for (int c = 0; c < 4; c++) {
        const int op = br.get(2);
        if (op == 3) len[c] = br.get(4);
        else if (op == 2) len[c]--;
        else if (op == 1) len[c]++;
        if (len[c] < 0 || len[c] > 14) { rc = 5; break; }
      }
      if (rc) break;
      for (int c = 0; c < 16;) {
        const int i = len[((c & 1) << 1) | (c >> 3)];
        int32_t v = static_cast<int32_t>(br.get(i));
        if (i && v >= (1 << (i - 1))) v -= (1 << i);
        int32_t pred;
        if (dir) {
          pred = buf[static_cast<int64_t>(row + (c & 1) - 2) * width + col + c];
        } else {
          pred = col ? buf[static_cast<int64_t>(row) * width + col + c - 2]
                     : 128;
        }
        const int32_t val = pred + v;
        buf[static_cast<int64_t>(row) * width + col + c] = val;
        if (val < 0 || val > 0xFFFF) { rc = 6; break; }
        if (c == 14) c = 1;
        else if (c == 15) break;
        else c += 2;
      }
      if (br.exhausted) rc = 7;
    }
  }
  if (rc == 0) {
    // checkerboard unscramble while emitting
    for (int row = 0; row < height; row++) {
      for (int col = 0; col < width; col++) {
        int r = row, c = col;
        if ((row & 1) == 0 && (col & 1) == 1) { r = row + 1; c = col - 1; }
        else if ((row & 1) == 1 && (col & 1) == 0) { r = row - 1; c = col + 1; }
        out[static_cast<int64_t>(row) * width + col] =
            static_cast<uint16_t>(buf[static_cast<int64_t>(r) * width + c]);
      }
    }
  }
  delete[] buf;
  return rc;
}
