// Hasselblad compressed-3FR decoder (fast path for
// imagepipe_tpu/hasselblad.py).
//
// Mirrors the public dcraw `hasselblad_load_raw` semantics the Python
// reference implementation documents: scan data after the JPEG SOS is
// 32-bit little-endian words consumed MSB-first (Phase One bit order,
// no FF stuffing); per column pair two Huffman-coded difference
// lengths then two difference fields (JPEG extend sign rule plus the
// 65535 -> -32768 special); predictor 0x8000 at each row start, else
// the same-row value two columns back, plus — for psv 11 — the
// half-difference (C truncating division) of the row-two-above
// UNMASKED predictors. The stored sample is the predictor's low 16
// bits. Must stay bit-identical to hasselblad.py::_decode_python
// (tests/test_hasselblad.py runs a differential fuzz across both).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kMaxPastEndRefills = 2;  // same as hasselblad.py

struct HbBitReader {
  const uint8_t* data;
  int64_t nbytes;
  int64_t pos = 0;
  uint64_t bitbuf = 0;
  int vbits = 0;
  int past_end = 0;
  bool failed = false;

  inline void refill() {
    uint32_t w = 0;
    if (pos >= nbytes) {
      past_end++;
      if (past_end > kMaxPastEndRefills) {
        failed = true;
        return;
      }
    } else {
      // Short tails zero-pad the high (later) bytes, little-endian.
      for (int i = 0; i < 4 && pos + i < nbytes; i++)
        w |= static_cast<uint32_t>(data[pos + i]) << (8 * i);
    }
    pos += 4;
    bitbuf = bitbuf << 32 | w;
    vbits += 32;
  }

  inline uint32_t peek(int n) {
    if (vbits < n) refill();
    if (failed) return 0;
    return static_cast<uint32_t>(bitbuf << (64 - vbits) >> (64 - n));
  }

  inline void skip(int n) { vbits -= n; }

  inline uint32_t get(int n) {
    if (n == 0) return 0;
    uint32_t v = peek(n);
    vbits -= n;
    return v;
  }
};

inline int64_t extend(uint32_t v, int ln) {
  if (ln == 0) return 0;
  int64_t d = v;
  if (!(v & (1u << (ln - 1)))) d -= (int64_t(1) << ln) - 1;
  if (d == 65535) d = -32768;
  return d;
}

}  // namespace

extern "C" int hasselblad_decode(const char* scan, int64_t nbytes,
                                 int width, int height, int psv,
                                 int maxlen, const uint16_t* table,
                                 uint16_t* out) {
  if (width <= 0 || height <= 0 || (width & 1) || maxlen < 1 ||
      maxlen > 16)
    return 1;
  // Defense in depth (the Python wrapper already validates): a field
  // length > 16 or a code length > maxlen would shift past the bit
  // caches / drive vbits negative.
  for (int i = 0; i < (1 << maxlen); i++)
    if ((table[i] & 0xFF) > 16 || (table[i] >> 8) > maxlen) return 1;
  HbBitReader br{reinterpret_cast<const uint8_t*>(scan), nbytes};
  std::vector<int64_t> bufs(static_cast<size_t>(width) * 3, 0);
  int64_t* prev2 = bufs.data();
  int64_t* prev1 = bufs.data() + width;
  int64_t* cur = bufs.data() + 2 * static_cast<int64_t>(width);
  const bool corr = psv == 11;
  for (int row = 0; row < height; row++) {
    int64_t* t = prev2;
    prev2 = prev1;
    prev1 = cur;
    cur = t;
    for (int col = 0; col < width; col += 2) {
      const uint16_t e0 = table[br.peek(maxlen)];
      if (br.failed) return 2;
      if (!(e0 >> 8)) return 3;  // invalid Huffman code
      br.skip(e0 >> 8);
      const uint16_t e1 = table[br.peek(maxlen)];
      if (br.failed) return 2;
      if (!(e1 >> 8)) return 3;
      br.skip(e1 >> 8);
      const int64_t d0 = extend(br.get(e0 & 0xFF), e0 & 0xFF);
      const int64_t d1 = extend(br.get(e1 & 0xFF), e1 & 0xFF);
      if (br.failed) return 2;
      const int64_t diffs[2] = {d0, d1};
      for (int i = 0; i < 2; i++) {
        const int s = col + i;
        int64_t pred;
        if (col == 0) {
          pred = 0x8000;
        } else {
          pred = cur[s - 2];
          if (corr && row > 1) pred += prev2[s] / 2 - prev2[s - 2] / 2;
        }
        pred += diffs[i];
        cur[s] = pred;
        out[static_cast<int64_t>(row) * width + s] =
            static_cast<uint16_t>(pred & 0xFFFF);
      }
    }
  }
  return 0;
}
