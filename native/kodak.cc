// Kodak DCR/KDC compression-65000 decoder — fast path for
// imagepipe_tpu/kodak.py::decode_kodak65000; see that module's layout
// and provenance notes (dcraw kodak_65000_load_raw semantics).
//
// Must stay bit-identical to the Python reference, including the fates
// of corrupt streams (differential fuzz in tests/test_kodak.py): the
// nibble scan reads the whole rounded/2-byte span before deciding
// compressed vs uncompressed (truncation mid-scan is an error).

#include <cstdint>
#include <cstring>

namespace {

constexpr int kRun = 256;
constexpr int kMaxLen = 12;

struct Reader {
  const uint8_t* data;
  int64_t nbytes;
  int64_t pos;
  uint64_t buf = 0;
  int bits = 0;
  bool bad = false;

  inline int byte() {
    if (pos >= nbytes) {
      bad = true;
      return 0;
    }
    return data[pos++];
  }

  inline void seed16() {
    buf = static_cast<uint64_t>(byte()) << 8;
    buf += byte();
    bits = 16;
  }

  inline int64_t take(int len) {
    if (bits < len) {
      static const int kShifts[4] = {8, 0, 24, 16};  // dcraw's (j ^ 8)
      for (int j = 0; j < 4; j++)
        buf += static_cast<uint64_t>(byte()) << (bits + kShifts[j]);
      bits += 32;
    }
    int64_t v = static_cast<int64_t>(buf & ((1u << len) - 1));
    buf >>= len;
    bits -= len;
    return v;
  }
};

}  // namespace

extern "C" int kodak65000_decode(const char* payload, int64_t nbytes,
                                 int width, int height, uint16_t* out) {
  if (width <= 0 || height <= 0) return 1;
  const uint8_t* data = reinterpret_cast<const uint8_t*>(payload);
  int64_t pos = 0;
  uint8_t lens[kRun];
  for (int row = 0; row < height; row++) {
    for (int col = 0; col < width; col += kRun) {
      const int n = width - col < kRun ? width - col : kRun;
      const int rounded = (n + 3) & ~3;
      const int64_t start = pos;
      bool fallback = false;
      for (int i = 0; i < rounded; i += 2) {
        if (pos >= nbytes) return 2;  // truncated in the nibble scan
        const uint8_t b = data[pos++];
        lens[i] = b & 15;
        lens[i + 1] = b >> 4;
        if (lens[i] > kMaxLen || lens[i + 1] > kMaxLen) fallback = true;
      }
      if (fallback) {
        // Uncompressed run: six LE u16 per eight pixels from run start.
        const int groups = (rounded + 7) / 8;
        if (start + 12ll * groups > nbytes) return 2;
        for (int g = 0; g < groups; g++) {
          uint16_t w[6];
          std::memcpy(w, data + start + 12ll * g, 12);
          int64_t vals[8];
          vals[0] = (w[0] >> 12 << 8) | (w[2] >> 12 << 4) | (w[4] >> 12);
          vals[1] = (w[1] >> 12 << 8) | (w[3] >> 12 << 4) | (w[5] >> 12);
          for (int j = 0; j < 6; j++) vals[2 + j] = w[j] & 0xFFF;
          for (int k = 0; k < 8; k++) {
            const int i = 8 * g + k;
            if (i < n)
              out[static_cast<int64_t>(row) * width + col + i] =
                  static_cast<uint16_t>(vals[k]);
          }
        }
        pos = start + 12ll * groups;
        continue;
      }
      Reader rd{data, nbytes, pos};
      if ((rounded & 7) == 4) rd.seed16();
      int64_t pred[2] = {0, 0};
      for (int i = 0; i < rounded; i++) {
        int64_t d = 0;
        if (lens[i]) {
          d = rd.take(lens[i]);
          if (!(d & (1ll << (lens[i] - 1)))) d -= (1ll << lens[i]) - 1;
        }
        if (rd.bad) return 2;  // bit payload truncated
        if (i < n) {
          pred[i & 1] += d;
          if (pred[i & 1] < 0 || pred[i & 1] > 0xFFF)
            return 3;  // sample out of 12-bit range
          out[static_cast<int64_t>(row) * width + col + i] =
              static_cast<uint16_t>(pred[i & 1]);
        }
      }
      pos = rd.pos;
    }
  }
  return 0;
}
