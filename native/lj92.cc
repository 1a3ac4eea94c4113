// Lossless JPEG (ITU T.81 process 14, "LJ92") decoder — the compression
// used by DNG (Compression=7) and most camera RAW containers.
//
// Scope: baseline lossless SOF3 scans, 2-16 bit precision, 1..4 components,
// predictors 1..7, restart markers, FF00 byte stuffing. Interleaved
// components de-interleave into consecutive columns (the DNG CFA
// convention). Exposed to Python through ctypes (imagepipe_tpu/native.py).

#include <cstdint>
#include <cstring>
#include <memory>

namespace {

// MSB-first reader over a left-aligned 64-bit cache, unstuffing FF00 and
// zero-filling at a real marker (T.81 semantics, same as the per-bit
// reader this replaces: bits past a marker read as zeros and the marker
// itself is never consumed, so `reset_to_marker` still finds it).
struct BitReader {
  const uint8_t* p;
  const uint8_t* end;
  uint64_t buf = 0;  // left-aligned
  int navail = 0;
  bool marker_hit = false;

  BitReader(const uint8_t* data, const uint8_t* e) : p(data), end(e) {}

  inline void refill() {
    while (navail <= 56) {
      uint64_t b = 0;
      if (!marker_hit && p < end) {
        b = *p++;
        if (b == 0xFF) {
          if (p < end && *p == 0x00) {
            p++;  // stuffed byte
          } else {
            // Real marker: stop feeding bits (fill with zeros per spec).
            p--;
            marker_hit = true;
            b = 0;
          }
        }
      }
      buf |= b << (56 - navail);
      navail += 8;
    }
  }

  // The next 16 bits (zero-padded past end/marker), not consumed.
  inline uint32_t peek16() {
    refill();
    return static_cast<uint32_t>(buf >> 48);
  }

  inline void advance(int n) {
    buf <<= n;
    navail -= n;
  }

  inline int get_bits(int n) {
    if (n <= 0) return 0;
    refill();
    int v = static_cast<int>(buf >> (64 - n));
    advance(n);
    return v;
  }

  void reset_to_marker() {  // skip to next marker boundary (restart)
    // Cached lookahead never crosses a real marker (refill stops at it),
    // so scanning forward from `p` finds the restart marker; cached bits
    // are padding and are discarded.
    buf = 0;
    navail = 0;
    while (p < end && *p != 0xFF) p++;
    // skip marker FFD0-FFD7
    if (p + 1 < end && p[0] == 0xFF && p[1] >= 0xD0 && p[1] <= 0xD7) p += 2;
    marker_hit = false;
  }
};

struct Huff {
  // 16-bit-window lookup built from the canonical T.81 code lengths:
  // leaf = decoded value, len = code length (0 => invalid code).
  uint8_t leaf[1 << 16];
  uint8_t len[1 << 16];

  // false when the counts oversubscribe the canonical code space (a
  // corrupt DHT would otherwise index past the 64K windows).
  bool build(const uint8_t counts[16], const uint8_t* values, int nvals) {
    std::memset(len, 0, sizeof(len));
    int code = 0, k = 0;
    for (int l = 1; l <= 16; l++) {
      for (int c = 0; c < counts[l - 1]; c++) {
        if (k >= nvals || code >= (1 << l)) return false;
        uint32_t lo = static_cast<uint32_t>(code) << (16 - l);
        uint32_t hi = static_cast<uint32_t>(code + 1) << (16 - l);
        for (uint32_t i = lo; i < hi; i++) {
          leaf[i] = values[k];
          len[i] = static_cast<uint8_t>(l);
        }
        code++;
        k++;
      }
      code <<= 1;
    }
    return true;
  }

  // Decode one symbol AND its ssss mantissa bits from a single refill:
  // code (<=16 bits) + mantissa (<=16 bits) fit the 57-bit cache.
  // Returns ssss (<0 on invalid code) and the raw mantissa via *mant
  // (ssss==16 reads no bits per T.81 lossless).
  inline int decode_with_mant(BitReader& br, int* mant) const {
    br.refill();
    uint32_t win = static_cast<uint32_t>(br.buf >> 48);
    int l = len[win];
    if (l == 0) return -1;
    int ssss = leaf[win];
    if (ssss > 16) return -1;  // not a T.81 lossless category (corrupt DHT)
    if (ssss == 0 || ssss == 16) {
      br.advance(l);
      *mant = 0;
      return ssss;
    }
    *mant = static_cast<int>((br.buf << l) >> (64 - ssss));
    br.advance(l + ssss);
    return ssss;
  }
};

inline int extend(int v, int ssss) {
  // T.81 F.2.2.1 EXTEND: sign extension of magnitude bits.
  if (ssss == 0) return 0;
  if (ssss == 16) return 32768;  // special: diff = 32768, no bits read
  if (v < (1 << (ssss - 1))) return v - (1 << ssss) + 1;
  return v;
}

}  // namespace

extern "C" {

// Decode an LJ92 stream into out[h*w] u16. Returns 0 on success, negative
// error codes otherwise. Outputs frame dims/components via pointers when
// out == nullptr (probe mode).
int lj92_decode(const uint8_t* data, int64_t len, uint16_t* out,
                int64_t out_cap, int* out_w, int* out_h, int* out_comps,
                int* out_prec) {
  const uint8_t* p = data;
  const uint8_t* end = data + len;
  if (len < 4 || p[0] != 0xFF || p[1] != 0xD8) return -1;  // SOI
  p += 2;

  int precision = 0, height = 0, width = 0, ncomp = 0;
  // DHT specs are recorded during the marker walk; the 128KB-per-table
  // window LUTs build lazily at SOS, and only for a real decode (the
  // probe pass returns dimensions without paying allocation or builds).
  struct HuffSpec { const uint8_t* counts; const uint8_t* values; int nvals; };
  HuffSpec specs[4] = {};
  int huff_built[4] = {0, 0, 0, 0};
  int comp_table[4] = {0, 0, 0, 0};
  int predictor = 1, pt = 0;
  int restart_interval = 0;

  while (p + 4 <= end) {
    if (p[0] != 0xFF) return -2;
    int marker = p[1];
    p += 2;
    if (marker == 0xD8) continue;
    int seglen = (p[0] << 8) | p[1];
    // The declared segment (incl. its own 2 length bytes) must fit the
    // buffer -- every read below stays inside [seg, p + seglen).
    if (seglen < 2 || p + seglen > end) return -2;
    const uint8_t* seg = p + 2;
    const uint8_t* segend = p + seglen;

    if (marker == 0xC3) {  // SOF3
      if (seglen < 8) return -2;
      precision = seg[0];
      height = (seg[1] << 8) | seg[2];
      width = (seg[3] << 8) | seg[4];
      ncomp = seg[5];
      if (ncomp < 1 || ncomp > 4) return -3;
      p += seglen;
    } else if (marker == 0xC4) {  // DHT
      const uint8_t* q = seg;
      while (q < segend) {
        if (q + 17 > segend) return -4;
        int tc_th = *q++;
        int th = tc_th & 0x0F;
        if (th > 3) return -4;
        const uint8_t* counts = q;
        int nvals = 0;
        for (int i = 0; i < 16; i++) nvals += counts[i];
        q += 16;
        if (nvals > 256 || q + nvals > segend) return -4;
        specs[th] = HuffSpec{counts, q, nvals};
        huff_built[th] = 1;
        q += nvals;
      }
      p += seglen;
    } else if (marker == 0xDD) {  // DRI
      if (seglen < 4) return -2;
      restart_interval = (seg[0] << 8) | seg[1];
      p += seglen;
    } else if (marker == 0xDA) {  // SOS
      if (seglen < 3) return -2;
      int ns = seg[0];
      if (ns != ncomp) return -5;
      if (seglen < 6 + 2 * ns) return -2;
      for (int i = 0; i < ns; i++) {
        comp_table[i] = seg[1 + i * 2 + 1] >> 4;
        if (!huff_built[comp_table[i]]) return -6;
      }
      predictor = seg[1 + ns * 2];
      pt = seg[3 + ns * 2] & 0x0F;
      p += seglen;

      if (out_w) *out_w = width * ncomp;
      if (out_h) *out_h = height;
      if (out_comps) *out_comps = ncomp;
      if (out_prec) *out_prec = precision;
      if (out == nullptr) return 0;  // probe only
      if ((int64_t)height * width * ncomp > out_cap) return -7;

      // Heap, not stack (decoders run inside thread pools with default
      // stacks); build only the tables this scan uses.
      std::unique_ptr<Huff[]> huffs_owner(new Huff[4]);
      Huff* huffs = huffs_owner.get();
      int lut_built[4] = {0, 0, 0, 0};
      for (int i = 0; i < ns; i++) {
        int th = comp_table[i];
        if (!lut_built[th]) {
          if (!huffs[th].build(specs[th].counts, specs[th].values,
                               specs[th].nvals))
            return -4;
          lut_built[th] = 1;
        }
      }

      BitReader br(p, end);
      int default_val = 1 << (precision - pt - 1);
      int64_t row_stride = (int64_t)width * ncomp;

      // T.81: prediction resets at scan start AND after every restart
      // marker -- the interval's first line predicts like the first line.
      bool fresh = true;
      for (int y = 0; y < height; y++) {
        uint16_t* row = out + (int64_t)y * row_stride;
        const uint16_t* prev = row - row_stride;
        bool first_line = fresh;
        for (int x = 0; x < width; x++) {
          for (int c = 0; c < ncomp; c++) {
            int mant;
            int ssss = huffs[comp_table[c]].decode_with_mant(br, &mant);
            if (ssss < 0) return -8;
            int diff = ssss == 16 ? 32768 : extend(mant, ssss);

            int64_t idx = (int64_t)x * ncomp + c;
            int pred;
            bool row_start = (x == 0);
            if (first_line && row_start) pred = default_val;
            else if (row_start) pred = prev[idx];           // first col: Rb
            else if (first_line) pred = row[idx - ncomp];   // first line: Ra
            else {
              int ra = row[idx - ncomp];
              int rb = prev[idx];
              int rc = prev[idx - ncomp];
              switch (predictor) {
                case 1: pred = ra; break;
                case 2: pred = rb; break;
                case 3: pred = rc; break;
                case 4: pred = ra + rb - rc; break;
                case 5: pred = ra + ((rb - rc) >> 1); break;
                case 6: pred = rb + ((ra - rc) >> 1); break;
                case 7: pred = (ra + rb) >> 1; break;
                default: return -9;
              }
            }
            row[idx] = (uint16_t)((pred + diff) & 0xFFFF);
          }
        }
        fresh = false;
        if (restart_interval && ((y + 1) % restart_interval) == 0 && y + 1 < height) {
          br.reset_to_marker();
          fresh = true;
        }
      }
      if (pt) {
        int64_t n = (int64_t)height * row_stride;
        for (int64_t i = 0; i < n; i++) out[i] = (uint16_t)(out[i] << pt);
      }
      return 0;
    } else if (marker == 0xD9) {  // EOI
      break;
    } else {
      p += seglen;  // skip APPn/COM/etc
    }
  }
  return -10;
}

}  // extern "C"
