// Fujifilm lossless-compressed RAF decoder (fast path for
// imagepipe_tpu/fujic.py; the 16-byte header and stripe size table are
// parsed host-side).
//
// Mirrors the public libraw/RawSpeed `fuji_compressed` semantics the
// Python reference implementation documents: per stripe, bands of 6 raw
// rows decode as 12 color lines in six fixed passes of interleaved
// even/odd samples (odd lags even by 8); per sample a same-color
// neighborhood gives a predictor and a quantized-gradient context, the
// residual is unary+adaptive-mantissa coded (escape to a raw value),
// wrapped modulo total_values; 1 in 4 even positions of most X-Trans
// R/B lines is reproduced by gradient-median interpolation instead.
// Must stay bit-identical to fujic.py's Python walker
// (tests/test_fujic.py runs a differential fuzz across both).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kLTotal = 18;
// Line indices: R0..R4 = 0..4, G0..G7 = 5..12, B0..B4 = 13..17.
constexpr int R2 = 2, R3 = 3, R4 = 4;
constexpr int G2 = 7, G3 = 8, G4 = 9, G5 = 10, G6 = 11, G7 = 12;
constexpr int B2 = 15, B3 = 16, B4 = 17;

// MSB-first reader over a left-aligned 64-bit cache: one (up to)
// 8-byte refill serves several fields instead of a load per bit. Bits
// past the stream end read as zeros but trip `bad` the moment the
// consumed count crosses the end — the same streams fail as with the
// per-bit reference reader (1-bits only exist inside the stream, so a
// zero-run never terminates spuriously in the padding).
struct BitReader {
  const uint8_t* data;
  int64_t nbits;
  uint64_t buf = 0;   // left-aligned
  int navail = 0;     // bits in buf (incl. zero padding past the end)
  int64_t next_byte = 0;
  int64_t consumed = 0;
  bool bad = false;

  inline void refill() {
    int64_t nbytes = (nbits + 7) >> 3;
    while (navail <= 56) {
      uint64_t b = next_byte < nbytes ? data[next_byte] : 0;
      next_byte++;
      buf |= b << (56 - navail);
      navail += 8;
    }
  }

  inline void advance(int n) {
    buf = n >= 64 ? 0 : buf << n;
    navail -= n;
    consumed += n;
    if (consumed > nbits) bad = true;
  }

  int zerobits() {
    int total = 0;
    while (true) {
      refill();
      if (buf != 0) {
        int n = __builtin_clzll(buf);
        total += n;
        advance(n + 1);  // the zeros and their terminating 1
        if (bad || total > 1024) {
          bad = true;
          return 0;
        }
        return total;
      }
      // All cached bits are zero (buf's low 64-navail bits are clear by
      // construction): consume them and keep counting.
      total += navail;
      advance(navail);
      if (bad || total > 1024) {
        bad = true;
        return 0;
      }
    }
  }

  uint32_t read(int n) {
    if (n <= 0) return 0;
    refill();
    uint32_t v = static_cast<uint32_t>(buf >> (64 - n));
    advance(n);
    return v;
  }
};

struct Params {
  int raw_bits;
  int q1, q2, q3, q4;
  int total_values;
  int max_bits;
  int max_diff;
  int line_width;

  int quant(int v) const {
    if (v <= -q3) return -4;
    if (v <= -q2) return -3;
    if (v <= -q1) return -2;
    if (v < 0) return -1;
    if (v == 0) return 0;
    if (v < q1) return 1;
    if (v < q2) return 2;
    if (v < q3) return 3;
    return 4;
  }
};

inline int bit_diff(int v1, int v2) {
  int dec = 0;
  if (v2 < v1) {
    while (dec <= 12) {
      dec++;
      if ((v2 << dec) >= v1) break;
    }
  }
  return dec;
}

struct Grad {
  int value1;
  int value2;
};

struct Block {
  const Params* p;
  uint16_t* linebuf[kLTotal];  // each line_width + 2
  Grad grad_even[3][41];
  Grad grad_odd[3][41];
  BitReader* br;

  void even_context(int line, int pos, int* grad, int* base) const {
    const uint16_t* up = linebuf[line - 1];
    const uint16_t* up2 = linebuf[line - 2];
    int Rb = up[1 + pos];
    int Rc = up[pos];
    int Rd = up[2 + pos];
    int Rf = up2[1 + pos];
    *grad = 9 * p->quant(Rb - Rf) + p->quant(Rc - Rb);
    int d_cb = Rc > Rb ? Rc - Rb : Rb - Rc;
    int d_fb = Rf > Rb ? Rf - Rb : Rb - Rf;
    int d_db = Rd > Rb ? Rd - Rb : Rb - Rd;
    int interp;
    if (d_cb > d_fb && d_cb > d_db)
      interp = Rf + Rd + 2 * Rb;
    else if (d_db > d_cb && d_db > d_fb)
      interp = Rf + Rc + 2 * Rb;
    else
      interp = Rd + Rc + 2 * Rb;
    *base = interp >> 2;
  }

  void odd_context(int line, int pos, int* grad, int* base) const {
    const uint16_t* cur = linebuf[line];
    const uint16_t* up = linebuf[line - 1];
    int Ra = cur[pos];
    int Rb = up[1 + pos];
    int Rc = up[pos];
    int Rd = up[2 + pos];
    int Rg = cur[2 + pos];
    *grad = 9 * p->quant(Rb - Rc) + p->quant(Rc - Ra);
    if ((Rb > Rc && Rb > Rd) || (Rb < Rc && Rb < Rd))
      *base = (Rg + Ra + 2 * Rb) >> 2;
    else
      *base = (Ra + Rg) >> 1;
  }

  bool decode_sample(int line, int pos, Grad* grads, bool odd) {
    int grad, base;
    if (odd)
      odd_context(line, pos, &grad, &base);
    else
      even_context(line, pos, &grad, &base);
    int gradient = grad < 0 ? -grad : grad;
    int sample = br->zerobits();
    if (br->bad) return false;
    int code;
    if (sample < p->max_bits - p->raw_bits - 1) {
      int dec_bits = bit_diff(grads[gradient].value1, grads[gradient].value2);
      code = (sample << dec_bits) + static_cast<int>(br->read(dec_bits));
    } else {
      code = static_cast<int>(br->read(p->raw_bits)) + 1;
    }
    if (br->bad || code < 0 || code >= p->total_values) return false;
    int code_signed = (code & 1) ? (-1 - code / 2) : (code / 2);
    Grad* g = &grads[gradient];
    g->value1 += code_signed < 0 ? -code_signed : code_signed;
    if (g->value2 == 0x40) {
      g->value1 >>= 1;
      g->value2 >>= 1;
    }
    g->value2++;
    int val = grad < 0 ? base - code_signed : base + code_signed;
    if (val < 0)
      val += p->total_values;
    else if (val > p->q4)
      val -= p->total_values;
    if (val < 0) val = 0;
    if (val > p->q4) val = p->q4;
    linebuf[line][1 + pos] = static_cast<uint16_t>(val);
    return true;
  }

  void interpolate_even(int line, int pos) {
    int grad, base;
    even_context(line, pos, &grad, &base);
    linebuf[line][1 + pos] = static_cast<uint16_t>(base);
  }

  void extend(int line) {
    int lw = p->line_width;
    linebuf[line][0] = linebuf[line - 1][1];
    linebuf[line][lw + 1] = linebuf[line - 1][lw];
  }

  void rotate() {
    int bytes = (p->line_width + 2) * sizeof(uint16_t);
    std::memcpy(linebuf[0], linebuf[R3], bytes);
    std::memcpy(linebuf[1], linebuf[R4], bytes);
    std::memcpy(linebuf[5], linebuf[G6], bytes);
    std::memcpy(linebuf[6], linebuf[G7], bytes);
    std::memcpy(linebuf[13], linebuf[B3], bytes);
    std::memcpy(linebuf[14], linebuf[B4], bytes);
  }
};

struct Pass {
  int c0, c1, gset, interp_line, interp_mask;
};

bool walk_band(Block* blk, bool xtrans) {
  const Pass xt[6] = {
      {R2, G2, 0, -1, 0}, {G3, B2, 1, B2, 0}, {R3, G4, 2, R3, 0},
      {G5, B3, 0, B3, 2}, {R4, G6, 1, R4, 2}, {G7, B4, 2, B4, 0},
  };
  const Pass by[6] = {
      {R2, G2, 0, -1, 0}, {G3, B2, 1, -1, 0}, {R3, G4, 2, -1, 0},
      {G5, B3, 0, -1, 0}, {R4, G6, 1, -1, 0}, {G7, B4, 2, -1, 0},
  };
  const Pass* passes = xtrans ? xt : by;
  const int lw = blk->p->line_width;
  for (int pi = 0; pi < 6; pi++) {
    const Pass& ps = passes[pi];
    int even[2] = {0, 0};
    int odd[2] = {1, 1};
    Grad* ge = blk->grad_even[ps.gset];
    Grad* go = blk->grad_odd[ps.gset];
    const int lines[2] = {ps.c0, ps.c1};
    while (even[1] < lw || odd[1] < lw) {
      if (even[1] < lw) {
        for (int k = 0; k < 2; k++) {
          int line = lines[k];
          if (line == ps.interp_line && (even[k] & 3) == ps.interp_mask) {
            blk->interpolate_even(line, even[k]);
          } else {
            if (!blk->decode_sample(line, even[k], ge, false)) return false;
          }
          even[k] += 2;
        }
      }
      if (even[1] > 8) {
        for (int k = 0; k < 2; k++) {
          if (!blk->decode_sample(lines[k], odd[k], go, true)) return false;
          odd[k] += 2;
        }
      }
    }
    blk->extend(ps.c0);
    blk->extend(ps.c1);
  }
  return true;
}

inline int64_t xtrans_index(int64_t pc) {
  return (((pc * 2 / 3) & ~1ll) | (pc % 3 & 1)) + ((pc % 3) >> 1);
}

void copy_band(const Block* blk, uint16_t* out, int raw_width,
               int raw_height, int band, int col0, int block_width,
               const int8_t* grid, int gh, int gw, bool xtrans) {
  for (int r = 0; r < 6; r++) {
    int row = band * 6 + r;
    if (row >= raw_height) break;
    const int8_t* grow = grid + (row % gh) * gw;
    uint16_t* orow = out + static_cast<int64_t>(row) * raw_width + col0;
    for (int pc = 0; pc < block_width; pc++) {
      int color = grow[(col0 + pc) % gw];
      int line;
      if (color == 0)
        line = R2 + (r >> 1);
      else if (color == 1)
        line = G2 + r;
      else
        line = B2 + (r >> 1);
      int64_t idx = xtrans ? xtrans_index(pc) : (pc >> 1);
      orow[pc] = blk->linebuf[line][1 + idx];
    }
  }
}

}  // namespace

extern "C" int fuji_decode(const uint8_t* streams, int64_t nbytes,
                           const uint32_t* sizes, int blocks_in_row,
                           int raw_type, int raw_bits, int raw_width,
                           int raw_height, int block_size, int total_lines,
                           const int8_t* grid, int gh, int gw,
                           uint16_t* out) {
  if (raw_width <= 0 || raw_height <= 0 || blocks_in_row <= 0 ||
      block_size <= 0 || total_lines <= 0 || gh <= 0 || gw <= 0)
    return 1;
  bool xtrans = raw_type == 16;
  Params p;
  p.raw_bits = raw_bits;
  p.q1 = 0x12;
  p.q2 = 0x43;
  p.q3 = 0x114;
  p.q4 = (1 << raw_bits) - 1;
  p.total_values = p.q4 + 1;
  int bl = 0;
  while ((1 << bl) < p.total_values) bl++;
  p.max_bits = 4 * bl;
  p.max_diff = p.total_values + 0x20 > 128 ? (p.total_values + 0x20) >> 6 : 2;
  if (p.max_diff < 2) p.max_diff = 2;
  p.line_width = xtrans ? (block_size * 2) / 3 : (block_size >> 1);
  if (p.line_width <= 8) return 2;

  const int lsz = p.line_width + 2;

  // Per-stripe offsets (streams are concatenated in order).
  std::vector<int64_t> offs(blocks_in_row);
  int64_t off = 0;
  for (int b = 0; b < blocks_in_row; b++) {
    offs[b] = off;
    off += sizes[b];
    if (off > nbytes) return 3;
  }

  // Stripes are fully independent (own bitstream, state, and disjoint
  // output columns) — decode them in parallel.
  std::vector<int> rcs(blocks_in_row, 0);
  auto run_stripe = [&](int b) {
    BitReader br{streams + offs[b],
                 static_cast<int64_t>(sizes[b]) * 8};
    Block blk;
    blk.p = &p;
    blk.br = &br;
    std::vector<uint16_t> pool(kLTotal * lsz, 0);
    for (int i = 0; i < kLTotal; i++) blk.linebuf[i] = pool.data() + i * lsz;
    for (int s = 0; s < 3; s++)
      for (int g = 0; g < 41; g++) {
        blk.grad_even[s][g] = {p.max_diff, 1};
        blk.grad_odd[s][g] = {p.max_diff, 1};
      }
    int col0 = b * block_size;
    int block_width =
        block_size < raw_width - col0 ? block_size : raw_width - col0;
    if (block_width <= 0) {
      rcs[b] = 4;
      return;
    }
    for (int band = 0; band < total_lines; band++) {
      if (!walk_band(&blk, xtrans)) {
        rcs[b] = 5;
        return;
      }
      copy_band(&blk, out, raw_width, raw_height, band, col0, block_width,
                grid, gh, gw, xtrans);
      blk.rotate();
    }
  };

  if (blocks_in_row == 1) {
    run_stripe(0);
  } else {
    std::vector<std::thread> threads;
    threads.reserve(blocks_in_row);
    for (int b = 0; b < blocks_in_row; b++)
      threads.emplace_back(run_stripe, b);
    for (auto& t : threads) t.join();
  }
  for (int b = 0; b < blocks_in_row; b++)
    if (rcs[b]) return rcs[b];
  return 0;
}
