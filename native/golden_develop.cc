// Independent golden implementation of the develop chain, scalar C++.
//
// Mirrors the Rust reference's per-pixel algorithms (same LUT mechanisms,
// same f32 order of operations) with no code shared with the JAX framework:
// tests/test_golden.py develops the same RAW through both and asserts <=1 LSB
// agreement -- the cross-implementation contract SURVEY.md section 4 calls
// for (the Rust toolchain is absent in this image, so this stands in as the
// independent native implementation).
//
// Usage: golden_develop <in.bin> <out.bin>
//   in.bin:  magic "IPGD", u32 width, height; u32 cfa_h, cfa_w;
//            char cfa[cfa_h*cfa_w] pattern letters (RGBE);
//            f32 black, range; f32 mul[4]; f32 cmatrix[3][4] row-major;
//            u32 n_knots; f32 xs[16], ys[16], c1[16], c2[16], c3[16];
//            u16 data[width*height]
//   out.bin: u8 rgb[width*height*3] interleaved

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

struct Lut {
  float maxv;
  std::vector<float> table;
  float (*fn)(float);
  void init(int maxbits, float (*f)(float)) {
    int max = (1 << maxbits) - 1;
    maxv = (float)max;
    fn = f;
    table.resize(max + 2);
    for (int i = 0; i <= max + 1; i++) table[i] = f((float)i / (float)max);
  }
  inline float lookup(float v) const {
    if (v < 0.0f || v > 1.0f) return fn(v);
    float pos = v * maxv;
    int key = (int)pos;
    float a = pos - std::trunc(pos);
    return table[key] + a * (table[key + 1] - table[key]);
  }
};

static float xyz_lab_f(float v) {
  const float e = 216.0f / 24389.0f, k = 24389.0f / 27.0f;
  return v > e ? std::cbrt(v) : (k * v + 16.0f) / 116.0f;
}
static float srgb_apply_f(float v) {
  return v < 0.0031308f ? v * 12.92f : 1.055f * std::pow(v, 1.0f / 2.4f) - 0.055f;
}

static Lut LAB_LUT, GAMMA_LUT;

// Runtime 3x3 inverse by adjugate in f32 (color_conversions.rs:20-39).
static void inverse33(const float m[3][3], float out[3][3]) {
  float invdet =
      1.0f / (m[0][0] * (m[1][1] * m[2][2] - m[2][1] * m[1][2]) -
              m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0]) +
              m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0]));
  out[0][0] = (m[1][1] * m[2][2] - m[2][1] * m[1][2]) * invdet;
  out[0][1] = -(m[0][1] * m[2][2] - m[0][2] * m[2][1]) * invdet;
  out[0][2] = (m[0][1] * m[1][2] - m[0][2] * m[1][1]) * invdet;
  out[1][0] = -(m[1][0] * m[2][2] - m[1][2] * m[2][0]) * invdet;
  out[1][1] = (m[0][0] * m[2][2] - m[0][2] * m[2][0]) * invdet;
  out[1][2] = -(m[0][0] * m[1][2] - m[1][0] * m[0][2]) * invdet;
  out[2][0] = (m[1][0] * m[2][1] - m[2][0] * m[1][1]) * invdet;
  out[2][1] = -(m[0][0] * m[2][1] - m[2][0] * m[0][1]) * invdet;
  out[2][2] = (m[0][0] * m[1][1] - m[1][0] * m[0][1]) * invdet;
}

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: golden_develop <in.bin> <out.bin>\n");
    return 1;
  }
  FILE* f = std::fopen(argv[1], "rb");
  if (!f) return 2;
  char magic[4];
  uint32_t W = 0, H = 0, cfa_h = 0, cfa_w = 0;
  char cfa[145] = {0};
  float black, range, mul[4], cmatrix[3][4];
  uint32_t n_knots;
  float xs[16], ys[16], c1s[16], c2s[16], c3s[16];
  if (std::fread(magic, 1, 4, f) != 4 || std::memcmp(magic, "IPGD", 4)) return 3;
  std::fread(&W, 4, 1, f);
  std::fread(&H, 4, 1, f);
  std::fread(&cfa_h, 4, 1, f);
  std::fread(&cfa_w, 4, 1, f);
  if (cfa_h * cfa_w > 144) return 3;
  std::fread(cfa, 1, cfa_h * cfa_w, f);
  std::fread(&black, 4, 1, f);
  std::fread(&range, 4, 1, f);
  std::fread(mul, 4, 4, f);
  std::fread(cmatrix, 4, 12, f);
  std::fread(&n_knots, 4, 1, f);
  std::fread(xs, 4, 16, f);
  std::fread(ys, 4, 16, f);
  std::fread(c1s, 4, 16, f);
  std::fread(c2s, 4, 16, f);
  std::fread(c3s, 4, 16, f);
  std::vector<uint16_t> raw((size_t)W * H);
  if (std::fread(raw.data(), 2, raw.size(), f) != raw.size()) return 4;
  std::fclose(f);

  LAB_LUT.init(13, xyz_lab_f);
  GAMMA_LUT.init(13, srgb_apply_f);

  // CFA pattern (any period up to 12x12; expanded to the 48x48 lookup).
  auto color_of = [](char ch) { return ch == 'R' ? 0 : ch == 'G' ? 1 : ch == 'B' ? 2 : 3; };
  uint8_t cfa_pat[12][12];
  for (uint32_t r = 0; r < cfa_h; r++)
    for (uint32_t c = 0; c < cfa_w; c++)
      cfa_pat[r][c] = (uint8_t)color_of(cfa[r * cfa_w + c]);
  auto color_at = [&](int r, int c) { return cfa_pat[r % cfa_h][c % cfa_w]; };

  static const int offs[9][2] = {{-1, -1}, {-1, 0}, {-1, 1}, {0, -1}, {0, 0},
                                 {0, 1},   {1, -1}, {1, 0},  {1, 1}};
  static uint8_t lookups[48][48][9];
  for (int r = 0; r < 48; r++)
    for (int c = 0; c < 48; c++) {
      int pix = color_at(r, c);
      for (int i = 0; i < 9; i++) {
        int oc = color_at(r + 48 + offs[i][0], c + 48 + offs[i][1]);
        lookups[r][c][i] = (oc != pix || (offs[i][0] == 0 && offs[i][1] == 0)) ? oc : 4;
      }
    }

  const float srgb[3][3] = {{0.4124564f, 0.3575761f, 0.1804375f},
                            {0.2126729f, 0.7151522f, 0.0721750f},
                            {0.0193339f, 0.1191920f, 0.9503041f}};
  float inv[3][3];
  inverse33(srgb, inv);
  const float xw = 0.95047f, yw = 1.0f, zw = 1.08883f;

  std::vector<float> gf((size_t)W * H);
  std::vector<float> rgbe((size_t)W * H * 4);
  std::vector<uint8_t> out((size_t)W * H * 3);

  // gofloat (gofloat.rs:122-130)
  for (size_t i = 0; i < raw.size(); i++) {
    float v = ((float)raw[i] - black) / range;
    gf[i] = v < 1.0f ? v : 1.0f;
  }
  // demosaic full() (demosaic.rs:67-119)
  for (uint32_t row = 0; row < H; row++) {
    float* pix = &rgbe[(size_t)row * W * 4];
    for (uint32_t col = 0; col < W; col++, pix += 4) {
      const uint8_t* colors = lookups[row % 48][col % 48];
      float sums[5] = {0}, counts[5] = {0};
      for (int i = 0; i < 9; i++) {
        int r = (int)row + offs[i][0], c = (int)col + offs[i][1];
        if (r >= 0 && r < (int)H && c >= 0 && c < (int)W) {
          sums[colors[i]] += gf[(size_t)r * W + c];
          counts[colors[i]] += 1.0f;
        }
      }
      for (int c = 0; c < 4; c++) pix[c] = counts[c] > 0 ? sums[c] / counts[c] : 0.0f;
    }
  }
  // tolab + basecurve + fromlab + gamma + quantize per pixel
  for (size_t p = 0; p < (size_t)W * H; p++) {
    const float* in = &rgbe[p * 4];
    float r = std::fmin(in[0] * mul[0], 1.0f), g = std::fmin(in[1] * mul[1], 1.0f);
    float b = std::fmin(in[2] * mul[2], 1.0f), e = std::fmin(in[3] * mul[3], 1.0f);
    float x = r * cmatrix[0][0] + g * cmatrix[0][1] + b * cmatrix[0][2] + e * cmatrix[0][3];
    float y = r * cmatrix[1][0] + g * cmatrix[1][1] + b * cmatrix[1][2] + e * cmatrix[1][3];
    float z = r * cmatrix[2][0] + g * cmatrix[2][1] + b * cmatrix[2][2] + e * cmatrix[2][3];
    float fx = LAB_LUT.lookup(x / xw), fy = LAB_LUT.lookup(y / yw), fz = LAB_LUT.lookup(z / zw);
    float L = (116.0f * fy - 16.0f) / 100.0f;
    float A = (500.0f * (fx - fy) + 127.0f) / 255.0f;
    float B = (200.0f * (fy - fz) + 127.0f) / 255.0f;
    // basecurve (curves.rs:126-157): clamp to knot range, binary search
    if (n_knots > 0) {
      float v = L;
      if (v >= xs[n_knots - 1]) L = ys[n_knots - 1];
      else if (v <= xs[0]) L = ys[0];
      else {
        int lo = 0, hi = (int)n_knots - 2, idx = 0;
        while (lo <= hi) {
          int mid = (lo + hi) / 2;
          if (xs[mid] < v) { idx = mid; lo = mid + 1; }
          else hi = mid - 1;
        }
        float d = v - xs[idx];
        L = ys[idx] + c1s[idx] * d + c2s[idx] * d * d + c3s[idx] * d * d * d;
      }
    }
    float cl = L * 100.0f, ca = A * 255.0f - 127.0f, cb = B * 255.0f - 127.0f;
    float fy2 = (cl + 16.0f) / 116.0f, fx2 = ca / 500.0f + fy2, fz2 = fy2 - cb / 200.0f;
    const float eps = 216.0f / 24389.0f, kap = 24389.0f / 27.0f;
    float fx3 = fx2 * fx2 * fx2, fz3 = fz2 * fz2 * fz2;
    float xr = fx3 > eps ? fx3 : (116.0f * fx2 - 16.0f) / kap;
    float yr = cl > kap * eps ? fy2 * fy2 * fy2 : cl / kap;
    float zr = fz3 > eps ? fz3 : (116.0f * fz2 - 16.0f) / kap;
    x = xr * xw; y = yr * yw; z = zr * zw;
    float rr = x * inv[0][0] + y * inv[0][1] + z * inv[0][2];
    float gg = x * inv[1][0] + y * inv[1][1] + z * inv[1][2];
    float bb = x * inv[2][0] + y * inv[2][1] + z * inv[2][2];
    auto q = [&](float v) {
      v = GAMMA_LUT.lookup(std::fmax(0.0f, std::fmin(1.0f, v))) * 256.0f;
      return (uint8_t)std::fmax(0.0f, std::fmin(255.0f, v));
    };
    out[p * 3 + 0] = q(rr);
    out[p * 3 + 1] = q(gg);
    out[p * 3 + 2] = q(bb);
  }

  FILE* fo = std::fopen(argv[2], "wb");
  if (!fo) return 5;
  std::fwrite(out.data(), 1, out.size(), fo);
  std::fclose(fo);
  return 0;
}
