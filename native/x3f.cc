// Sigma X3F format-6 (SD9/SD10-era Huffman) raw decoder — fast path for
// imagepipe_tpu/x3f.py::decode_x3f_raw; see that module's layout and
// provenance notes (dcraw foveon_sd_load_raw semantics).
//
// Payload: [i16 LE x1024 diff table][u32 LE x1024 code table, entry =
// (len<<27)|code, code in the LOW len bits][continuous bitstream,
// MSB-first per byte; per row the three predictors reset to 0, then per
// pixel three tree walks accumulate pred[c] += diff[leaf]]. Must stay
// bit-identical to the Python reference (differential fuzz in
// tests/test_x3f.py).

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kTableSize = 1024;
constexpr int kMaxCodeLen = 26;

struct Node {
  int child[2] = {-1, -1};
  int leaf = -1;
};

// Builds the decode trie; returns false on a malformed table (length out
// of range, code wider than its length, duplicate or prefix-shadowed
// codes — the same rejections as the Python reference).
bool build_trie(const uint8_t* table, std::vector<Node>* nodes) {
  nodes->clear();
  nodes->emplace_back();
  int ncodes = 0;
  for (int leaf = 0; leaf < kTableSize; leaf++) {
    uint32_t e;
    std::memcpy(&e, table + 4 * leaf, 4);
    const int len = static_cast<int>(e >> 27);
    if (len == 0) continue;
    if (len > kMaxCodeLen) return false;
    const uint32_t code = e & ((1u << 27) - 1);
    if ((code >> len) != 0) return false;  // code wider than its length
    int cur = 0;
    for (int i = len - 1; i >= 0; i--) {
      if ((*nodes)[cur].leaf >= 0) return false;  // shorter code shadows us
      const int bit = (code >> i) & 1;
      int next = (*nodes)[cur].child[bit];
      if (next < 0) {
        next = static_cast<int>(nodes->size());
        (*nodes)[cur].child[bit] = next;
        nodes->emplace_back();
      }
      cur = next;
    }
    Node& n = (*nodes)[cur];
    if (n.leaf >= 0) return false;                     // duplicate code
    if (n.child[0] >= 0 || n.child[1] >= 0) return false;  // we shadow one
    n.leaf = leaf;
    ncodes++;
  }
  return ncodes > 0;
}

}  // namespace

extern "C" int x3f_huffman_decode(const char* payload, int64_t nbytes,
                                  int width, int height, uint16_t* out) {
  if (width <= 0 || height <= 0 || width > 65535 || height > 65535) return 1;
  const int64_t head = 2ll * kTableSize + 4ll * kTableSize;
  if (nbytes < head) return 2;  // payload shorter than its tables
  const uint8_t* data = reinterpret_cast<const uint8_t*>(payload);
  int16_t diffs[kTableSize];
  std::memcpy(diffs, data, 2 * kTableSize);
  std::vector<Node> trie;
  if (!build_trie(data + 2 * kTableSize, &trie)) return 3;
  const uint8_t* bits = data + head;
  const int64_t nbits_total = 8 * (nbytes - head);
  int64_t pos = 0;
  for (int row = 0; row < height; row++) {
    int32_t pred[3] = {0, 0, 0};
    for (int col = 0; col < width; col++) {
      for (int ch = 0; ch < 3; ch++) {
        int cur = 0;
        while (trie[cur].leaf < 0) {
          if (pos >= nbits_total) return 4;  // bitstream truncated
          const int bit = (bits[pos >> 3] >> (7 - (pos & 7))) & 1;
          pos++;
          cur = trie[cur].child[bit];
          if (cur < 0) return 4;  // bit pattern matches no code
        }
        pred[ch] += diffs[trie[cur].leaf];
        if (pred[ch] < 0 || pred[ch] > 0xFFFF) return 5;  // out of u16
        out[(static_cast<int64_t>(row) * width + col) * 3 + ch] =
            static_cast<uint16_t>(pred[ch]);
      }
    }
  }
  return 0;
}
