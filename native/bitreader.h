// Shared MSB-first bit reader over a left-aligned 64-bit cache.
//
// One (up to) 8-byte refill serves several fields instead of eight
// bounds-checked byte loads per peek (the naive reader this replaces in
// nikon.cc / olympus.cc / pentax.cc; fujic.cc pioneered the pattern).
// Semantics are identical to the per-call reader:
//   - peek(n<=57): the next n bits, zero-padded past the stream end;
//   - skip(n): consume n bits; `overrun` trips the moment the consumed
//     count crosses the end (same condition as pos > nbytes*8);
//   - get(n): peek+skip, n<=57 (n<=0 returns 0).
// Every decoder using this is pinned bit-identical to its pure-Python
// walker by a differential fuzz test (tests/test_{nikon,olympus,pentax}.py).

#ifndef IMAGEPIPE_NATIVE_BITREADER_H_
#define IMAGEPIPE_NATIVE_BITREADER_H_

#include <cstdint>

namespace imagepipe {

struct CachedBitReader {
  const uint8_t* data;
  int64_t nbytes;
  uint64_t buf = 0;      // left-aligned cache
  int navail = 0;        // bits in buf (incl. zero padding past the end)
  int64_t next_byte = 0;
  int64_t consumed = 0;  // bits consumed so far
  bool overrun = false;

  inline void refill() {
    while (navail <= 56) {
      uint64_t b = next_byte < nbytes ? data[next_byte] : 0;
      next_byte++;
      buf |= b << (56 - navail);
      navail += 8;
    }
  }

  // Peek `n` (1..57) bits, zero-padded past the end.
  inline uint64_t peek(int n) {
    refill();
    return buf >> (64 - n);
  }

  // Consume `n` bits. Callers only skip bits they just peeked (n <= 57),
  // so navail stays non-negative.
  inline void skip(int n) {
    buf <<= n;
    navail -= n;
    consumed += n;
    if (consumed > nbytes * 8) overrun = true;
  }

  inline uint32_t get(int n) {
    if (n <= 0) return 0;
    uint64_t v = peek(n);
    skip(n);
    return static_cast<uint32_t>(v);
  }
};

}  // namespace imagepipe

#endif  // IMAGEPIPE_NATIVE_BITREADER_H_
