// LZ4-block-format codec for replay-buffer pixel compression.
//
// Native counterpart of the reference's lz4 dependency (reference:
// active_inference_diffusion/utils/buffers.py:9,113-138 compresses pixel
// observations with the lz4 C library through its Python binding). This is a
// from-scratch implementation of the LZ4 block format (compatible with
// standard LZ4 block decoders): greedy hash-chain matcher, 16-byte literal
// runs, minimum match 4, offset <= 65535.
//
// Exposed C ABI (ctypes): aid_compress_bound, aid_compress, aid_decompress.

#include <cstdint>
#include <cstring>
#include <cstddef>

extern "C" {

size_t aid_compress_bound(size_t src_size) {
  // worst case: incompressible data — LZ4 bound formula
  return src_size + src_size / 255 + 16;
}

// Compress src[0..src_size) into dst (capacity dst_cap).
// Returns compressed size, or 0 on failure (dst too small).
size_t aid_compress(const uint8_t* src, size_t src_size, uint8_t* dst,
                    size_t dst_cap) {
  if (src_size == 0) return 0;
  const size_t kMinMatch = 4;
  const size_t kHashLog = 16;
  const size_t kHashSize = 1u << kHashLog;
  // last 5 bytes must be literals (LZ4 spec); matches must not reach them
  const size_t kLastLiterals = 5;
  const size_t kMFLimit = kMinMatch + kLastLiterals + 3;

  static thread_local int32_t table[kHashSize];
  for (size_t i = 0; i < kHashSize; ++i) table[i] = -1;

  auto hash4 = [](const uint8_t* p) -> uint32_t {
    uint32_t v;
    std::memcpy(&v, p, 4);
    return (v * 2654435761u) >> (32 - kHashLog);
  };

  size_t ip = 0;        // input position
  size_t anchor = 0;    // start of pending literals
  size_t op = 0;        // output position

  auto emit_sequence = [&](size_t literal_len, size_t match_len,
                           size_t offset) -> bool {
    // token
    size_t ml = match_len - kMinMatch;
    uint8_t token = (uint8_t)((literal_len < 15 ? literal_len : 15) << 4) |
                    (uint8_t)(ml < 15 ? ml : 15);
    if (op + 1 > dst_cap) return false;
    dst[op++] = token;
    // extended literal length
    if (literal_len >= 15) {
      size_t rem = literal_len - 15;
      while (rem >= 255) {
        if (op >= dst_cap) return false;
        dst[op++] = 255;
        rem -= 255;
      }
      if (op >= dst_cap) return false;
      dst[op++] = (uint8_t)rem;
    }
    // literals
    if (op + literal_len > dst_cap) return false;
    std::memcpy(dst + op, src + anchor, literal_len);
    op += literal_len;
    // offset (little-endian 16-bit)
    if (op + 2 > dst_cap) return false;
    dst[op++] = (uint8_t)(offset & 0xff);
    dst[op++] = (uint8_t)(offset >> 8);
    // extended match length
    if (ml >= 15) {
      size_t rem = ml - 15;
      while (rem >= 255) {
        if (op >= dst_cap) return false;
        dst[op++] = 255;
        rem -= 255;
      }
      if (op >= dst_cap) return false;
      dst[op++] = (uint8_t)rem;
    }
    return true;
  };

  if (src_size >= kMFLimit) {
    const size_t match_limit = src_size - kLastLiterals;
    while (ip + kMFLimit <= src_size) {
      uint32_t h = hash4(src + ip);
      int32_t cand = table[h];
      table[h] = (int32_t)ip;
      if (cand >= 0 && (size_t)(ip - cand) <= 65535 &&
          std::memcmp(src + cand, src + ip, kMinMatch) == 0) {
        // extend match
        size_t match_len = kMinMatch;
        while (ip + match_len < match_limit &&
               src[cand + match_len] == src[ip + match_len]) {
          ++match_len;
        }
        if (!emit_sequence(ip - anchor, match_len, ip - cand)) return 0;
        ip += match_len;
        anchor = ip;
      } else {
        ++ip;
      }
    }
  }

  // final literals
  size_t literal_len = src_size - anchor;
  uint8_t token = (uint8_t)((literal_len < 15 ? literal_len : 15) << 4);
  if (op + 1 > dst_cap) return 0;
  dst[op++] = token;
  if (literal_len >= 15) {
    size_t rem = literal_len - 15;
    while (rem >= 255) {
      if (op >= dst_cap) return 0;
      dst[op++] = 255;
      rem -= 255;
    }
    if (op >= dst_cap) return 0;
    dst[op++] = (uint8_t)rem;
  }
  if (op + literal_len > dst_cap) return 0;
  std::memcpy(dst + op, src + anchor, literal_len);
  op += literal_len;
  return op;
}

// Decompress LZ4 block src[0..src_size) into dst of exactly dst_size bytes.
// Returns dst_size on success, 0 on malformed input.
size_t aid_decompress(const uint8_t* src, size_t src_size, uint8_t* dst,
                      size_t dst_size) {
  size_t ip = 0, op = 0;
  while (ip < src_size) {
    uint8_t token = src[ip++];
    // literals
    size_t literal_len = token >> 4;
    if (literal_len == 15) {
      uint8_t b;
      do {
        if (ip >= src_size) return 0;
        b = src[ip++];
        literal_len += b;
      } while (b == 255);
    }
    if (ip + literal_len > src_size || op + literal_len > dst_size) return 0;
    std::memcpy(dst + op, src + ip, literal_len);
    ip += literal_len;
    op += literal_len;
    if (ip >= src_size) break;  // last sequence has no match
    // offset
    if (ip + 2 > src_size) return 0;
    size_t offset = src[ip] | ((size_t)src[ip + 1] << 8);
    ip += 2;
    if (offset == 0 || offset > op) return 0;
    // match length
    size_t match_len = (token & 0x0f);
    if (match_len == 15) {
      uint8_t b;
      do {
        if (ip >= src_size) return 0;
        b = src[ip++];
        match_len += b;
      } while (b == 255);
    }
    match_len += 4;
    if (op + match_len > dst_size) return 0;
    // overlapping copy must be byte-wise
    for (size_t i = 0; i < match_len; ++i) {
      dst[op + i] = dst[op - offset + i];
    }
    op += match_len;
  }
  return op == dst_size ? op : 0;
}

// Decompress n LZ4 blocks into one contiguous destination array:
// block i -> dst[i*item_size .. (i+1)*item_size). One call per sampled
// replay batch instead of one ctypes round trip per item (the Python-loop
// overhead dominates the decode at replay batch sizes).
// Returns the number of blocks decoded successfully; == n on success
// (stops at the first malformed block).
size_t aid_decompress_batch(const uint8_t* const* srcs,
                            const size_t* src_sizes, size_t n, uint8_t* dst,
                            size_t item_size) {
  for (size_t i = 0; i < n; ++i) {
    if (aid_decompress(srcs[i], src_sizes[i], dst + i * item_size,
                       item_size) != item_size) {
      return i;
    }
  }
  return n;
}

}  // extern "C"
