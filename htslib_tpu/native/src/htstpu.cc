// htstpu — native host kernels for the TPU HTS framework.
//
// The reference (samtools/htslib) is single-process C with a pthread worker
// pool fanning out per-block jobs (bgzf.c:1598, thread_pool.c:518).  Here the
// host-side unit is a *batch*: the caller hands us every block of a byte
// range at once and we process them in parallel with a small thread team.
// Ordering is implicit in the batch index, so no serial-number queueing is
// needed.
//
// Exposed via a C ABI for ctypes.  All functions return 0 on success or a
// negative error code.

#include <libdeflate.h>

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kBlockHeader = 18;
constexpr int kBlockFooter = 8;
constexpr size_t kMaxBlock = 0x10000;

int hardware_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n ? static_cast<int>(n) : 2;
}

// Parse one BGZF member header; returns total member size or -1.
int64_t parse_bsize(const uint8_t* p, size_t avail) {
  if (avail < kBlockHeader) return -1;
  if (p[0] != 0x1f || p[1] != 0x8b || !(p[3] & 4)) return -1;
  unsigned xlen = p[10] | (p[11] << 8);
  size_t pos = 12, end = 12 + xlen;
  while (pos + 4 <= end && pos + 4 <= avail) {
    uint8_t si1 = p[pos], si2 = p[pos + 1];
    unsigned slen = p[pos + 2] | (p[pos + 3] << 8);
    if (si1 == 'B' && si2 == 'C' && slen == 2) {
      if (pos + 6 > avail) return -1;
      unsigned bsize = p[pos + 4] | (p[pos + 5] << 8);
      return (int64_t)bsize + 1;
    }
    pos += 4 + slen;
  }
  return -1;
}

template <typename F>
void parallel_for(int64_t n, int nthreads, F&& fn) {
  if (n <= 0) return;
  if (nthreads <= 1 || n == 1) {
    for (int64_t i = 0; i < n; i++) fn(i);
    return;
  }
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1, std::memory_order_relaxed);
      if (i >= n) return;
      fn(i);
    }
  };
  std::vector<std::thread> team;
  int t = std::min<int64_t>(nthreads, n);
  team.reserve(t - 1);
  for (int i = 1; i < t; i++) team.emplace_back(worker);
  worker();
  for (auto& th : team) th.join();
}

}  // namespace

extern "C" {

// Scan BGZF members in [data, data+len).  Writes up to cap entries of
// (coffset, csize, usize).  Returns the number of blocks, or
// -2 truncated / -3 bad magic / -4 overflow(cap).
int64_t htstpu_bgzf_scan(const uint8_t* data, uint64_t len, uint64_t cap,
                         uint64_t* coffsets, uint32_t* csizes,
                         uint32_t* usizes) {
  uint64_t pos = 0;
  int64_t n = 0;
  while (pos + kBlockHeader <= len) {
    int64_t total = parse_bsize(data + pos, len - pos);
    if (total < 0) return -3;
    if (pos + (uint64_t)total > len) return -2;
    if ((uint64_t)n >= cap) return -4;
    uint32_t isize;
    std::memcpy(&isize, data + pos + total - 4, 4);
    coffsets[n] = pos;
    csizes[n] = (uint32_t)total;
    usizes[n] = isize;
    n++;
    pos += total;
  }
  if (pos != len) return -2;
  return n;
}

// Inflate n BGZF members in parallel into `out` at out_offsets[i]
// (the caller computes out_offsets as the exclusive prefix sum of usizes).
// Returns 0, or -(1000+i) for a failure in block i.
int64_t htstpu_inflate_batch(const uint8_t* data, uint64_t len, int64_t n,
                             const uint64_t* coffsets, const uint32_t* csizes,
                             const uint32_t* usizes,
                             const uint64_t* out_offsets, uint8_t* out,
                             int verify_crc, int nthreads) {
  if (nthreads <= 0) nthreads = hardware_threads();
  std::atomic<int64_t> err(0);
  parallel_for(n, nthreads, [&](int64_t i) {
    if (err.load(std::memory_order_relaxed)) return;
    struct libdeflate_decompressor* d = libdeflate_alloc_decompressor();
    const uint8_t* p = data + coffsets[i];
    uint32_t csize = csizes[i], usize = usizes[i];
    // payload bounds: header (with extras) .. footer
    unsigned xlen = p[10] | (p[11] << 8);
    const uint8_t* payload = p + 12 + xlen;
    size_t paylen = csize - (12 + xlen) - kBlockFooter;
    size_t actual = 0;
    enum libdeflate_result r = libdeflate_deflate_decompress(
        d, payload, paylen, out + out_offsets[i], usize, &actual);
    if (r != LIBDEFLATE_SUCCESS || actual != usize) {
      err.store(-(1000 + i), std::memory_order_relaxed);
    } else if (verify_crc) {
      uint32_t want;
      std::memcpy(&want, p + csize - 8, 4);
      uint32_t got = libdeflate_crc32(0, out + out_offsets[i], usize);
      if (got != want) err.store(-(1000 + i), std::memory_order_relaxed);
    }
    libdeflate_free_decompressor(d);
  });
  return err.load();
}

// Compress n chunks (<=0xff00 bytes each) of `data` at in_offsets/in_lens
// into complete BGZF members written at out + i*kMaxBlock; out_lens[i]
// receives each member's size.  level: 1..12 libdeflate, 0 = stored.
int64_t htstpu_deflate_batch(const uint8_t* data, int64_t n,
                             const uint64_t* in_offsets,
                             const uint32_t* in_lens, int level, uint8_t* out,
                             uint32_t* out_lens, int nthreads) {
  if (nthreads <= 0) nthreads = hardware_threads();
  if (level < 0) level = 6;
  std::atomic<int64_t> err(0);
  parallel_for(n, nthreads, [&](int64_t i) {
    if (err.load(std::memory_order_relaxed)) return;
    const uint8_t* in = data + in_offsets[i];
    uint32_t ilen = in_lens[i];
    uint8_t* dst = out + (uint64_t)i * kMaxBlock;
    size_t csize = 0;
    struct libdeflate_compressor* c =
        libdeflate_alloc_compressor(level == 0 ? 0 : level);
    csize = libdeflate_deflate_compress(c, in, ilen, dst + kBlockHeader,
                                        kMaxBlock - kBlockHeader - kBlockFooter);
    libdeflate_free_compressor(c);
    if (csize == 0) {
      err.store(-(2000 + i), std::memory_order_relaxed);
      return;
    }
    uint32_t total = (uint32_t)(csize + kBlockHeader + kBlockFooter);
    // header (bgzf.c:70-90 layout)
    static const uint8_t magic[16] = {0x1f, 0x8b, 0x08, 0x04, 0, 0, 0, 0,
                                      0,    0xff, 0x06, 0x00, 'B', 'C', 2, 0};
    std::memcpy(dst, magic, 16);
    uint16_t bsize = (uint16_t)(total - 1);
    std::memcpy(dst + 16, &bsize, 2);
    uint32_t crc = libdeflate_crc32(0, in, ilen);
    std::memcpy(dst + kBlockHeader + csize, &crc, 4);
    std::memcpy(dst + kBlockHeader + csize + 4, &ilen, 4);
    out_lens[i] = total;
  });
  return err.load();
}

// Walk BAM records over an uncompressed byte range starting at `start`
// (i.e. after the header): each record is u32 block_size + block_size
// bytes (sam.c:784 bam_read1 framing).  Writes record offsets (relative to
// data) and lengths (incl. the 4-byte size field).  Returns count or
// -2 truncated / -4 overflow.
int64_t htstpu_bam_scan(const uint8_t* data, uint64_t len, uint64_t start,
                        uint64_t cap, uint64_t* offsets, uint32_t* sizes) {
  uint64_t pos = start;
  int64_t n = 0;
  while (pos + 4 <= len) {
    uint32_t bsz;
    std::memcpy(&bsz, data + pos, 4);
    if (pos + 4 + bsz > len) return -2;
    if (bsz < 32) return -3;
    if ((uint64_t)n >= cap) return -4;
    offsets[n] = pos;
    sizes[n] = bsz + 4;
    n++;
    pos += 4 + (uint64_t)bsz;
  }
  if (pos != len) return -2;
  return n;
}

uint32_t htstpu_crc32(uint32_t crc, const uint8_t* data, uint64_t len) {
  return libdeflate_crc32(crc, data, len);
}

int htstpu_version() { return 1; }

}  // extern "C"
