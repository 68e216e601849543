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
#include <cstdlib>
#include <cstdio>
#include <algorithm>

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
  std::atomic<int64_t> next(0);
  // one decompressor per worker, work-stolen block at a time
  auto worker = [&]() {
    struct libdeflate_decompressor* d = libdeflate_alloc_decompressor();
    for (;;) {
      int64_t i = next.fetch_add(1, std::memory_order_relaxed);
      if (i >= n || err.load(std::memory_order_relaxed)) break;
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
    }
    libdeflate_free_decompressor(d);
  };
  std::vector<std::thread> team;
  int t = std::min<int64_t>(nthreads, n);
  for (int i = 1; i < t; i++) team.emplace_back(worker);
  worker();
  for (auto& th : team) th.join();
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

// ---------------------------------------------------------------------------
// BAM -> SAM text formatting (the sam_format_worker equivalent, batch form)
// ---------------------------------------------------------------------------

namespace {

const char kNt16[] = "=ACMGRSVTWYHKDBN";
const char kCigChar[] = "MIDNSHP=XB??????";

// 256-entry packed-byte -> two-ASCII-base table (portable analogue of the
// reference's SSSE3/NEON nibble2base, simd.c:121-229)
struct Nt16x2 {
  uint16_t t[256];
  Nt16x2() {
    for (int b = 0; b < 256; b++) {
      uint16_t v;
      char two[2] = {kNt16[b >> 4], kNt16[b & 0xF]};
      memcpy(&v, two, 2);
      t[b] = v;
    }
  }
};
const Nt16x2 kNt16x2;

struct NameTable {
  const uint8_t* buf;
  const uint64_t* offs;
  const uint32_t* lens;
  int32_t n_ref;
};

class Buf {
 public:
  Buf() : data_(nullptr), len_(0), cap_(0) {}
  ~Buf() { free(data_); }
  void reserve(size_t need) {
    if (len_ + need <= cap_) return;
    size_t ncap = cap_ ? cap_ * 2 : 1 << 20;
    while (ncap < len_ + need) ncap *= 2;
    data_ = (uint8_t*)realloc(data_, ncap);
    cap_ = ncap;
  }
  inline void put(const void* p, size_t n) {
    reserve(n);
    memcpy(data_ + len_, p, n);
    len_ += n;
  }
  inline void putc(char c) {
    reserve(1);
    data_[len_++] = c;
  }
  // two digits at a time via a 100-entry pair table (kputll-style,
  // reference NEWS:461-462 credits this with +5% BAM->SAM)
  static const char* digit_pairs() {
    static const char p[] =
        "00010203040506070809101112131415161718192021222324"
        "25262728293031323334353637383940414243444546474849"
        "50515253545556575859606162636465666768697071727374"
        "75767778798081828384858687888990919293949596979899";
    return p;
  }
  inline void put_i64(int64_t v) {
    reserve(21);
    if (v < 0) { data_[len_++] = '-'; }
    uint64_t x = v < 0 ? (uint64_t)(-v) : (uint64_t)v;
    const char* dp = digit_pairs();
    char tmp[20];
    int i = 20;
    while (x >= 100) {
      uint64_t r = x % 100;
      x /= 100;
      i -= 2;
      memcpy(tmp + i, dp + 2 * r, 2);
    }
    if (x >= 10) {
      i -= 2;
      memcpy(tmp + i, dp + 2 * x, 2);
    } else {
      tmp[--i] = '0' + (char)x;
    }
    memcpy(data_ + len_, tmp + i, 20 - i);
    len_ += 20 - i;
  }
  uint8_t* data() { return data_; }
  size_t len() const { return len_; }
  inline void bump(size_t n) { len_ += n; }

 private:
  uint8_t* data_;
  size_t len_, cap_;
};

inline uint32_t rd_u32(const uint8_t* p) {
  uint32_t v;
  memcpy(&v, p, 4);
  return v;
}
inline uint16_t rd_u16(const uint8_t* p) {
  uint16_t v;
  memcpy(&v, p, 2);
  return v;
}

// Format one record's aux blob; returns 0 ok, -1 corrupt.
// skips a CG tag at `skip_off` (relative to aux start; -1 = none).
int format_aux(const uint8_t* aux, int64_t alen, int64_t skip_off,
               int64_t skip_len, Buf* out) {
  int64_t s = 0;
  char tmp[64];
  while (s + 3 <= alen) {
    if (s == skip_off) { s += skip_len; continue; }
    const uint8_t* tag = aux + s;
    char t = (char)aux[s + 2];
    int64_t p = s + 3;
    out->putc('\t');
    out->put(tag, 2);
    switch (t) {
      case 'C': if (p+1>alen) return -1;
        out->put(":i:", 3); out->put_i64(aux[p]); p += 1; break;
      case 'c': if (p+1>alen) return -1;
        out->put(":i:", 3); out->put_i64((int8_t)aux[p]); p += 1; break;
      case 'S': if (p+2>alen) return -1;
        out->put(":i:", 3); out->put_i64(rd_u16(aux+p)); p += 2; break;
      case 's': if (p+2>alen) return -1;
        out->put(":i:", 3); out->put_i64((int16_t)rd_u16(aux+p)); p += 2; break;
      case 'I': if (p+4>alen) return -1;
        out->put(":i:", 3); out->put_i64(rd_u32(aux+p)); p += 4; break;
      case 'i': if (p+4>alen) return -1;
        out->put(":i:", 3); out->put_i64((int32_t)rd_u32(aux+p)); p += 4; break;
      case 'A': if (p+1>alen) return -1;
        out->put(":A:", 3); out->putc((char)aux[p]); p += 1; break;
      case 'f': {
        if (p+4>alen) return -1;
        float f;
        memcpy(&f, aux + p, 4);
        int n = snprintf(tmp, sizeof tmp, ":f:%g", (double)f);
        out->put(tmp, n);
        p += 4;
        break;
      }
      case 'd': {
        if (p+8>alen) return -1;
        double d;
        memcpy(&d, aux + p, 8);
        int n = snprintf(tmp, sizeof tmp, ":d:%g", d);
        out->put(tmp, n);
        p += 8;
        break;
      }
      case 'Z': case 'H': {
        out->putc(':'); out->putc(t); out->putc(':');
        int64_t e = p;
        while (e < alen && aux[e]) e++;
        if (e >= alen) return -1;
        out->put(aux + p, e - p);
        p = e + 1;
        break;
      }
      case 'B': {
        if (p + 5 > alen) return -1;
        char sub = (char)aux[p];
        uint32_t cnt = rd_u32(aux + p + 1);
        p += 5;
        out->put(":B:", 3);
        out->putc(sub);
        switch (sub) {
          case 'c': if (p+(int64_t)cnt>alen) return -1;
            for (uint32_t i = 0; i < cnt; i++) { out->putc(','); out->put_i64((int8_t)aux[p+i]); }
            p += cnt; break;
          case 'C': if (p+(int64_t)cnt>alen) return -1;
            for (uint32_t i = 0; i < cnt; i++) { out->putc(','); out->put_i64(aux[p+i]); }
            p += cnt; break;
          case 's': if (p+2LL*cnt>alen) return -1;
            for (uint32_t i = 0; i < cnt; i++) { out->putc(','); out->put_i64((int16_t)rd_u16(aux+p+2*i)); }
            p += 2LL*cnt; break;
          case 'S': if (p+2LL*cnt>alen) return -1;
            for (uint32_t i = 0; i < cnt; i++) { out->putc(','); out->put_i64(rd_u16(aux+p+2*i)); }
            p += 2LL*cnt; break;
          case 'i': if (p+4LL*cnt>alen) return -1;
            for (uint32_t i = 0; i < cnt; i++) { out->putc(','); out->put_i64((int32_t)rd_u32(aux+p+4*i)); }
            p += 4LL*cnt; break;
          case 'I': if (p+4LL*cnt>alen) return -1;
            for (uint32_t i = 0; i < cnt; i++) { out->putc(','); out->put_i64(rd_u32(aux+p+4*i)); }
            p += 4LL*cnt; break;
          case 'f': if (p+4LL*cnt>alen) return -1;
            for (uint32_t i = 0; i < cnt; i++) {
              float f; memcpy(&f, aux+p+4*i, 4);
              int n = snprintf(tmp, sizeof tmp, ",%g", (double)f);
              out->put(tmp, n);
            }
            p += 4LL*cnt; break;
          default: return -1;
        }
        break;
      }
      default:
        return -1;
    }
    s = p;
  }
  return s == alen ? 0 : -1;
}

// Format one BAM record (payload after block_size) as one SAM line + \n.
int format_record(const uint8_t* rec, uint32_t size, const NameTable& nt,
                  Buf* out) {
  if (size < 32) return -1;
  int32_t tid = (int32_t)rd_u32(rec + 0);
  int32_t pos = (int32_t)rd_u32(rec + 4);
  uint8_t l_qname = rec[8];
  uint8_t mapq = rec[9];
  uint16_t n_cigar = rd_u16(rec + 12);
  uint16_t flag = rd_u16(rec + 14);
  int32_t l_qseq = (int32_t)rd_u32(rec + 16);
  int32_t mtid = (int32_t)rd_u32(rec + 20);
  int32_t mpos = (int32_t)rd_u32(rec + 24);
  int32_t tlen = (int32_t)rd_u32(rec + 28);
  const uint8_t* qname = rec + 32;
  const uint8_t* cig = qname + l_qname;
  const uint8_t* seq = cig + 4ull * n_cigar;
  const uint8_t* qual = seq + (l_qseq + 1) / 2;
  const uint8_t* aux = qual + l_qseq;
  const uint8_t* end = rec + size;
  if (aux > end || l_qname == 0) return -1;

  // CG long-cigar escape (bam_tag2cigar, sam.c:680)
  const uint8_t* real_cig = cig;
  uint32_t real_n_cigar = n_cigar;
  int64_t cg_skip_off = -1, cg_skip_len = 0;
  if (n_cigar > 0 && tid >= 0 && pos >= 0) {
    uint32_t c0 = rd_u32(cig);
    if (c0 == (((uint32_t)l_qseq << 4) | 4)) {
      // look for CG:B,I in aux
      int64_t alen = end - aux;
      int64_t s = 0;
      while (s + 3 <= alen) {
        char t = (char)aux[s + 2];
        int64_t p = s + 3;
        int64_t sz = 0;
        switch (t) {
          case 'A': case 'c': case 'C': sz = 1; break;
          case 's': case 'S': sz = 2; break;
          case 'i': case 'I': case 'f': sz = 4; break;
          case 'd': sz = 8; break;
          case 'Z': case 'H': {
            int64_t e = p;
            while (e < alen && aux[e]) e++;
            sz = e - p + 1;
            break;
          }
          case 'B': {
            if (p + 5 > alen) { s = alen + 1; continue; }
            char sub = (char)aux[p];
            uint32_t cnt = rd_u32(aux + p + 1);
            int64_t es = (sub=='c'||sub=='C'||sub=='A') ? 1 :
                         (sub=='s'||sub=='S') ? 2 :
                         (sub=='i'||sub=='I'||sub=='f') ? 4 : 0;
            if (!es) { s = alen + 1; continue; }
            sz = 5 + es * (int64_t)cnt;
            break;
          }
          default: s = alen + 1; continue;
        }
        if (aux[s]=='C' && aux[s+1]=='G' && t=='B' && p+1<=alen &&
            (aux[p]=='I' || aux[p]=='i')) {
          uint32_t cnt = rd_u32(aux + p + 1);
          if (cnt >= n_cigar && cnt < (1u<<29) && p + 5 + 4LL*cnt <= alen) {
            real_cig = aux + p + 5;
            real_n_cigar = cnt;
            cg_skip_off = s;
            cg_skip_len = 3 + 5 + 4LL * cnt;
          }
          break;
        }
        s = p + sz;
      }
    }
  }

  out->put(qname, l_qname - 1);
  out->putc('\t');
  out->put_i64(flag);
  out->putc('\t');
  if (tid >= 0 && tid < nt.n_ref) out->put(nt.buf + nt.offs[tid], nt.lens[tid]);
  else out->putc('*');
  out->putc('\t');
  out->put_i64((int64_t)pos + 1);
  out->putc('\t');
  out->put_i64(mapq);
  out->putc('\t');
  if (real_n_cigar == 0) out->putc('*');
  else {
    for (uint32_t k = 0; k < real_n_cigar; k++) {
      uint32_t c = rd_u32(real_cig + 4ull * k);
      out->put_i64(c >> 4);
      out->putc(kCigChar[c & 0xF]);
    }
  }
  out->putc('\t');
  if (mtid < 0) out->putc('*');
  else if (mtid == tid) out->putc('=');
  else if (mtid < nt.n_ref) out->put(nt.buf + nt.offs[mtid], nt.lens[mtid]);
  else out->putc('*');
  out->putc('\t');
  out->put_i64((int64_t)mpos + 1);
  out->putc('\t');
  out->put_i64(tlen);
  out->putc('\t');
  if (l_qseq == 0) out->putc('*');
  else {
    out->reserve(l_qseq);
    uint8_t* dst = out->data() + out->len();
    for (int32_t i = 0; i < l_qseq / 2; i++) {
      uint16_t two = kNt16x2.t[seq[i]];
      memcpy(dst + 2 * i, &two, 2);
    }
    if (l_qseq & 1) dst[l_qseq - 1] = kNt16[seq[l_qseq / 2] >> 4];
    out->bump(l_qseq);
  }
  out->putc('\t');
  if (l_qseq == 0 || qual[0] == 0xFF) out->putc('*');
  else {
    out->reserve(l_qseq);
    uint8_t* dst = out->data() + out->len();
    for (int32_t i = 0; i < l_qseq; i++) dst[i] = qual[i] + 33;
    out->bump(l_qseq);
  }
  if (format_aux(aux, end - aux, cg_skip_off, cg_skip_len, out) < 0)
    return -1;
  out->putc('\n');
  return 0;
}

}  // namespace

extern "C" {

// Format n BAM records as SAM text, multithreaded by record ranges.
// Returns total byte length (caller then copies from *out_ptr and calls
// htstpu_buf_free), or -(3000+i) on a malformed record i.
int64_t htstpu_bam_to_sam(const uint8_t* data, const uint64_t* offs,
                          const uint32_t* sizes, int64_t n,
                          const uint8_t* name_buf, const uint64_t* name_offs,
                          const uint32_t* name_lens, int32_t n_ref,
                          uint8_t** out_ptr, int nthreads) {
  if (nthreads <= 0) nthreads = hardware_threads();
  NameTable nt{name_buf, name_offs, name_lens, n_ref};
  int shards = nthreads * 4;
  if (shards > n) shards = n ? (int)n : 1;
  std::vector<Buf> bufs(shards);
  std::atomic<int64_t> err(0);
  int64_t per = (n + shards - 1) / (shards ? shards : 1);
  parallel_for(shards, nthreads, [&](int64_t si) {
    int64_t lo = si * per, hi = std::min<int64_t>(n, lo + per);
    if (lo >= hi) return;
    // pre-size the shard buffer: SAM text runs ~2.2x the BAM record
    // bytes; with the host allocator's mmap path disabled every realloc
    // is a full copy, so growth-by-doubling would copy each shard twice
    uint64_t in_bytes = (offs[hi - 1] + sizes[hi - 1]) - offs[lo];
    bufs[si].reserve(in_bytes * 5 / 2 + 4096);
    for (int64_t i = lo; i < hi; i++) {
      if (format_record(data + offs[i] + 4, sizes[i] - 4, nt, &bufs[si]) < 0) {
        err.store(-(3000 + i), std::memory_order_relaxed);
        return;
      }
    }
  });
  if (err.load()) return err.load();
  int64_t total = 0;
  for (auto& b : bufs) total += b.len();
  uint8_t* out = (uint8_t*)malloc(total ? total : 1);
  if (!out) return -1;
  int64_t pos = 0;
  std::vector<int64_t> starts(shards);
  for (int i = 0; i < shards; i++) {
    starts[i] = pos;
    pos += bufs[i].len();
  }
  parallel_for(shards, nthreads, [&](int64_t si) {
    memcpy(out + starts[si], bufs[si].data(), bufs[si].len());
  });
  *out_ptr = out;
  return total;
}

// Fused record-scan + format pipeline over an uncompressed BAM byte
// stream (everything after the header).  A scanner walks the record
// framing (inherently sequential, sam.c:784) while format workers chase
// its frontier in fixed-size record batches — the serial scan overlaps
// with formatting instead of preceding it.  Returns total SAM byte
// length via *out_ptr (caller frees with htstpu_buf_free), or
// -2 truncated / -3 bad record / -(3000+i) malformed record i.
int64_t htstpu_bam_scan_format(const uint8_t* data, uint64_t len,
                               uint64_t start, const uint8_t* name_buf,
                               const uint64_t* name_offs,
                               const uint32_t* name_lens, int32_t n_ref,
                               uint8_t** out_ptr, int nthreads) {
  if (nthreads <= 0) nthreads = hardware_threads();
  NameTable nt{name_buf, name_offs, name_lens, n_ref};
  const int64_t kBatch = 4096;
  uint64_t cap = (len - start) / 36 + 1;  // 32B core + 4B size minimum
  std::vector<uint64_t> offs(cap);
  std::atomic<int64_t> n_scanned(0);
  std::atomic<int64_t> scan_err(0);
  std::atomic<bool> scan_done(false);
  std::atomic<int64_t> next_batch(0);
  std::atomic<int64_t> fmt_err(0);
  int64_t max_batches = (int64_t)(cap + kBatch - 1) / kBatch;
  std::vector<Buf> bufs(max_batches);

  auto format_batches = [&]() {
    for (;;) {
      int64_t bi = next_batch.fetch_add(1, std::memory_order_relaxed);
      int64_t lo = bi * kBatch;
      // wait for the scanner to pass lo + kBatch (or finish)
      for (;;) {
        int64_t ns = n_scanned.load(std::memory_order_acquire);
        if (ns >= lo + kBatch || scan_done.load(std::memory_order_acquire))
          break;
        std::this_thread::yield();
      }
      int64_t total = n_scanned.load(std::memory_order_acquire);
      if (lo >= total) return;
      int64_t hi = std::min<int64_t>(total, lo + kBatch);
      if (fmt_err.load(std::memory_order_relaxed) ||
          scan_err.load(std::memory_order_relaxed))
        return;
      // record sizes are self-describing (u32 length prefix), so the
      // worker never needs offs[] entries past its own batch
      uint64_t est = (hi - lo) * ((len - start) / (total ? total : 1));
      bufs[bi].reserve(est * 5 / 2 + 4096);
      for (int64_t i = lo; i < hi; i++) {
        uint32_t bsz;
        std::memcpy(&bsz, data + offs[i], 4);
        if (format_record(data + offs[i] + 4, bsz, nt, &bufs[bi]) < 0) {
          fmt_err.store(-(3000 + i), std::memory_order_relaxed);
          return;
        }
      }
    }
  };

  std::vector<std::thread> team;
  for (int i = 1; i < nthreads; i++) team.emplace_back(format_batches);

  // scanner on the calling thread, then it joins the format pool
  {
    uint64_t pos = start;
    int64_t n = 0;
    while (pos + 4 <= len) {
      uint32_t bsz;
      std::memcpy(&bsz, data + pos, 4);
      if (pos + 4 + bsz > len) { scan_err.store(-2); break; }
      if (bsz < 32) { scan_err.store(-3); break; }
      offs[n++] = pos;
      pos += 4 + (uint64_t)bsz;
      if ((n & 1023) == 0)
        n_scanned.store(n, std::memory_order_release);
    }
    if (!scan_err.load() && pos != len) scan_err.store(-2);
    n_scanned.store(n, std::memory_order_release);
    scan_done.store(true, std::memory_order_release);
  }
  format_batches();
  for (auto& th : team) th.join();
  if (scan_err.load()) return scan_err.load();
  if (fmt_err.load()) return fmt_err.load();

  int64_t n = n_scanned.load();
  int64_t nb = (n + kBatch - 1) / kBatch;
  int64_t total = 0;
  for (int64_t i = 0; i < nb; i++) total += bufs[i].len();
  uint8_t* out = (uint8_t*)malloc(total ? total : 1);
  if (!out) return -1;
  std::vector<int64_t> starts(nb);
  int64_t pos = 0;
  for (int64_t i = 0; i < nb; i++) { starts[i] = pos; pos += bufs[i].len(); }
  parallel_for(nb, nthreads, [&](int64_t i) {
    memcpy(out + starts[i], bufs[i].data(), bufs[i].len());
  });
  *out_ptr = out;
  return total;
}

void htstpu_buf_free(uint8_t* p) { free(p); }

}  // extern "C"
