"""ctypes bridge to the native host library (libhtstpu.so).

Builds on first import if missing/stale (make + g++ + libdeflate).  The
whole framework works without it — every caller falls back to pure
Python/zlib — but the native batch paths are the production host route
for BGZF inflate/deflate and record framing scans.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

from htslib_tpu.util.log import log_warning

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "build", "libhtstpu.so")
_SRC = os.path.join(_DIR, "src", "htstpu.cc")
_SHIM_DIR = os.path.join(_DIR, "htscodecs_shim")

MAX_BLOCK = 0x10000


def _ensure_built() -> Optional[str]:
    if os.environ.get("HTS_TPU_NO_NATIVE"):
        return None
    try:
        newest = os.path.getmtime(_SRC)
        for f in os.listdir(_SHIM_DIR):
            if f.endswith((".c", ".h")):
                newest = max(newest,
                             os.path.getmtime(os.path.join(_SHIM_DIR, f)))
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < newest:
            subprocess.run(["make", "-s", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        return _SO
    except Exception as e:  # pragma: no cover - build environment specific
        log_warning("native build failed (%s); using pure-python fallbacks", e)
        return None


class _Native:
    def __init__(self, so_path: str):
        lib = ctypes.CDLL(so_path)
        self._lib = lib
        u8p = ctypes.POINTER(ctypes.c_uint8)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        lib.htstpu_bgzf_scan.restype = ctypes.c_int64
        lib.htstpu_bgzf_scan.argtypes = [u8p, ctypes.c_uint64, ctypes.c_uint64,
                                         u64p, u32p, u32p]
        lib.htstpu_inflate_batch.restype = ctypes.c_int64
        lib.htstpu_inflate_batch.argtypes = [
            u8p, ctypes.c_uint64, ctypes.c_int64, u64p, u32p, u32p, u64p, u8p,
            ctypes.c_int, ctypes.c_int]
        lib.htstpu_deflate_batch.restype = ctypes.c_int64
        lib.htstpu_deflate_batch.argtypes = [
            u8p, ctypes.c_int64, u64p, u32p, ctypes.c_int, u8p, u32p,
            ctypes.c_int]
        lib.htstpu_bam_scan.restype = ctypes.c_int64
        lib.htstpu_bam_scan.argtypes = [u8p, ctypes.c_uint64, ctypes.c_uint64,
                                        ctypes.c_uint64, u64p, u32p]
        lib.htstpu_crc32.restype = ctypes.c_uint32
        lib.htstpu_crc32.argtypes = [ctypes.c_uint32, u8p, ctypes.c_uint64]
        lib.htstpu_bam_to_sam.restype = ctypes.c_int64
        lib.htstpu_bam_to_sam.argtypes = [
            u8p, u64p, u32p, ctypes.c_int64, u8p, u64p, u32p,
            ctypes.c_int32, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int]
        lib.htstpu_bam_scan_format.restype = ctypes.c_int64
        lib.htstpu_bam_scan_format.argtypes = [
            u8p, ctypes.c_uint64, ctypes.c_uint64, u8p, u64p, u32p,
            ctypes.c_int32, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int]
        lib.htstpu_bgzf_to_sam.restype = ctypes.c_int64
        lib.htstpu_bgzf_to_sam.argtypes = [
            u8p, ctypes.c_uint64, ctypes.c_uint64, u8p, u64p, u32p,
            ctypes.c_int32, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)), ctypes.c_int]
        lib.htstpu_sam_to_bam.restype = ctypes.c_int64
        lib.htstpu_sam_to_bam.argtypes = [
            u8p, ctypes.c_uint64, u8p, u64p, u32p, ctypes.c_int32,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)), ctypes.c_int]
        lib.htstpu_mpileup.restype = ctypes.c_int64
        lib.htstpu_mpileup.argtypes = [
            u8p, ctypes.c_uint64, u8p, u64p, u32p, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int64,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
        lib.htstpu_vcf_parse.restype = ctypes.c_int64
        lib.htstpu_vcf_parse.argtypes = [
            u8p, ctypes.c_uint64,
            u8p, u64p, u32p, i32p, i32p, i32p, ctypes.c_int32,
            u8p, u64p, u32p, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            u8p, ctypes.c_int64,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
        lib.htstpu_bcf_to_vcf.restype = ctypes.c_int64
        lib.htstpu_bcf_to_vcf.argtypes = [
            u8p, ctypes.c_uint64, u8p, u64p, u32p, ctypes.c_int32,
            u8p, u64p, u32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
        lib.htstpu_buf_free.restype = None
        lib.htstpu_cram_slice_to_sam.restype = ctypes.c_int64
        lib.htstpu_cram_encode_slice.restype = ctypes.c_int64
        lib.htstpu_cram_encode_slice.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint64,
            ctypes.c_int32, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_uint64,
            ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.rans_compress_4x16.restype = u8p
        lib.rans_compress_4x16.argtypes = [
            ctypes.c_char_p, ctypes.c_uint, ctypes.POINTER(ctypes.c_uint),
            ctypes.c_int]
        lib.rans_uncompress_4x16.restype = u8p
        lib.rans_uncompress_4x16.argtypes = [
            ctypes.c_char_p, ctypes.c_uint, ctypes.POINTER(ctypes.c_uint)]
        lib.arith_compress_to.restype = u8p
        lib.arith_compress_to.argtypes = [
            ctypes.c_char_p, ctypes.c_uint, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint), ctypes.c_int]
        lib.arith_uncompress_to.restype = u8p
        lib.arith_uncompress_to.argtypes = [
            ctypes.c_char_p, ctypes.c_uint, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_uint)]
        lib.fqz_compress.restype = u8p
        lib.fqz_compress.argtypes = [
            ctypes.c_int, ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_size_t), ctypes.c_int, ctypes.c_void_p]
        lib.fqz_decompress.restype = u8p
        lib.fqz_decompress.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_void_p, ctypes.c_int]
        lib.tok3_encode_names.restype = u8p
        lib.tok3_encode_names.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_void_p]
        lib.tok3_decode_names.restype = u8p
        lib.tok3_decode_names.argtypes = [
            ctypes.c_char_p, ctypes.c_uint32, ctypes.POINTER(ctypes.c_uint32)]
        lib.htstpu_buf_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
        lib.htstpu_rans4x8_uncompress.restype = ctypes.c_int64
        lib.htstpu_rans4x8_uncompress.argtypes = [u8p, ctypes.c_uint64, u8p,
                                                  ctypes.c_uint64]
        lib.htstpu_rans4x8_compress.restype = ctypes.c_int64
        lib.htstpu_rans4x8_compress.argtypes = [
            u8p, ctypes.c_uint64, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
        lib.htstpu_gzip_compress.restype = ctypes.c_int64
        lib.htstpu_gzip_compress.argtypes = [
            u8p, ctypes.c_uint64, ctypes.c_int32,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]
        lib.htstpu_bam_fields.restype = ctypes.c_int64
        lib.htstpu_bam_fields.argtypes = [
            u8p, ctypes.c_uint64, ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32)]
        lib.htstpu_cram_decode_slice.restype = ctypes.c_int64
        lib.htstpu_cram_decode_slice.argtypes = [
            u8p, ctypes.c_uint64,                       # comp_hdr
            ctypes.c_int32, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int64,             # slice header
            ctypes.c_int32, i32p, i32p, u64p, u64p, u8p,  # blocks
            u8p, ctypes.c_uint64, ctypes.c_int64, ctypes.c_int64,  # ref
            ctypes.c_int32, u8p, u64p, u32p, u8p,       # read groups
            ctypes.c_int32,                             # decode_md
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8))]

    @staticmethod
    def _u8(arr: np.ndarray):
        return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))

    @staticmethod
    def _ptr(arr: np.ndarray, ctype):
        return arr.ctypes.data_as(ctypes.POINTER(ctype))

    def bgzf_scan(self, data: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        data = np.ascontiguousarray(data)
        cap = max(len(data) // 28 + 1, 16)
        co = np.empty(cap, np.uint64)
        cs = np.empty(cap, np.uint32)
        us = np.empty(cap, np.uint32)
        n = self._lib.htstpu_bgzf_scan(
            self._u8(data), len(data), cap,
            self._ptr(co, ctypes.c_uint64), self._ptr(cs, ctypes.c_uint32),
            self._ptr(us, ctypes.c_uint32))
        if n < 0:
            raise IOError(f"BGZF scan failed (err {n})")
        return co[:n].copy(), cs[:n].copy(), us[:n].copy()

    def inflate_batch(self, data: np.ndarray, coffsets: np.ndarray,
                      csizes: np.ndarray, usizes: np.ndarray,
                      verify_crc: bool = True, nthreads: int = 0) -> np.ndarray:
        data = np.ascontiguousarray(data)
        coffsets = np.ascontiguousarray(coffsets, np.uint64)
        csizes = np.ascontiguousarray(csizes, np.uint32)
        usizes = np.ascontiguousarray(usizes, np.uint32)
        out_offsets = np.zeros(len(usizes), np.uint64)
        np.cumsum(usizes[:-1], dtype=np.uint64, out=out_offsets[1:])
        total = int(usizes.sum(dtype=np.uint64))
        out = np.empty(total, np.uint8)
        r = self._lib.htstpu_inflate_batch(
            self._u8(data), len(data), len(usizes),
            self._ptr(coffsets, ctypes.c_uint64),
            self._ptr(csizes, ctypes.c_uint32),
            self._ptr(usizes, ctypes.c_uint32),
            self._ptr(out_offsets, ctypes.c_uint64), self._u8(out),
            1 if verify_crc else 0, nthreads)
        if r < 0:
            raise IOError(f"BGZF inflate failed on block {-(r + 1000)}")
        return out

    def deflate_blocks(self, chunks: List[bytes], level: int = -1,
                       nthreads: int = 0) -> List[bytes]:
        n = len(chunks)
        if n == 0:
            return []
        lens = np.array([len(c) for c in chunks], np.uint32)
        in_offsets = np.zeros(n, np.uint64)
        np.cumsum(lens[:-1], dtype=np.uint64, out=in_offsets[1:])
        data = np.frombuffer(b"".join(chunks), np.uint8)
        out = np.empty(n * MAX_BLOCK, np.uint8)
        out_lens = np.zeros(n, np.uint32)
        if level > 9:
            level = 9
        r = self._lib.htstpu_deflate_batch(
            self._u8(data), n, self._ptr(in_offsets, ctypes.c_uint64),
            self._ptr(lens, ctypes.c_uint32), level, self._u8(out),
            self._ptr(out_lens, ctypes.c_uint32), nthreads)
        if r < 0:
            raise IOError(f"BGZF deflate failed on chunk {-(r + 2000)}")
        return [out[i * MAX_BLOCK: i * MAX_BLOCK + int(out_lens[i])].tobytes()
                for i in range(n)]

    def deflate_batch_np(self, data: np.ndarray, in_offsets: np.ndarray,
                         in_lens: np.ndarray, level: int = -1,
                         nthreads: int = 0) -> Tuple[np.ndarray, np.ndarray]:
        """Zero-copy variant: returns (out buffer [n*MAX_BLOCK], out_lens)."""
        n = len(in_lens)
        data = np.ascontiguousarray(data)
        in_offsets = np.ascontiguousarray(in_offsets, np.uint64)
        in_lens = np.ascontiguousarray(in_lens, np.uint32)
        out = np.empty(n * MAX_BLOCK, np.uint8)
        out_lens = np.zeros(n, np.uint32)
        if level > 9:
            level = 9
        r = self._lib.htstpu_deflate_batch(
            self._u8(data), n, self._ptr(in_offsets, ctypes.c_uint64),
            self._ptr(in_lens, ctypes.c_uint32), level, self._u8(out),
            self._ptr(out_lens, ctypes.c_uint32), nthreads)
        if r < 0:
            raise IOError(f"BGZF deflate failed on chunk {-(r + 2000)}")
        return out, out_lens

    def bam_scan(self, data: np.ndarray, start: int) -> Tuple[np.ndarray, np.ndarray]:
        data = np.ascontiguousarray(data)
        cap = max((len(data) - start) // 36 + 1, 16)
        offs = np.empty(cap, np.uint64)
        sizes = np.empty(cap, np.uint32)
        n = self._lib.htstpu_bam_scan(
            self._u8(data), len(data), start, cap,
            self._ptr(offs, ctypes.c_uint64), self._ptr(sizes, ctypes.c_uint32))
        if n < 0:
            raise IOError(f"BAM record scan failed (err {n})")
        return offs[:n].copy(), sizes[:n].copy()

    def crc32(self, data: np.ndarray, crc: int = 0) -> int:
        data = np.ascontiguousarray(data)
        return int(self._lib.htstpu_crc32(crc, self._u8(data), len(data)))

    def bam_to_sam(self, data: np.ndarray, offs: np.ndarray,
                   sizes: np.ndarray, ref_names: List[str],
                   nthreads: int = 0) -> bytes:
        """Format a whole record batch as SAM text (multithreaded C++)."""
        data = np.ascontiguousarray(data)
        offs = np.ascontiguousarray(offs, np.uint64)
        sizes = np.ascontiguousarray(sizes, np.uint32)
        names = [n.encode() for n in ref_names]
        name_buf = np.frombuffer(b"".join(names) + b"\0", np.uint8)
        name_lens = np.array([len(n) for n in names] or [0], np.uint32)
        name_offs = np.zeros(max(len(names), 1), np.uint64)
        if len(names) > 1:
            np.cumsum(name_lens[:-1], dtype=np.uint64, out=name_offs[1:])
        out_ptr = ctypes.POINTER(ctypes.c_uint8)()
        r = self._lib.htstpu_bam_to_sam(
            self._u8(data), self._ptr(offs, ctypes.c_uint64),
            self._ptr(sizes, ctypes.c_uint32), len(offs),
            self._u8(name_buf), self._ptr(name_offs, ctypes.c_uint64),
            self._ptr(name_lens, ctypes.c_uint32), len(names),
            ctypes.byref(out_ptr), nthreads)
        if r < 0:
            raise IOError(f"native SAM format failed on record {-(r + 3000)}")
        try:
            return ctypes.string_at(out_ptr, r)
        finally:
            self._lib.htstpu_buf_free(out_ptr)

    def bam_scan_format(self, data: np.ndarray, start: int,
                        ref_names: List[str],
                        nthreads: int = 0) -> np.ndarray:
        """Fused record-scan + SAM formatting over an uncompressed BAM
        stream: the serial framing walk overlaps with the format
        workers instead of preceding them.  Returns a zero-copy uint8
        view of the native buffer (freed when the array dies)."""
        import weakref
        data = np.ascontiguousarray(data)
        names = [n.encode() for n in ref_names]
        name_buf = np.frombuffer(b"".join(names) + b"\0", np.uint8)
        name_lens = np.array([len(n) for n in names] or [0], np.uint32)
        name_offs = np.zeros(max(len(names), 1), np.uint64)
        if len(names) > 1:
            np.cumsum(name_lens[:-1], dtype=np.uint64, out=name_offs[1:])
        out_ptr = ctypes.POINTER(ctypes.c_uint8)()
        r = self._lib.htstpu_bam_scan_format(
            self._u8(data), len(data), start,
            self._u8(name_buf), self._ptr(name_offs, ctypes.c_uint64),
            self._ptr(name_lens, ctypes.c_uint32), len(names),
            ctypes.byref(out_ptr), nthreads)
        if r == -2 or r == -3:
            self._lib.htstpu_buf_free(out_ptr)
            raise IOError("truncated BAM record stream")
        if r < 0:
            raise IOError(f"native SAM format failed on record {-(r + 3000)}")
        cbuf = ctypes.cast(out_ptr,
                           ctypes.POINTER(ctypes.c_uint8 * r)).contents
        weakref.finalize(cbuf, self._lib.htstpu_buf_free, out_ptr)
        return np.frombuffer(cbuf, np.uint8)

    def bgzf_to_sam(self, raw: np.ndarray, u_skip: int,
                    ref_names: List[str], verify_crc: bool = True,
                    nthreads: int = 0) -> np.ndarray:
        """Fully fused BGZF->SAM: block inflate + record scan + SAM
        formatting overlap in one native thread team (the batch analogue
        of bgzf.c:1598 + sam.c:3325 MT pipelines).  `u_skip` skips the
        BAM header's uncompressed bytes.  Zero-copy uint8 result."""
        import weakref
        raw = np.ascontiguousarray(raw)
        names = [n.encode() for n in ref_names]
        name_buf = np.frombuffer(b"".join(names) + b"\0", np.uint8)
        name_lens = np.array([len(n) for n in names] or [0], np.uint32)
        name_offs = np.zeros(max(len(names), 1), np.uint64)
        if len(names) > 1:
            np.cumsum(name_lens[:-1], dtype=np.uint64, out=name_offs[1:])
        out_ptr = ctypes.POINTER(ctypes.c_uint8)()
        r = self._lib.htstpu_bgzf_to_sam(
            self._u8(raw), len(raw), u_skip,
            self._u8(name_buf), self._ptr(name_offs, ctypes.c_uint64),
            self._ptr(name_lens, ctypes.c_uint32), len(names),
            1 if verify_crc else 0, ctypes.byref(out_ptr), nthreads)
        if r in (-2, -3):
            raise IOError("truncated or malformed BGZF/BAM stream")
        if r < 0:
            if r <= -3000:
                raise IOError(f"native SAM format failed on record {-(r + 3000)}")
            raise IOError(f"BGZF inflate failed on block {-(r + 1000)}")
        cbuf = ctypes.cast(out_ptr,
                           ctypes.POINTER(ctypes.c_uint8 * r)).contents
        weakref.finalize(cbuf, self._lib.htstpu_buf_free, out_ptr)
        return np.frombuffer(cbuf, np.uint8)

    def sam_to_bam(self, text: np.ndarray, ref_names: List[str],
                   nthreads: int = 0) -> np.ndarray:
        """Parse SAM text into a BAM record stream (u32 length-prefixed
        records), multithreaded (sam_parse_worker equivalent).  Raises
        IOError naming the offending line on malformed input or when a
        line needs the Python slow path (unknown reference, >65535-op
        CIGAR)."""
        import weakref
        text = np.ascontiguousarray(text)
        names = [n.encode() for n in ref_names]
        name_buf = np.frombuffer(b"".join(names) + b"\0", np.uint8)
        name_lens = np.array([len(n) for n in names] or [0], np.uint32)
        name_offs = np.zeros(max(len(names), 1), np.uint64)
        if len(names) > 1:
            np.cumsum(name_lens[:-1], dtype=np.uint64, out=name_offs[1:])
        out_ptr = ctypes.POINTER(ctypes.c_uint8)()
        r = self._lib.htstpu_sam_to_bam(
            self._u8(text), len(text),
            self._u8(name_buf), self._ptr(name_offs, ctypes.c_uint64),
            self._ptr(name_lens, ctypes.c_uint32), len(names),
            ctypes.byref(out_ptr), nthreads)
        if r < 0:
            raise IOError(f"native SAM parse failed on line {-(r + 4000)}")
        cbuf = ctypes.cast(out_ptr,
                           ctypes.POINTER(ctypes.c_uint8 * r)).contents
        weakref.finalize(cbuf, self._lib.htstpu_buf_free, out_ptr)
        return np.frombuffer(cbuf, np.uint8)

    def mpileup(self, data: np.ndarray, ref_names: List[str],
                skip_mask: int = 0, overlaps: bool = True,
                window=None) -> bytes:
        """Pileup text (test/pileup.c format) over a u32-framed BAM
        record stream — native resolve_cigar2 + overlap tweak engine.
        `window` = ((lo_tid, lo_pos), (hi_tid, hi_pos)) gates column
        emission to a coordinate tile (halo reads still processed).
        Raises BlockingIOError on kBail (caller uses the Python
        engine)."""
        data = np.ascontiguousarray(data)
        names = [n.encode() for n in ref_names]
        name_buf = np.frombuffer(b"".join(names) + b"\0", np.uint8)
        name_lens = np.array([len(n) for n in names] or [0], np.uint32)
        name_offs = np.zeros(max(len(names), 1), np.uint64)
        if len(names) > 1:
            np.cumsum(name_lens[:-1], dtype=np.uint64, out=name_offs[1:])
        out_ptr = ctypes.POINTER(ctypes.c_uint8)()
        if window is None:
            lo, hi = (-(1 << 30), 0), ((1 << 30), 1 << 62)
        else:
            lo, hi = window
        r = self._lib.htstpu_mpileup(
            self._u8(data), len(data),
            self._u8(name_buf), self._ptr(name_offs, ctypes.c_uint64),
            self._ptr(name_lens, ctypes.c_uint32), len(names),
            skip_mask, 1 if overlaps else 0,
            int(lo[0]), int(lo[1]), int(hi[0]), int(hi[1]),
            ctypes.byref(out_ptr))
        if r == -100:
            raise BlockingIOError("native mpileup bailed")
        if r < 0:
            raise IOError(f"native mpileup failed ({r})")
        try:
            return ctypes.string_at(out_ptr, r)
        finally:
            self._lib.htstpu_buf_free(out_ptr)

    @staticmethod
    def _strtab(names: List[str]):
        bufs = [n.encode() for n in names]
        buf = np.frombuffer(b"".join(bufs) + b"\0", np.uint8)
        lens = np.array([len(n) for n in bufs] or [0], np.uint32)
        offs = np.zeros(max(len(bufs), 1), np.uint64)
        if len(bufs) > 1:
            np.cumsum(lens[:-1], dtype=np.uint64, out=offs[1:])
        return buf, offs, lens

    def bcf_to_vcf(self, data: np.ndarray, ctg_names: List[str],
                   id_names: List[str], gt_id: int,
                   v44: bool = False) -> bytes:
        """Format a BCF record stream as VCF text (vcf_format port,
        vcf.c:4304)."""
        data = np.ascontiguousarray(data)
        cb, co, cl = self._strtab(ctg_names)
        ib, io_, il = self._strtab(id_names)
        out_ptr = ctypes.POINTER(ctypes.c_uint8)()
        r = self._lib.htstpu_bcf_to_vcf(
            self._u8(data), len(data),
            self._u8(cb), self._ptr(co, ctypes.c_uint64),
            self._ptr(cl, ctypes.c_uint32), len(ctg_names),
            self._u8(ib), self._ptr(io_, ctypes.c_uint64),
            self._ptr(il, ctypes.c_uint32), len(id_names),
            gt_id, 1 if v44 else 0, ctypes.byref(out_ptr))
        if r < 0:
            raise IOError(f"native BCF format failed on record {-(r + 5000)}")
        try:
            return ctypes.string_at(out_ptr, r)
        finally:
            self._lib.htstpu_buf_free(out_ptr)

    def vcf_parse(self, body: np.ndarray, id_names: List[str],
                  flt_def: np.ndarray, info_type: np.ndarray,
                  fmt_type: np.ndarray, ctg_names: List[str],
                  gt_id: int, end_id: int, n_samples: int,
                  n_lines: int, v44: bool = False) -> Tuple[bytes, np.ndarray]:
        """Parse VCF body text into BCF frames (vcf_parse port,
        vcf.c:3987).  Returns (frames, bails): frames holds the encoded
        records of non-bailing lines in order; bails[i]=1 marks lines
        Python must re-parse (unknown names etc.)."""
        body = np.ascontiguousarray(body)
        ib, io_, il = self._strtab(id_names)
        cb, co, cl = self._strtab(ctg_names)
        fd = np.ascontiguousarray(flt_def, np.int32)
        it = np.ascontiguousarray(info_type, np.int32)
        ft = np.ascontiguousarray(fmt_type, np.int32)
        bails = np.zeros(max(n_lines, 1), np.uint8)
        out_ptr = ctypes.POINTER(ctypes.c_uint8)()
        r = self._lib.htstpu_vcf_parse(
            self._u8(body), len(body),
            self._u8(ib), self._ptr(io_, ctypes.c_uint64),
            self._ptr(il, ctypes.c_uint32),
            self._ptr(fd, ctypes.c_int32), self._ptr(it, ctypes.c_int32),
            self._ptr(ft, ctypes.c_int32), len(id_names),
            self._u8(cb), self._ptr(co, ctypes.c_uint64),
            self._ptr(cl, ctypes.c_uint32), len(ctg_names),
            gt_id, end_id, n_samples, 1 if v44 else 0,
            self._u8(bails), n_lines, ctypes.byref(out_ptr))
        if r < 0:
            raise IOError(f"native VCF parse failed ({r})")
        try:
            return ctypes.string_at(out_ptr, r), bails
        finally:
            self._lib.htstpu_buf_free(out_ptr)

    def cram_decode_slice(self, comp_hdr: bytes, ref_seq_id: int,
                          ref_seq_start: int, ref_seq_span: int,
                          num_records: int, record_counter: int,
                          content_types, content_ids, payloads,
                          ref: Optional[bytes], ref_start: int,
                          ref_chrom_len: int, rg_names, decode_md: bool,
                          ) -> Optional[bytes]:
        """Decode one CRAM v3 slice natively.  Returns the u32-framed BAM
        record blob, or None when the native decoder bails (unsupported
        configuration) — never raises on unsupported input."""
        ch = np.frombuffer(comp_hdr, np.uint8)
        nblk = len(payloads)
        blk_buf = np.frombuffer(b"".join(payloads) + b"\0", np.uint8)
        blk_lens = np.array([len(x) for x in payloads] or [0], np.uint64)
        blk_offs = np.zeros(max(nblk, 1), np.uint64)
        if nblk > 1:
            np.cumsum(blk_lens[:-1], dtype=np.uint64, out=blk_offs[1:])
        ct = np.array(content_types or [0], np.int32)
        ci = np.array(content_ids or [0], np.int32)
        rnames = [(n.encode() if n is not None else b"") for n in rg_names]
        rg_buf = np.frombuffer(b"".join(rnames) + b"\0", np.uint8)
        rg_lens = np.array([len(x) for x in rnames] or [0], np.uint32)
        rg_offs = np.zeros(max(len(rnames), 1), np.uint64)
        if len(rnames) > 1:
            np.cumsum(rg_lens[:-1], dtype=np.uint64, out=rg_offs[1:])
        rg_valid = np.array([1 if n is not None else 0 for n in rg_names]
                            or [0], np.uint8)
        refarr = (np.frombuffer(ref, np.uint8) if ref
                  else np.zeros(1, np.uint8))
        out_ptr = ctypes.POINTER(ctypes.c_uint8)()
        r = self._lib.htstpu_cram_decode_slice(
            self._u8(ch), len(ch),
            ref_seq_id, ref_seq_start, ref_seq_span,
            num_records, record_counter,
            nblk, self._ptr(ct, ctypes.c_int32),
            self._ptr(ci, ctypes.c_int32),
            self._ptr(blk_offs, ctypes.c_uint64),
            self._ptr(blk_lens, ctypes.c_uint64), self._u8(blk_buf),
            self._u8(refarr), len(ref) if ref else 0, ref_start,
            ref_chrom_len,
            len(rg_names), self._u8(rg_buf),
            self._ptr(rg_offs, ctypes.c_uint64),
            self._ptr(rg_lens, ctypes.c_uint32), self._u8(rg_valid),
            1 if decode_md else 0, ctypes.byref(out_ptr))
        if r < 0:
            return None
        try:
            return ctypes.string_at(out_ptr, r)
        finally:
            self._lib.htstpu_buf_free(out_ptr)

    def rans4x8_uncompress(self, data: bytes, out_sz: int) -> bytes:
        """Decode one CRAM 3.0 rANS stream (incl. 9-byte header)."""
        buf = np.frombuffer(data, np.uint8)
        out = np.empty(max(out_sz, 1), np.uint8)
        r = self._lib.htstpu_rans4x8_uncompress(self._u8(buf), len(buf),
                                                self._u8(out), out_sz)
        if r < 0:
            raise ValueError("malformed rANS 4x8 stream")
        return out[:r].tobytes()

    def bam_fields(self, data: np.ndarray, offs: np.ndarray):
        """Planner columns for a u32-framed BAM stream: (tids, poss,
        ends, flags) with bam_endpos CIGAR spans (unmapped -> pos+1)."""
        data = np.ascontiguousarray(data)
        offs = np.ascontiguousarray(offs, np.int64)
        n = len(offs)
        tids = np.empty(n, np.int32)
        poss = np.empty(n, np.int32)
        ends = np.empty(n, np.int64)
        flags = np.empty(n, np.int32)
        r = self._lib.htstpu_bam_fields(
            self._u8(data), len(data), self._ptr(offs, ctypes.c_int64), n,
            self._ptr(tids, ctypes.c_int32), self._ptr(poss, ctypes.c_int32),
            self._ptr(ends, ctypes.c_int64), self._ptr(flags, ctypes.c_int32))
        if r < 0:
            raise IOError(f"bam_fields failed at record {-r - 1}")
        return tids, poss, ends, flags

    def gzip_compress(self, data: bytes, level: int = 6) -> bytes:
        """Plain gzip-container deflate via libdeflate (the CRAM GZIP
        block method, cram/cram_io.c:1604) — ~2-3x zlib."""
        buf = np.frombuffer(data, np.uint8) if not isinstance(
            data, np.ndarray) else data
        out_ptr = ctypes.POINTER(ctypes.c_uint8)()
        r = self._lib.htstpu_gzip_compress(self._u8(buf), len(buf), level,
                                           ctypes.byref(out_ptr))
        if r < 0:
            raise ValueError("gzip compress failed")
        try:
            return ctypes.string_at(out_ptr, r)
        finally:
            self._lib.htstpu_buf_free(out_ptr)

    def rans4x8_compress(self, data: bytes, order: int) -> bytes:
        buf = np.frombuffer(data, np.uint8)
        out_ptr = ctypes.POINTER(ctypes.c_uint8)()
        r = self._lib.htstpu_rans4x8_compress(self._u8(buf), len(buf), order,
                                              ctypes.byref(out_ptr))
        if r < 0:
            raise ValueError("rANS 4x8 encode failed")
        try:
            return ctypes.string_at(out_ptr, r)
        finally:
            self._lib.htstpu_buf_free(out_ptr)

    def cram_slice_to_sam(self, comp_hdr: bytes, ref_seq_id: int,
                          ref_seq_start: int, ref_seq_span: int,
                          num_records: int, record_counter: int,
                          content_types, content_ids, methods, raw_sizes,
                          payloads, ref: Optional[bytes], ref_start: int,
                          ref_chrom_len: int, rg_names, decode_md: bool,
                          ref_names) -> Optional[np.ndarray]:
        """Fused slice decode: block decompression (all CRAM 3.x block
        methods) + record decode + SAM formatting in one GIL-free call.
        Returns SAM text (uint8) or None when the native path bails."""
        import weakref
        ch = np.frombuffer(comp_hdr, np.uint8)
        nblk = len(payloads)
        blk_buf = np.frombuffer(b"".join(payloads) + b"\0", np.uint8)
        blk_lens = np.array([len(x) for x in payloads] or [0], np.uint64)
        blk_offs = np.zeros(max(nblk, 1), np.uint64)
        if nblk > 1:
            np.cumsum(blk_lens[:-1], dtype=np.uint64, out=blk_offs[1:])
        ct = np.array(list(content_types) or [0], np.int32)
        ci = np.array(list(content_ids) or [0], np.int32)
        mt = np.array(list(methods) or [0], np.int32)
        rs = np.array(list(raw_sizes) or [0], np.uint64)
        rg_b = b"".join((n or "").encode() for n in rg_names) + b"\0"
        rg_buf = np.frombuffer(rg_b, np.uint8)
        rg_lens = np.array([len((n or "").encode()) for n in rg_names]
                           or [0], np.uint32)
        rg_offs = np.zeros(max(len(rg_names), 1), np.uint64)
        if len(rg_names) > 1:
            np.cumsum(rg_lens[:-1], dtype=np.uint64, out=rg_offs[1:])
        rg_valid = np.array([1 if n else 0 for n in rg_names] or [0],
                            np.uint8)
        names = [n.encode() for n in ref_names]
        name_buf = np.frombuffer(b"".join(names) + b"\0", np.uint8)
        name_lens = np.array([len(n) for n in names] or [0], np.uint32)
        name_offs = np.zeros(max(len(names), 1), np.uint64)
        if len(names) > 1:
            np.cumsum(name_lens[:-1], dtype=np.uint64, out=name_offs[1:])
        if ref is None:
            ref_arr = np.zeros(1, np.uint8)
            ref_len = 0
        else:
            ref_arr = np.frombuffer(ref, np.uint8)
            ref_len = len(ref)
        out_ptr = ctypes.POINTER(ctypes.c_uint8)()
        r = self._lib.htstpu_cram_slice_to_sam(
            self._u8(ch), len(ch), ref_seq_id, ref_seq_start, ref_seq_span,
            num_records, record_counter, nblk,
            self._ptr(ct, ctypes.c_int32), self._ptr(ci, ctypes.c_int32),
            self._ptr(mt, ctypes.c_int32), self._ptr(rs, ctypes.c_uint64),
            self._ptr(blk_offs, ctypes.c_uint64),
            self._ptr(blk_lens, ctypes.c_uint64), self._u8(blk_buf),
            self._u8(ref_arr), ref_len, ref_start, ref_chrom_len,
            len(rg_names), self._u8(rg_buf),
            self._ptr(rg_offs, ctypes.c_uint64),
            self._ptr(rg_lens, ctypes.c_uint32), self._u8(rg_valid),
            1 if decode_md else 0,
            self._u8(name_buf), self._ptr(name_offs, ctypes.c_uint64),
            self._ptr(name_lens, ctypes.c_uint32), len(names),
            ctypes.byref(out_ptr))
        if r == -100:
            return None
        if r < 0:
            raise IOError(f"native CRAM slice decode failed ({r})")
        cbuf = ctypes.cast(out_ptr,
                           ctypes.POINTER(ctypes.c_uint8 * r)).contents
        weakref.finalize(cbuf, self._lib.htstpu_buf_free, out_ptr)
        return np.frombuffer(cbuf, np.uint8)

    def cram_encode_slice(self, blob: bytes, slice_ref: int,
                          slice_start: int, ref: Optional[bytes],
                          ref_start: int, use_ref: bool):
        """Native slice encoder (process_one_read hot loop).  Returns
        (n_records, nbases, end_pos, {cid: stream bytes}, td_lines,
        rec_tl uint32 array, qs_lens uint32 array) or None when the
        native path bails."""
        buf = blob if isinstance(blob, np.ndarray) \
            else np.frombuffer(blob, np.uint8)
        buf = np.ascontiguousarray(buf)
        if ref is None:
            ref_arr = np.zeros(1, np.uint8)
            ref_len = 0
        else:
            ref_arr = np.frombuffer(ref, np.uint8)
            ref_len = len(ref)
        out_ptr = ctypes.POINTER(ctypes.c_uint8)()
        r = self._lib.htstpu_cram_encode_slice(
            self._u8(buf), len(buf), slice_ref, slice_start,
            self._u8(ref_arr), ref_len, ref_start, 1 if use_ref else 0,
            ctypes.byref(out_ptr))
        if r == -100:
            return None
        if r < 0:
            raise IOError(f"native CRAM slice encode failed ({r})")
        try:
            raw = ctypes.string_at(out_ptr, r)
        finally:
            self._lib.htstpu_buf_free(out_ptr)
        mv = memoryview(raw)
        import struct as _st
        n, = _st.unpack_from("<I", mv, 0)
        nbases, end_pos = _st.unpack_from("<qq", mv, 4)
        n_streams, = _st.unpack_from("<I", mv, 20)
        p = 24
        table = []
        for _ in range(n_streams):
            cid, = _st.unpack_from("<i", mv, p)
            ln, = _st.unpack_from("<Q", mv, p + 4)
            table.append((cid, ln))
            p += 12
        n_td, = _st.unpack_from("<I", mv, p)
        td_len, = _st.unpack_from("<Q", mv, p + 4)
        p += 12
        td_blob = bytes(mv[p:p + td_len])
        p += td_len
        rec_tl = np.frombuffer(raw, np.uint32, n, p).copy()
        p += n * 4
        qs_lens = np.frombuffer(raw, np.uint32, n, p).copy()
        p += n * 4
        streams = {}
        for cid, ln in table:
            streams[cid] = bytes(mv[p:p + ln])
            p += ln
        td_lines = td_blob.split(b"\0")[:-1] if td_len else []
        if len(td_lines) != n_td:
            raise IOError("native CRAM encode: TD framing mismatch")
        return n, nbases, end_pos, streams, td_lines, rec_tl, qs_lens

    # ---- CRAM 3.1 codecs (htscodecs_shim, same wire as codecs/*.py) ----

    def rans4x16_compress(self, data: bytes, flags: int) -> bytes:
        n = ctypes.c_uint()
        ptr = self._lib.rans_compress_4x16(data, len(data),
                                           ctypes.byref(n), flags)
        if not ptr:
            raise ValueError("rANS Nx16 encode failed")
        try:
            return ctypes.string_at(ptr, n.value)
        finally:
            self._lib.htstpu_buf_free(ptr)

    def rans4x16_uncompress(self, data: bytes) -> bytes:
        n = ctypes.c_uint()
        ptr = self._lib.rans_uncompress_4x16(data, len(data),
                                             ctypes.byref(n))
        if not ptr:
            raise ValueError("malformed rANS Nx16 stream")
        try:
            return ctypes.string_at(ptr, n.value)
        finally:
            self._lib.htstpu_buf_free(ptr)

    def arith_compress(self, data: bytes, order: int) -> bytes:
        n = ctypes.c_uint()
        ptr = self._lib.arith_compress_to(data, len(data), None,
                                          ctypes.byref(n), order)
        if not ptr:
            raise ValueError("arith encode failed")
        try:
            return ctypes.string_at(ptr, n.value)
        finally:
            self._lib.htstpu_buf_free(ptr)

    def arith_uncompress(self, data: bytes) -> bytes:
        n = ctypes.c_uint()
        ptr = self._lib.arith_uncompress_to(data, len(data), None,
                                            ctypes.byref(n))
        if not ptr:
            raise ValueError("malformed arith stream")
        try:
            return ctypes.string_at(ptr, n.value)
        finally:
            self._lib.htstpu_buf_free(ptr)

    def fqz_compress(self, data: bytes, lens) -> bytes:
        class _Slice(ctypes.Structure):
            _fields_ = [("num_records", ctypes.c_int),
                        ("len", ctypes.POINTER(ctypes.c_uint32)),
                        ("flags", ctypes.POINTER(ctypes.c_uint32))]
        lens = list(lens) if lens is not None else [len(data)]
        arr = (ctypes.c_uint32 * max(len(lens), 1))(*lens)
        fl = (ctypes.c_uint32 * max(len(lens), 1))()
        sl = _Slice(len(lens), arr, fl)
        osz = ctypes.c_size_t()
        ptr = self._lib.fqz_compress(3, ctypes.byref(sl), data, len(data),
                                     ctypes.byref(osz), 0, None)
        if not ptr:
            raise ValueError("fqz encode failed")
        try:
            return ctypes.string_at(ptr, osz.value)
        finally:
            self._lib.htstpu_buf_free(ptr)

    def fqz_decompress(self, data: bytes) -> bytes:
        osz = ctypes.c_size_t()
        ptr = self._lib.fqz_decompress(data, len(data), ctypes.byref(osz),
                                       None, 0)
        if not ptr:
            raise ValueError("malformed fqz stream")
        try:
            return ctypes.string_at(ptr, osz.value)
        finally:
            self._lib.htstpu_buf_free(ptr)

    def tok3_encode(self, blk: bytes, use_arith: int = 0) -> bytes:
        n = ctypes.c_int()
        ptr = self._lib.tok3_encode_names(blk, len(blk), 7, use_arith,
                                          ctypes.byref(n), None)
        if not ptr:
            raise ValueError("tok3 encode failed")
        try:
            return ctypes.string_at(ptr, n.value)
        finally:
            self._lib.htstpu_buf_free(ptr)

    def tok3_decode(self, data: bytes) -> bytes:
        n = ctypes.c_uint32()
        ptr = self._lib.tok3_decode_names(data, len(data), ctypes.byref(n))
        if not ptr:
            raise ValueError("malformed tok3 stream")
        try:
            return ctypes.string_at(ptr, n.value)
        finally:
            self._lib.htstpu_buf_free(ptr)


native: Optional[_Native] = None
_so = _ensure_built()
if _so is not None:
    try:
        native = _Native(_so)
    except OSError as e:  # pragma: no cover
        log_warning("native library load failed (%s)", e)
        native = None
