"""Batch CRAM pipelines: slice-parallel decode-ahead conversion.

The reference decodes slices ahead of the consumer on the thread pool
(cram_next_slice + cram_decode_slice_mt, cram_decode.c:3268,3047).
Here the slice is the batch unit: the serial main thread walks
containers and reads slice blocks; `pipeline_map` runs block
uncompression + the native slice decoder on worker threads with a
bounded in-flight window (ordered, back-pressured); the consumer gets
u32-framed BAM record blobs in file order and hands them to the native
SAM formatter — no per-record Python objects anywhere.
"""
from __future__ import annotations

import struct
from typing import Iterator, List, Optional, Tuple

import numpy as np

from htslib_tpu.cram import CRAM_EOF_START, CramReader
from htslib_tpu.cram.decode import (decode_compression_header,
                                    decode_slice_blob, decode_slice_header)
from htslib_tpu.cram.structs import (CT_COMPRESSION_HEADER, CT_MAPPED_SLICE,
                                     CT_UNMAPPED_SLICE)
from htslib_tpu.pipeline import pipeline_map
from htslib_tpu.sam.header import SamHeader


def _slice_jobs(r: CramReader, end_offset: Optional[int] = None,
                ) -> Iterator[Tuple[object, object, list]]:
    """Serial walk of containers -> (comp_hdr, slice_hdr, blocks).
    Block payloads are read (not uncompressed) on the main thread; the
    expensive work happens in the pipeline stage.  `end_offset` bounds
    the walk to containers starting before it (the shard-plan range
    decode, parallel/distributed.py)."""
    while True:
        if end_offset is not None and r.fp.tell() >= end_offset:
            return
        c = r.io.read_container_header()
        if c is None:
            return
        if c.ref_seq_id == -1 and c.ref_seq_start == CRAM_EOF_START:
            return
        if c.length == 0 or c.num_records == 0:
            r.io.skip_container_data(c)
            continue
        comp_block = r.io.read_block()
        if comp_block.content_type != CT_COMPRESSION_HEADER:
            raise IOError("CRAM: expected compression header block")
        chdr = decode_compression_header(comp_block, r.version[0])
        end = c.data_offset + c.length
        while r.fp.tell() < end:
            hdr_block = r.io.read_block()
            if hdr_block.content_type not in (CT_MAPPED_SLICE,
                                              CT_UNMAPPED_SLICE):
                raise IOError("CRAM: unexpected block content type "
                              f"{hdr_block.content_type} in container")
            sh = decode_slice_header(hdr_block, r.version[0])
            blocks = [r.io.read_block() for _ in range(sh.num_blocks)]
            yield chdr, sh, blocks


def iter_slice_blobs(r: CramReader, window: int = 8,
                     decode_md: Optional[bool] = None) -> Iterator[bytes]:
    """Decode-ahead slice pipeline: yields each slice's u32-framed BAM
    record blob in file order, decoding up to `window` slices ahead on
    the shared pool."""
    md = r.decode_md if decode_md is None else decode_md

    def stage(job):
        chdr, sh, blocks = job
        return decode_slice_blob(chdr, sh, blocks, r.header, r.refs.get,
                                 r.version[0], decode_md=md)

    return pipeline_map(stage, _slice_jobs(r), window=window)


def _slice_to_sam_stage(r: CramReader, lock, decode_md: bool):
    """Build the per-slice pipeline stage: fused native decompress +
    decode + format when possible, blob + python formatting otherwise."""
    from htslib_tpu.native import native
    rg_names = [ln.get("ID") for ln in r.header.lines if ln.type == "RG"]
    ref_names = r.header.ref_names
    from htslib_tpu.cram.structs import CT_CORE, CT_EXTERNAL

    def locked_get_ref(tid, beg, end):
        # the faidx handle inside RefRegistry is a shared seek+read
        # stream: serialise fetches across pipeline workers
        with lock:
            return r.refs.get(tid, beg, end)

    def stage(job):
        chdr, sh, blocks = job
        ref = None
        ref_start = sh.ref_seq_start
        if sh.ref_seq_id >= 0 and not chdr.no_ref:
            if sh.ref_base_id >= 0:
                for b in blocks:
                    if b.content_id == sh.ref_base_id:
                        ref = b.uncompress()
                        break
            else:
                ref = locked_get_ref(sh.ref_seq_id, sh.ref_seq_start,
                                     sh.ref_seq_start + sh.ref_seq_span - 1)
            if ref is not None and sh.md5 != b"\0" * 16:
                import hashlib
                if hashlib.md5(ref[:sh.ref_seq_span]).digest() != sh.md5:
                    raise IOError("MD5 checksum reference mismatch at "
                                  f"#{sh.ref_seq_id}:{sh.ref_seq_start}")
        if (native is not None and r.version[0] == 3 and sh.ref_seq_id != -2
                and chdr.raw is not None):
            cts, cis, mts, rss, pls = [], [], [], [], []
            for b in blocks:
                if b.content_type in (CT_CORE, CT_EXTERNAL):
                    cts.append(b.content_type)
                    cis.append(b.content_id)
                    mts.append(b.method)
                    rss.append(b.raw_size)
                    pls.append(bytes(b.data))
            out = native.cram_slice_to_sam(
                chdr.raw, sh.ref_seq_id, sh.ref_seq_start, sh.ref_seq_span,
                sh.num_records, sh.record_counter, cts, cis, mts, rss, pls,
                None if chdr.no_ref else ref, ref_start,
                r.header.tid2len(sh.ref_seq_id), rg_names, decode_md,
                ref_names)
            if out is not None:
                return out
        blob = decode_slice_blob(chdr, sh, blocks, r.header, locked_get_ref,
                                 r.version[0], decode_md=decode_md)
        if not blob:
            return np.frombuffer(b"", np.uint8)
        if native is not None:
            return native.bam_scan_format(np.frombuffer(blob, np.uint8), 0,
                                          ref_names)
        from htslib_tpu.sam.batch import bam_stream_to_sam
        return bam_stream_to_sam(blob, r.header)

    return stage


def cram_file_to_sam(path: str, ref: Optional[str] = None,
                     decode_md: bool = True, window: int = 8,
                     ) -> Tuple[SamHeader, np.ndarray]:
    """One-call CRAM file -> SAM text (the test_view hot path,
    cram_to_bam + sam_format1): slice-parallel decode-ahead, each slice
    running the fused native decompress+decode+format call.  Returns
    (header, uint8 text)."""
    return cram_range_to_sam(path, None, None, ref=ref,
                             decode_md=decode_md, window=window)


def cram_range_to_sam(path: str, offset: Optional[int],
                      end_offset: Optional[int], ref: Optional[str] = None,
                      decode_md: bool = True, window: int = 8,
                      ) -> Tuple[SamHeader, np.ndarray]:
    """CRAM container byte range -> SAM text: seeks to `offset` (a
    container boundary, e.g. from a CRAI entry or a shard plan) and
    decodes containers starting before `end_offset`.  None bounds mean
    start-of-data / EOF — the whole-file case."""
    import threading
    with CramReader(path, ref=ref, decode_md=decode_md) as r:
        hdr = r.header
        if offset is not None:
            r.fp.seek(offset)
        stage = _slice_to_sam_stage(r, threading.Lock(), decode_md)
        parts = [p for p in pipeline_map(stage,
                                         _slice_jobs(r, end_offset),
                                         window=window) if len(p)]
        if not parts:
            return hdr, np.frombuffer(b"", np.uint8)
        return hdr, np.concatenate(parts)


def cram_file_to_bam_stream(path: str, ref: Optional[str] = None,
                            decode_md: bool = True, window: int = 8,
                            ) -> Tuple[SamHeader, bytes]:
    """CRAM file -> u32-framed BAM record stream (batch form)."""
    with CramReader(path, ref=ref, decode_md=decode_md) as r:
        hdr = r.header
        return hdr, b"".join(iter_slice_blobs(r, window=window))


def bam_to_cram_file(bam_path: str, cram_path: str, ref=None,
                     nthreads: int = 0, **opts) -> int:
    """Whole-file BAM -> CRAM fast path (the test_view -C shape):
    records stay raw bytes end to end — one native frame scan,
    vectorised tid/pos/endpos extraction for the container planner, and
    zero-parse RawRun views feeding the native slice encoder
    (cram_encode.c:1843 cram_encode_container without per-record
    bam1_t round trips).  Returns the record count."""
    import numpy as np

    from htslib_tpu.cram import CramWriter
    from htslib_tpu.cram.encode import RawRun
    from htslib_tpu.sam import BamReader

    from htslib_tpu.native import native

    with BamReader(bam_path) as r:
        header = r.header
        voff = r.fp.tell()          # virtual offset of the first record

    if native is not None:
        # whole-file batch path: one scan + one parallel inflate (the
        # BGZFReader.read_all streaming path costs ~2.4 s on a 92 MB
        # stream; this is ~0.25 s).  The record stream stays a numpy
        # view end to end — no whole-stream copy — and the planner
        # columns (tid/pos/endpos/flag) come from one native MT pass
        # instead of ragged numpy gathers.
        raw = np.fromfile(bam_path, np.uint8)
        co, cs, us = native.bgzf_scan(raw)
        stream = native.inflate_batch(raw, co, cs, us)
        ustarts = np.zeros(len(us), np.int64)
        np.cumsum(np.asarray(us[:-1], np.int64), out=ustarts[1:])
        bi = int(np.searchsorted(np.asarray(co, np.int64), voff >> 16))
        u_hdr = int(ustarts[bi]) + (voff & 0xFFFF)
        buf = np.ascontiguousarray(stream[u_hdr:])
        offs, sizes = native.bam_scan(buf, 0)
        offs = np.asarray(offs, np.int64)
        sizes = np.asarray(sizes, np.int64)
        tids, poss, ends, _flags = native.bam_fields(buf, offs)
        run = RawRun(buf, offs, sizes, tids, poss, ends)
        n = len(offs)
    else:
        with BamReader(bam_path) as r:
            data, offs, sizes = r.raw_records()
        buf = data.tobytes() if hasattr(data, "tobytes") else bytes(data)
        n = len(offs)
        arr = np.frombuffer(buf, np.uint8)
        offs = np.asarray(offs, np.int64)
        sizes = np.asarray(sizes, np.int64)

        def u32(field_off):
            cols = np.add.outer(offs + field_off,
                                np.arange(4, dtype=np.int64))
            b = arr[cols].astype(np.uint32)
            return (b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
                    | (b[:, 3] << 24))

        tids = u32(4).astype(np.int32)
        poss = u32(8).astype(np.int32)
        l_qname = arr[offs + 12].astype(np.int64)
        n_cigar = (arr[offs + 16].astype(np.int64)
                   | (arr[offs + 17].astype(np.int64) << 8))
        flags = (arr[offs + 18].astype(np.int64)
                 | (arr[offs + 19].astype(np.int64) << 8))

        # ragged cigar gather: reference span per record (bam_endpos)
        cig_start = offs + 4 + 32 + l_qname
        total = int(n_cigar.sum())
        if total:
            rec_of = np.repeat(np.arange(n), n_cigar)
            within = np.arange(total) - np.repeat(
                np.cumsum(n_cigar) - n_cigar, n_cigar)
            wpos = np.repeat(cig_start, n_cigar) + 4 * within
            cw_ = (arr[wpos].astype(np.uint32)
                   | (arr[wpos + 1].astype(np.uint32) << 8)
                   | (arr[wpos + 2].astype(np.uint32) << 16)
                   | (arr[wpos + 3].astype(np.uint32) << 24))
            op = cw_ & 0xF
            ln = (cw_ >> 4).astype(np.int64)
            consumes = ((op == 0) | (op == 2) | (op == 3) | (op == 7)
                        | (op == 8))
            span = np.zeros(n, np.int64)
            np.add.at(span, rec_of, np.where(consumes, ln, 0))
        else:
            span = np.zeros(n, np.int64)
        span = np.where((flags & 4) != 0, 0, span)
        ends = poss + np.where(span > 0, span, 1)
        run = RawRun(buf, offs, sizes, tids, poss, ends)
    with CramWriter(cram_path, header, ref=ref, nthreads=nthreads,
                    **opts) as w:
        enc = w._enc
        if enc.embed_ref:
            raise ValueError("bam_to_cram_file: embed_ref needs the "
                             "record path (CramWriter.write)")
        per = max(1, enc.seqs_per_slice * enc.slices_per_container)
        for lo in range(0, n, per):
            chunk = run[lo:lo + per]
            enc._write_data_container(chunk)
            enc.record_counter += len(chunk)
    return n
