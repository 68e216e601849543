"""BAM container I/O (reference sam.c:703-900 bam_hdr/bam_read1/bam_write1).

Streaming record API plus the bulk batch path: ``BamReader.raw_records``
inflates the whole stream through the BGZF batch codec and frames records
with the native scan — the input stage of the TPU columnar pipeline.
"""
from __future__ import annotations

import struct
from typing import Iterator, List, Optional, Tuple, Union

import numpy as np

from htslib_tpu.bgzf import BGZFReader, BGZFWriter
from htslib_tpu.hfile import HFile
from htslib_tpu.sam.header import SamHeader
from htslib_tpu.sam.record import BamRecord

BAM_MAGIC = b"BAM\x01"


def read_bam_header(fp: BGZFReader) -> SamHeader:
    """bam_hdr_read (sam.c:703): magic, l_text, text, n_ref, refs."""
    magic = fp.read(4)
    if magic != BAM_MAGIC:
        raise IOError("invalid BAM binary header (wrong magic)")
    (l_text,) = struct.unpack("<i", fp.read(4))
    text = fp.read(l_text).rstrip(b"\0").decode("utf-8", "replace")
    (n_ref,) = struct.unpack("<i", fp.read(4))
    refs: List[Tuple[str, int]] = []
    for _ in range(n_ref):
        (l_name,) = struct.unpack("<i", fp.read(4))
        name = fp.read(l_name).rstrip(b"\0").decode("utf-8")
        (l_ref,) = struct.unpack("<i", fp.read(4))
        refs.append((name, l_ref))
    return SamHeader(text, refs)


def write_bam_header(fp: BGZFWriter, hdr: SamHeader) -> None:
    """bam_hdr_write (sam.c:918): text verbatim, then binary ref list."""
    text = hdr.text.encode("utf-8")
    fp.write(BAM_MAGIC)
    fp.write(struct.pack("<i", len(text)))
    fp.write(text)
    fp.write(struct.pack("<i", hdr.nref))
    for name, length in zip(hdr.ref_names, hdr.ref_lens):
        nb = name.encode("utf-8") + b"\0"
        fp.write(struct.pack("<i", len(nb)))
        fp.write(nb)
        fp.write(struct.pack("<i", length))


class BamReader:
    def __init__(self, src: Union[str, HFile, BGZFReader]):
        self.fp = src if isinstance(src, BGZFReader) else BGZFReader(src)
        self.header = read_bam_header(self.fp)

    def __iter__(self) -> Iterator[BamRecord]:
        return self

    def set_filter(self, expr: Optional[str]) -> None:
        """hts_set_filter_expression (hts.c:1967): the iterator skips
        records failing the expression (sam_passes_filter, sam.c:1535)."""
        from htslib_tpu.hts_expr import HtsFilter
        self._filter = HtsFilter(expr) if expr else None

    def __next__(self) -> BamRecord:
        while True:
            rec = self.read1()
            if rec is None:
                raise StopIteration
            filt = getattr(self, "_filter", None)
            if filt is None:
                return rec
            from htslib_tpu.hts_expr import sam_passes_filter
            if sam_passes_filter(rec, self.header, filt):
                return rec

    def read1(self) -> Optional[BamRecord]:
        """bam_read1 (sam.c:784)."""
        szb = self.fp.read(4)
        if len(szb) == 0:
            return None
        if len(szb) < 4:
            raise IOError("truncated BAM record")
        (block_size,) = struct.unpack("<I", szb)
        if block_size < 32:
            raise IOError("invalid BAM record size")
        payload = self.fp.read(block_size)
        if len(payload) != block_size:
            raise IOError("truncated BAM record")
        rec = BamRecord.from_bam_buffer(payload)
        self._validate(rec)
        return rec

    def _validate(self, rec: BamRecord) -> None:
        """Reference-name bounds checks (sam.c:824-833)."""
        nref = self.header.nref
        if rec.tid >= nref or rec.mtid >= nref:
            raise IOError("BAM record refers to nonexistent reference")

    def tell(self) -> int:
        return self.fp.tell()

    def seek(self, voffset: int) -> None:
        self.fp.seek(voffset)

    def raw_records(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Bulk path: inflate the remaining stream, frame every record.

        Returns (data, offsets, sizes): a contiguous uint8 array of the
        uncompressed byte stream plus per-record offsets (pointing at each
        record's 4-byte block_size field) and total sizes.
        """
        from htslib_tpu.native import native
        data = self.fp.read_all()
        if native is not None:
            offs, sizes = native.bam_scan(data, 0)
        else:
            offs_l, sizes_l = [], []
            pos, n = 0, len(data)
            mv = data
            while pos + 4 <= n:
                bsz = int.from_bytes(mv[pos:pos + 4], "little")
                offs_l.append(pos)
                sizes_l.append(bsz + 4)
                pos += 4 + bsz
            if pos != n:
                raise IOError("truncated BAM record stream")
            offs = np.array(offs_l, np.uint64)
            sizes = np.array(sizes_l, np.uint32)
        return data, offs, sizes

    def close(self) -> None:
        self.fp.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class BamWriter:
    def __init__(self, dst: Union[str, HFile, BGZFWriter], header: SamHeader,
                 level: int = -1, build_index: bool = False):
        self.fp = dst if isinstance(dst, BGZFWriter) else BGZFWriter(dst, level=level)
        self.header = header
        self._index_recs = None
        self._uwritten = 0
        if build_index:
            # On-the-fly indexing: record each record's uncompressed end
            # offset, then map to virtual offsets through the writer's
            # block table at close.  This reproduces the reader-side
            # voffset convention exactly (incl. the block-boundary
            # (next_block, 0) form the reference needs hts_idx_amend_last
            # for, hts.c:2708).
            max_len = max(header.ref_lens, default=0)
            if max_len + 256 > (1 << (14 + 3 * 5)):
                raise ValueError("reference too long for BAI; use CSI")
            self._index_recs = []
        write_bam_header(self.fp, header)
        self._uheader_end = None

    def write(self, rec: BamRecord) -> None:
        payload = rec.to_bam_buffer()
        if self._index_recs is not None and self._uheader_end is None:
            self._uheader_end = self.fp._uncompressed + \
                sum(len(p) for p in self.fp._pending) + len(self.fp._buf)
        self.fp.write(struct.pack("<I", len(payload)))
        self.fp.write(payload)
        if self._index_recs is not None:
            uend = (self.fp._uncompressed
                    + sum(len(p) for p in self.fp._pending)
                    + len(self.fp._buf))
            from htslib_tpu.sam.record import FUNMAP
            self._index_recs.append((rec.tid, rec.pos, rec.endpos(), uend,
                                     not (rec.flag & FUNMAP)))

    def tell(self) -> int:
        return self.fp.tell()

    def close(self) -> None:
        if self._index_recs is not None:
            from htslib_tpu.bgzf import make_virtual_offset
            from htslib_tpu.index import HTS_FMT_BAI, HtsIndex
            self.fp.flush()
            co = self.fp._idx_co  # compressed block offsets (+ EOF entry)
            uo = self.fp._idx_uo  # uncompressed block start offsets
            import bisect

            def u2v(u):
                i = bisect.bisect_right(uo, u) - 1
                return make_virtual_offset(co[i], u - uo[i])

            idx = HtsIndex(self.header.nref, HTS_FMT_BAI, 14, 5)
            off0 = u2v(self._uheader_end or 0)
            idx._last_off = idx._save_off = off0
            idx._off_beg = idx._off_end = off0
            for tid, beg, end, uend, mapped in self._index_recs:
                idx.push(tid, beg, end, u2v(uend), mapped)
            idx.finish(u2v(self.fp._uncompressed))
            name = getattr(self.fp, "name", None)
            self.fp.close()
            if name and name != "?":
                idx.save(name + ".bai")
            self.idx = idx
            return
        self.fp.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
