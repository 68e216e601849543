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

    def __next__(self) -> BamRecord:
        rec = self.read1()
        if rec is None:
            raise StopIteration
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
                 level: int = -1):
        self.fp = dst if isinstance(dst, BGZFWriter) else BGZFWriter(dst, level=level)
        self.header = header
        write_bam_header(self.fp, header)

    def write(self, rec: BamRecord) -> None:
        payload = rec.to_bam_buffer()
        self.fp.write(struct.pack("<I", len(payload)))
        self.fp.write(payload)

    def tell(self) -> int:
        return self.fp.tell()

    def close(self) -> None:
        self.fp.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
