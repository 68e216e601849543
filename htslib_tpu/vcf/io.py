"""VCF/BCF file I/O (reference vcf.c:1349 bcf_hdr_read, :2256 bcf_read,
:2510 bcf_write, :4699 vcf_hdr_read/vcf_read)."""
from __future__ import annotations

import struct
from typing import Iterator, Optional, Union

from htslib_tpu.bgzf import BGZFReader, BGZFWriter
from htslib_tpu.format import Compression, Format, detect_format
from htslib_tpu.hfile import HFile, hopen
from htslib_tpu.vcf.header import BcfHeader
from htslib_tpu.vcf.record import BcfRecord

BCF_MAGIC = b"BCF\x02\x02"


class VcfReader:
    """Text VCF (plain/gzip/BGZF)."""

    def __init__(self, src: Union[str, HFile, BGZFReader]):
        self.fp = src if isinstance(src, BGZFReader) else BGZFReader(src)
        lines = []
        self._pending: Optional[bytes] = None
        while True:
            line = self.fp.readline()
            if not line:
                break
            if line.startswith(b"#"):
                lines.append(line.decode("utf-8", "replace").rstrip("\n"))
                if line.startswith(b"#CHROM"):
                    break
            else:
                self._pending = line
                break
        self.header = BcfHeader("\n".join(lines) + "\n" if lines else "")

    def __iter__(self) -> Iterator[BcfRecord]:
        return self

    def __next__(self) -> BcfRecord:
        rec = self.read1()
        if rec is None:
            raise StopIteration
        return rec

    def read1(self) -> Optional[BcfRecord]:
        if self._pending is not None:
            line, self._pending = self._pending, None
        else:
            line = self.fp.readline()
        while line in (b"\n", b"\r\n"):
            line = self.fp.readline()
        if not line:
            return None
        return BcfRecord.from_vcf(line.decode("utf-8"), self.header)

    def tell(self) -> int:
        return self.fp.tell()

    def seek(self, voffset: int) -> None:
        self.fp.seek(voffset)

    def close(self) -> None:
        self.fp.close()

    def __enter__(self):
        return self

    def __exit__(self, *e):
        self.close()


class BcfReader:
    def __init__(self, src: Union[str, HFile, BGZFReader]):
        self.name = src if isinstance(src, str) else getattr(src, "name", "?")
        self.fp = src if isinstance(src, BGZFReader) else BGZFReader(src)
        magic = self.fp.read(5)
        if magic[:3] != b"BCF" or magic[3] != 2:
            raise IOError("invalid BCF2 magic")
        self.minor = magic[4]
        (l_text,) = struct.unpack("<I", self.fp.read(4))
        text = self.fp.read(l_text).rstrip(b"\0").decode("utf-8", "replace")
        self.header = BcfHeader(text)

    def __iter__(self) -> Iterator[BcfRecord]:
        return self

    def __next__(self) -> BcfRecord:
        rec = self.read1()
        if rec is None:
            raise StopIteration
        return rec

    def read1(self) -> Optional[BcfRecord]:
        head = self.fp.read(8)
        if len(head) == 0:
            return None
        if len(head) < 8:
            raise IOError("truncated BCF record")
        l_shared, l_indiv = struct.unpack("<II", head)
        shared = self.fp.read(l_shared)
        indiv = self.fp.read(l_indiv)
        if len(shared) != l_shared or len(indiv) != l_indiv:
            raise IOError("truncated BCF record")
        return BcfRecord.from_bcf(shared, indiv, self.header)

    def tell(self) -> int:
        return self.fp.tell()

    def seek(self, voffset: int) -> None:
        self.fp.seek(voffset)

    def fetch(self, rid: int, beg: int, end: int,
              index: "Optional[object]" = None) -> Iterator[BcfRecord]:
        """Indexed region query over a CSI index (bcf_itr_queryi; the
        shared hts_itr machinery, hts.c:3426).  beg/end 0-based
        half-open."""
        if index is None:
            index = getattr(self, "_index", None)
        if index is None:
            from htslib_tpu.index import HtsIndex
            index = HtsIndex.load(self.name + ".csi")
            self._index = index
        for u, v in index.query_chunks(rid, beg, end):
            self.fp.seek(u)
            while True:
                if v and self.fp.tell() >= v:
                    break
                rec = self.read1()
                if rec is None:
                    break
                if rec.rid != rid or rec.pos >= end:
                    break
                if rec.pos + max(rec.rlen, 1) > beg:
                    yield rec

    def close(self) -> None:
        self.fp.close()

    def __enter__(self):
        return self

    def __exit__(self, *e):
        self.close()


class VcfWriter:
    def __init__(self, dst: Union[str, HFile], header: BcfHeader,
                 compress: bool = False, level: int = -1):
        if compress:
            self.fp = BGZFWriter(dst, level=level) if not isinstance(dst, BGZFWriter) else dst
        elif isinstance(dst, str):
            self.fp = hopen(dst, "wb")
        else:
            self.fp = dst
        self.header = header
        self.fp.write(header.text().encode("utf-8"))

    def write(self, rec: BcfRecord) -> None:
        self.fp.write(rec.to_vcf(self.header).encode("utf-8") + b"\n")

    def close(self) -> None:
        if isinstance(self.fp, BGZFWriter):
            self.fp.close()
        else:
            self.fp.flush()
            self.fp.close()

    def __enter__(self):
        return self

    def __exit__(self, *e):
        self.close()


class BcfWriter:
    def __init__(self, dst: Union[str, HFile, BGZFWriter], header: BcfHeader,
                 level: int = -1, build_index: bool = False):
        self._name = dst if isinstance(dst, str) else None
        self.fp = dst if isinstance(dst, BGZFWriter) else BGZFWriter(dst, level=level)
        self.header = header
        # BCF headers carry IDX= on every dictionary line (the
        # reference attaches them at hrec registration and strips them
        # only for text VCF output, vcf.c:2722) — required so dictionary
        # ids survive header-edit reordering
        text = header.text(with_idx=True).encode("utf-8") + b"\0"
        self.fp.write(BCF_MAGIC)
        self.fp.write(struct.pack("<I", len(text)))
        self.fp.write(text)
        # on-the-fly CSI (bcf_idx_init/bcf_idx_save, the --write-index
        # path): record uncompressed end offsets, map to virtual offsets
        # through the writer's block table at close
        self._index_recs = [] if build_index else None
        self._uheader_end = self._utell() if build_index else None

    def _utell(self) -> int:
        return (self.fp._uncompressed + sum(len(p) for p in self.fp._pending)
                + len(self.fp._buf))

    def write(self, rec: BcfRecord) -> None:
        shared, indiv = rec.to_bcf()
        self.fp.write(struct.pack("<II", len(shared), len(indiv)))
        self.fp.write(shared)
        self.fp.write(indiv)
        if self._index_recs is not None:
            self._index_recs.append((rec.rid, rec.pos,
                                     rec.pos + max(rec.rlen, 1),
                                     self._utell()))

    def tell(self) -> int:
        return self.fp.tell()

    def close(self) -> None:
        if self._index_recs is not None:
            import bisect

            from htslib_tpu.bgzf import make_virtual_offset
            from htslib_tpu.index import HTS_FMT_CSI, HtsIndex
            self.fp.flush()
            co, uo = self.fp._idx_co, self.fp._idx_uo

            def u2v(u):
                i = bisect.bisect_right(uo, u) - 1
                return make_virtual_offset(co[i], u - uo[i])

            idx = HtsIndex(len(self.header.ctg_names), HTS_FMT_CSI, 14, 5)
            off0 = u2v(self._uheader_end or 0)
            idx._last_off = idx._save_off = off0
            idx._off_beg = idx._off_end = off0
            last = off0
            for rid, beg, end, uend in self._index_recs:
                last = u2v(uend)
                idx.push(rid, beg, end, last, True)
            idx.finish(last)
            if self._name:
                idx.save(self._name + ".csi")
            self.index = idx
        self.fp.close()

    def __enter__(self):
        return self

    def __exit__(self, *e):
        self.close()


def open_vcf(name: str, mode: str = "r", header: Optional[BcfHeader] = None):
    """hts_open for variant data: r auto-detects VCF vs BCF; modes
    w / wz / wb mirror the reference's letters."""
    if "r" in mode:
        fp = hopen(name, "rb")
        fmt = detect_format(fp.peek(1 << 16))
        if fmt.format == Format.bcf:
            return BcfReader(fp)
        if fmt.format in (Format.vcf, Format.text_format, Format.empty_format):
            return VcfReader(fp)
        raise IOError(f"cannot read {name}: not variant data "
                      f"({fmt.description()})")
    if header is None:
        raise ValueError("writing requires a header")
    level = -1
    for ch in mode:
        if ch.isdigit():
            level = int(ch)
    if "b" in mode and "u" not in mode:
        return BcfWriter(name, header, level=level)
    return VcfWriter(name, header, compress="z" in mode, level=level)


def bcf_index_build(path: str, min_shift: int = 14,
                    out: "Optional[str]" = None) -> "object":
    """Build a CSI index for a BCF (bcf_index_build, vcf.c; same binning
    machinery as BAM).  Returns the HtsIndex and writes ``path.csi``."""
    from htslib_tpu.index import HTS_FMT_CSI, HtsIndex
    with BcfReader(path) as r:
        n_lvls = 5
        idx = HtsIndex(len(r.header.ctg_names), HTS_FMT_CSI,
                       min_shift, n_lvls)
        last = r.tell()
        idx._last_off = idx._save_off = last
        idx._off_beg = idx._off_end = last
        while True:
            rec = r.read1()
            if rec is None:
                break
            last = r.tell()
            idx.push(rec.rid, rec.pos, rec.pos + max(rec.rlen, 1), last,
                     True)
        idx.finish(last)
    idx.save(out or path + ".csi")
    return idx


def bcf_file_to_vcf(src: Union[str, HFile]) -> "tuple":
    """Whole-file BCF -> VCF text fast path: BGZF batch inflate + the
    native typed-value formatter (vcf_format port, vcf.c:4304).
    Returns (header, vcf_body_bytes); falls back to the per-record
    Python path when the native library is unavailable."""
    import numpy as np

    from htslib_tpu.native import native

    if native is not None and isinstance(src, str):
        # whole-file batch path: one scan + one parallel inflate, then
        # the native formatter over the body (header parsed from the
        # inflated stream directly)
        raw = np.fromfile(src, np.uint8)
        co, cs, us = native.bgzf_scan(raw)
        stream = native.inflate_batch(raw, co, cs, us)
        head = stream[:9].tobytes()
        if head[:3] != b"BCF" or head[3] != 2:
            raise IOError("invalid BCF2 magic")
        (l_text,) = struct.unpack_from("<I", head, 5)
        header = BcfHeader(stream[9:9 + l_text].tobytes()
                           .rstrip(b"\0").decode("utf-8", "replace"))
        body = stream[9 + l_text:]
        return header, native.bcf_to_vcf(
            body, header.ctg_names, header.id_names, header.id2int("GT"),
            header.v44)

    r = BcfReader(src)
    try:
        header = r.header
        body = r.fp.read_all()
        data = np.asarray(body, np.uint8) if not isinstance(
            body, np.ndarray) else body
        if native is not None:
            gt_id = header.id2int("GT")
            return header, native.bcf_to_vcf(
                data, header.ctg_names, header.id_names, gt_id, header.v44)
        lines = []
        buf = data.tobytes()
        pos = 0
        while pos + 8 <= len(buf):
            l_shared, l_indiv = struct.unpack_from("<II", buf, pos)
            shared = buf[pos + 8:pos + 8 + l_shared]
            indiv = buf[pos + 8 + l_shared:pos + 8 + l_shared + l_indiv]
            pos += 8 + l_shared + l_indiv
            lines.append(
                BcfRecord.from_bcf(shared, indiv, header).to_vcf(header))
        return header, ("\n".join(lines) + ("\n" if lines else "")).encode()
    finally:
        r.close()


def _header_parse_tables(header: BcfHeader):
    """Marshal the header dictionaries for the native VCF parser."""
    import numpy as np

    from htslib_tpu.vcf.header import BCF_HL_FLT, BCF_HL_FMT, BCF_HL_INFO
    n = len(header.id_names)
    flt_def = np.full(n, -1, np.int32)
    info_type = np.full(n, -1, np.int32)
    fmt_type = np.full(n, -1, np.int32)
    for i, info in enumerate(header.id_info):
        flt_def[i] = info.type[BCF_HL_FLT]
        info_type[i] = info.type[BCF_HL_INFO]
        fmt_type[i] = info.type[BCF_HL_FMT]
    return flt_def, info_type, fmt_type


def vcf_body_to_bcf_frames(body: bytes, header: BcfHeader) -> bytes:
    """VCF body text -> concatenated BCF record frames, native fast
    path with per-line Python fallback for records that need header
    mutation (unknown contigs/keys) or exotic values."""
    import numpy as np

    from htslib_tpu.native import native

    n_lines = body.count(b"\n") + (0 if body.endswith(b"\n") or not body
                                   else 1)
    if n_lines == 0:
        return b""
    if native is None:
        frames = bytearray()
        for line in body.splitlines():
            if not line.strip():
                continue
            rec = BcfRecord.from_vcf(line.decode("utf-8"), header)
            shared, indiv = rec.to_bcf()
            frames += struct.pack("<II", len(shared), len(indiv))
            frames += shared + indiv
        return bytes(frames)

    flt_def, info_type, fmt_type = _header_parse_tables(header)
    frames, bails = native.vcf_parse(
        np.frombuffer(body, np.uint8), header.id_names, flt_def,
        info_type, fmt_type, header.ctg_names, header.id2int("GT"),
        header.id2int("END"), header.n_samples, n_lines, header.v44)
    if not bails.any():
        return frames
    # splice Python-parsed frames for the bailing lines, in order
    # (split exactly like the native walker: '\n' only)
    lines = body.split(b"\n")
    if lines and lines[-1] == b"":
        lines.pop()
    lines = [l[:-1] if l.endswith(b"\r") else l for l in lines]
    out = bytearray()
    fpos = 0
    mv = memoryview(frames)
    for i, line in enumerate(lines):
        if i < len(bails) and not bails[i]:
            l_shared, l_indiv = struct.unpack_from("<II", mv, fpos)
            sz = 8 + l_shared + l_indiv
            out += mv[fpos:fpos + sz]
            fpos += sz
        else:
            if not line.strip():
                continue
            rec = BcfRecord.from_vcf(line.decode("utf-8"), header)
            shared, indiv = rec.to_bcf()
            out += struct.pack("<II", len(shared), len(indiv))
            out += shared + indiv
    return bytes(out)


def vcf_file_to_bcf(src: str, dst: str) -> int:
    """Whole-file VCF -> BCF fast path: header parse + native body
    parse + BGZF write.  Returns the record count."""
    with hopen(src, "rb") as f:
        raw = f.read(-1)
    if raw[:2] == b"\x1f\x8b":
        import gzip
        raw = gzip.decompress(bytes(raw))
    raw = bytes(raw)
    # split header from body
    pos = 0
    while pos < len(raw) and raw[pos:pos + 1] == b"#":
        nl = raw.find(b"\n", pos)
        if nl < 0:
            pos = len(raw)
            break
        pos = nl + 1
    header = BcfHeader(raw[:pos].decode("utf-8", "replace"))
    body = raw[pos:]
    frames = vcf_body_to_bcf_frames(body, header)
    n = 0
    p = 0
    while p < len(frames):
        l_shared, l_indiv = struct.unpack_from("<II", frames, p)
        p += 8 + l_shared + l_indiv
        n += 1
    w = BcfWriter(dst, header)
    try:
        w.fp.write(frames)
    finally:
        w.close()
    return n
