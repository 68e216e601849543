"""SAM text I/O (reference sam.c:2662 sam_parse1 / sam.c:4324
sam_format1; threaded dispatcher sam.c:3325/3497 is replaced by batch
formatting in htslib_tpu.sam.batch)."""
from __future__ import annotations

from typing import Iterator, Optional, Union

from htslib_tpu.bgzf import BGZFReader, BGZFWriter
from htslib_tpu.hfile import HFile, hopen
from htslib_tpu.sam.header import SamHeader
from htslib_tpu.sam.record import BamRecord


class SamReader:
    """Reads SAM text (plain, gzip or BGZF)."""

    def __init__(self, src: Union[str, HFile, BGZFReader]):
        self.fp = src if isinstance(src, BGZFReader) else BGZFReader(src)
        lines = []
        self._pending: Optional[bytes] = None
        while True:
            line = self.fp.readline()
            if not line:
                break
            if line.startswith(b"@"):
                lines.append(line.decode("utf-8", "replace").rstrip("\n"))
            else:
                self._pending = line
                break
        self.header = SamHeader("\n".join(lines) + ("\n" if lines else ""))

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
        if self._pending is not None:
            line, self._pending = self._pending, None
        else:
            line = self.fp.readline()
        while line in (b"\n", b"\r\n"):
            line = self.fp.readline()
        if not line:
            return None
        return BamRecord.from_sam(line.decode("utf-8"), self.header)

    def close(self) -> None:
        self.fp.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class SamWriter:
    """Writes SAM text; optionally BGZF-compressed ('z' mode)."""

    def __init__(self, dst: Union[str, HFile], header: SamHeader,
                 write_header: bool = True, compress: bool = False,
                 level: int = -1):
        if compress:
            self.fp = dst if isinstance(dst, BGZFWriter) else BGZFWriter(dst, level=level)
        elif isinstance(dst, str):
            self.fp = hopen(dst, "wb")
        else:
            self.fp = dst
        self.header = header
        if write_header:
            text = header.full_text_with_refs()
            if text:
                self.fp.write(text.encode("utf-8"))

    def write(self, rec: BamRecord) -> None:
        self.fp.write(rec.to_sam(self.header).encode("utf-8") + b"\n")

    def write_line(self, line: str) -> None:
        self.fp.write(line.encode("utf-8") + b"\n")

    def close(self) -> None:
        if isinstance(self.fp, BGZFWriter):
            self.fp.close()
        else:
            self.fp.flush()
            self.fp.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
