""".crai index (reference cram/cram_index.c).

Gzipped text lines: ref_id, start, span, container_offset, slice_offset
(within container, i.e. landmark), slice_size.  Queries return container
offsets to seek to (cram_index_query, cram_index.c:404).
"""
from __future__ import annotations

import gzip
import zlib
from dataclasses import dataclass
from typing import List, Optional, Tuple


@dataclass
class CraiEntry:
    refid: int
    start: int
    span: int
    offset: int       # container file offset
    slice_off: int    # landmark (offset of slice within container data)
    slice_len: int


class CramIndex:
    def __init__(self, entries: List[CraiEntry]):
        self.entries = entries

    @classmethod
    def load(cls, path: str) -> "CramIndex":
        raw = open(path, "rb").read()
        if raw[:2] == b"\x1f\x8b":
            raw = zlib.decompress(raw, 31)
        entries = []
        for line in raw.decode().splitlines():
            if not line:
                continue
            f = line.split("\t")
            entries.append(CraiEntry(int(f[0]), int(f[1]), int(f[2]),
                                     int(f[3]), int(f[4]), int(f[5])))
        return cls(entries)

    def save(self, path: str) -> None:
        out = "".join(f"{e.refid}\t{e.start}\t{e.span}\t{e.offset}\t"
                      f"{e.slice_off}\t{e.slice_len}\n" for e in self.entries)
        with gzip.open(path, "wb") as f:
            f.write(out.encode())

    def query(self, refid: int, beg: int, end: int) -> List[CraiEntry]:
        """All slices overlapping [beg, end] (1-based inclusive like the
        reference's usage)."""
        hits = []
        for e in self.entries:
            if e.refid != refid:
                continue
            if e.refid >= 0:
                e_start, e_end = e.start, e.start + e.span - 1
                if e_start <= end and e_end >= beg:
                    hits.append(e)
            else:
                hits.append(e)
        return hits

    def container_offsets(self, refid: int, beg: int, end: int) -> List[int]:
        seen = []
        for e in self.query(refid, beg, end):
            if e.offset not in seen:
                seen.append(e.offset)
        return seen
