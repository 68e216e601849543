"""FASTA/FASTQ indexing and random access (reference faidx.c:1-1066).

``.fai`` rows: name, sequence length, offset of first base, bases per
line, bytes per line; ``.fqi`` adds the quality-line offset
(fai_build_core, faidx.c:132).  Fetch works on plain or BGZF-compressed
files (the latter via the ``.gzi`` block index, faidx.c:716).
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple, Union

from htslib_tpu.bgzf import BGZFReader, GziIndex
from htslib_tpu.index import HTS_PARSE_ONE_COORD, parse_region, HTS_POS_MAX
from htslib_tpu.util.log import log_error, log_warning

FAI_FASTA = 0
FAI_FASTQ = 1


@dataclass
class FaiEntry:
    name: str
    length: int
    offset: int
    line_blen: int   # bases per line
    line_len: int    # bytes per line (incl. newline)
    qual_offset: int = -1  # fastq only


class Faidx:
    def __init__(self, fname: str, entries: List[FaiEntry],
                 fmt: int = FAI_FASTA):
        self.fname = fname
        self.entries = entries
        self.fmt = fmt
        self._byname: Dict[str, FaiEntry] = {e.name: e for e in entries}
        self._fp: Optional[BGZFReader] = None

    # ------------------------------------------------------------------
    @classmethod
    def build(cls, fname: str, fmt: Optional[int] = None,
              save: bool = True) -> "Faidx":
        """fai_build_core (faidx.c:132): single scan recording line
        geometry; errors on ragged line lengths (other than final)."""
        fp = BGZFReader(fname)
        first = fp.peek(1)
        if fmt is None:
            fmt = FAI_FASTQ if first == b"@" else FAI_FASTA
        entries: List[FaiEntry] = []
        state_name = None
        length = 0
        offset = 0
        line_blen = -1
        line_len = -1
        last_line_blen = -1
        qual_offset = -1

        def close_seq():
            nonlocal state_name
            if state_name is not None:
                entries.append(FaiEntry(state_name, length, offset,
                                        max(line_blen, 0), max(line_len, 0),
                                        qual_offset))
                state_name = None

        if fmt == FAI_FASTA:
            while True:
                pos = fp.utell()
                line = fp.readline()
                if not line:
                    break
                if line.startswith(b">"):
                    close_seq()
                    parts = line[1:].split()
                    # an empty name is recorded as-is (test/faidx/faidx.fa
                    # starts with a bare '>' and expected.fai keeps it)
                    state_name = parts[0].decode() if parts else ""
                    length = 0
                    line_blen = line_len = -1
                    last_line_blen = -1
                    offset = fp.utell()
                    qual_offset = -1
                    continue
                if state_name is None:
                    raise IOError(f"{fname}: not a FASTA file (data before '>')")
                blen = len(line.rstrip(b"\r\n"))
                if blen == 0:
                    # blank line ends the sequence body (faidx allows then
                    # requires next '>'; we tolerate trailing blanks)
                    last_line_blen = 0
                    continue
                if last_line_blen == 0:
                    raise IOError("FASTA sequence has blank line inside")
                if line_blen < 0:
                    line_blen = blen
                    line_len = len(line)
                elif blen > line_blen or (last_line_blen >= 0
                                          and last_line_blen != line_blen):
                    raise IOError(f"{fname}: different line length in "
                                  f"sequence {state_name!r}")
                last_line_blen = blen
                length += blen
            close_seq()
        else:
            while True:
                line = fp.readline()
                if not line:
                    break
                if not line.startswith(b"@"):
                    raise IOError(f"{fname}: malformed FASTQ header")
                state_name = line[1:].split()[0].decode()
                length = 0
                line_blen = line_len = -1
                offset = fp.utell()
                # sequence lines until '+'
                seq_lines = 0
                while True:
                    l2 = fp.readline()
                    if not l2 or l2.startswith(b"+"):
                        break
                    blen = len(l2.rstrip(b"\r\n"))
                    if line_blen < 0:
                        line_blen = blen
                        line_len = len(l2)
                    length += blen
                    seq_lines += 1
                qual_offset = fp.utell()
                got = 0
                while got < length:
                    l3 = fp.readline()
                    if not l3:
                        raise IOError("truncated FASTQ quality")
                    got += len(l3.rstrip(b"\r\n"))
                entries.append(FaiEntry(state_name, length, offset,
                                        max(line_blen, 0), max(line_len, 0),
                                        qual_offset))
                state_name = None
        fp.close()
        fai = cls(fname, entries, fmt)
        if save:
            fai.save()
        return fai

    def save(self, path: Optional[str] = None) -> None:
        ext = ".fai" if self.fmt == FAI_FASTA else ".fqi"
        path = path or self.fname + ext
        with open(path, "w") as f:
            for e in self.entries:
                if self.fmt == FAI_FASTA:
                    f.write(f"{e.name}\t{e.length}\t{e.offset}\t"
                            f"{e.line_blen}\t{e.line_len}\n")
                else:
                    f.write(f"{e.name}\t{e.length}\t{e.offset}\t"
                            f"{e.line_blen}\t{e.line_len}\t{e.qual_offset}\n")

    @classmethod
    def load(cls, fname: str, fai_path: Optional[str] = None,
             build_missing: bool = True) -> "Faidx":
        """fai_load3 (faidx.c:590): load .fai/.fqi, build if absent."""
        for ext, fmt in ((".fai", FAI_FASTA), (".fqi", FAI_FASTQ)):
            p = fai_path or fname + ext
            if os.path.exists(p):
                entries = []
                with open(p) as f:
                    for line in f:
                        cols = line.rstrip("\n").split("\t")
                        if len(cols) < 5:
                            raise IOError(f"malformed index line in {p}")
                        e = FaiEntry(cols[0], int(cols[1]), int(cols[2]),
                                     int(cols[3]), int(cols[4]),
                                     int(cols[5]) if len(cols) > 5 else -1)
                        entries.append(e)
                return cls(fname, entries,
                           FAI_FASTQ if (entries and entries[0].qual_offset >= 0)
                           else fmt)
            if fai_path:
                break
        if build_missing:
            return cls.build(fname)
        raise FileNotFoundError(f"no index for {fname}")

    # ------------------------------------------------------------------
    @property
    def nseq(self) -> int:
        return len(self.entries)

    def seq_names(self) -> List[str]:
        return [e.name for e in self.entries]

    def seq_len(self, name: str) -> int:
        e = self._byname.get(name)
        return e.length if e else -1

    def has_seq(self, name: str) -> bool:
        return name in self._byname

    def _file(self) -> BGZFReader:
        if self._fp is None:
            self._fp = BGZFReader(self.fname)
            if self._fp.is_bgzf:
                gzi = self.fname + ".gzi"
                if os.path.exists(gzi):
                    self._fp.load_index(gzi)
                else:
                    # build in-memory block map
                    import numpy as np
                    from htslib_tpu.bgzf import scan_blocks
                    raw = open(self.fname, "rb").read()
                    table = scan_blocks(np.frombuffer(raw, np.uint8))
                    self._fp.idx = GziIndex.from_table(table)
            elif self._fp.is_gzip:
                raise IOError(f"{self.fname} is gzip (not bgzip) compressed; "
                              "random access is not possible")
        return self._fp

    def _retrieve(self, e: FaiEntry, base_offset: int, beg: int, end: int,
                  ) -> str:
        """fai_retrieve (faidx.c:716): line-geometry seek + strip newlines."""
        if beg < 0:
            beg = 0
        if end > e.length:
            end = e.length
        if beg >= end or e.line_blen == 0:
            return ""
        fp = self._file()
        start = base_offset + (beg // e.line_blen) * e.line_len + beg % e.line_blen
        fp.useek(start)
        need = end - beg
        out = []
        # read whole lines and strip terminators
        remaining_in_line = e.line_blen - beg % e.line_blen
        while need > 0:
            take = min(need, remaining_in_line)
            chunk = fp.read(take)
            if len(chunk) < take:
                raise IOError("truncated sequence data")
            out.append(chunk)
            need -= take
            if need > 0:
                fp.read(e.line_len - e.line_blen)  # skip newline bytes
                remaining_in_line = e.line_blen
        return b"".join(out).decode("ascii")

    def fetch_seq(self, name: str, beg: int = 0, end: int = HTS_POS_MAX) -> str:
        """faidx_fetch_seq64 (faidx.c:972): 0-based [beg, end)."""
        e = self._byname.get(name)
        if e is None:
            raise KeyError(f"unknown sequence {name!r}")
        return self._retrieve(e, e.offset, beg, end)

    def fetch_qual(self, name: str, beg: int = 0, end: int = HTS_POS_MAX) -> str:
        e = self._byname.get(name)
        if e is None or e.qual_offset < 0:
            raise KeyError(f"no qualities for {name!r}")
        return self._retrieve(e, e.qual_offset, beg, end)

    def fetch(self, region: str) -> Tuple[str, str]:
        """fai_fetch64 (faidx.c:846): region string form; returns
        (name, seq)."""
        def n2i(s: str) -> int:
            return self.seq_names().index(s) if s in self._byname else -1
        res = parse_region(region, n2i, HTS_PARSE_ONE_COORD)
        if res is None:
            raise ValueError(f"could not parse region {region!r}")
        tid, beg, end, _ = res
        name = self.entries[tid].name
        return name, self.fetch_seq(name, beg, end)

    def adjust_region(self, name: str, beg: int, end: int) -> Tuple[int, int]:
        """fai_adjust_region (faidx.c:952): clamp to sequence bounds."""
        e = self._byname.get(name)
        if e is None:
            return -1, -1
        if beg < 0:
            beg = 0
        if end < 0 or end > e.length:
            end = e.length
        if beg > e.length:
            beg = e.length
        return beg, end

    def close(self) -> None:
        if self._fp is not None:
            self._fp.close()
            self._fp = None
