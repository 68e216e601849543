"""Synced VCF/BCF reader (reference synced_bcf_reader.c:1-1561, pairing
logic bcf_sr_sort.c; API htslib/synced_bcf_reader.h).

N variant files iterated in locus lock-step: each call to next_line()
advances to the next (chrom, pos) present in any reader and exposes the
matching record (or None) per reader.  Supports streaming (sorted inputs)
and indexed region queries, target filtering, and the allele pairing
modes (exact / snps / indels / all / some).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

from htslib_tpu.vcf import BcfRecord, open_vcf
from htslib_tpu.vcf.header import BcfHeader

BCF_SR_PAIR_SNPS = 1
BCF_SR_PAIR_INDELS = 2
BCF_SR_PAIR_ANY = 4
BCF_SR_PAIR_SNP_REF = 8
BCF_SR_PAIR_INDEL_REF = 16
BCF_SR_PAIR_EXACT = 32
BCF_SR_PAIR_BOTH = BCF_SR_PAIR_SNPS | BCF_SR_PAIR_INDELS
BCF_SR_PAIR_BOTH_REF = BCF_SR_PAIR_BOTH | BCF_SR_PAIR_SNP_REF | BCF_SR_PAIR_INDEL_REF
BCF_SR_PAIR_ALL = BCF_SR_PAIR_BOTH_REF | BCF_SR_PAIR_ANY
BCF_SR_PAIR_SOME = BCF_SR_PAIR_BOTH | BCF_SR_PAIR_ANY


def _vtype(rec: BcfRecord) -> str:
    """snp / indel / ref classification of a record's alts."""
    if rec.n_allele <= 1:
        return "ref"
    ref = rec.alleles[0]
    has_snp = has_indel = False
    for alt in rec.alleles[1:]:
        if alt in (".", "<NON_REF>", "<*>"):
            continue
        if len(alt) == len(ref):
            has_snp = True
        else:
            has_indel = True
    if has_indel and not has_snp:
        return "indel"
    if has_snp and not has_indel:
        return "snp"
    if has_indel and has_snp:
        return "both"
    return "ref"


class _Reader:
    def __init__(self, fname: str, regions=None):
        self.fp = open_vcf(fname)
        self.header: BcfHeader = self.fp.header
        self.buffer: List[BcfRecord] = []
        self.eof = False
        self.current: Optional[BcfRecord] = None

    def peek(self) -> Optional[BcfRecord]:
        if not self.buffer and not self.eof:
            rec = self.fp.read1()
            if rec is None:
                self.eof = True
            else:
                self.buffer.append(rec)
        return self.buffer[0] if self.buffer else None

    def pop(self) -> Optional[BcfRecord]:
        rec = self.peek()
        if rec is not None:
            self.buffer.pop(0)
        return rec


class SyncedReader:
    def __init__(self, pair: int = BCF_SR_PAIR_EXACT,
                 regions: Optional[Sequence[str]] = None,
                 targets: Optional[Sequence[str]] = None):
        self.readers: List[_Reader] = []
        self.pair = pair
        self.regions = regions
        self.targets = targets
        self._chr_order: Dict[str, int] = {}
        self.lines: List[Optional[BcfRecord]] = []

    @property
    def nreaders(self) -> int:
        return len(self.readers)

    def add_reader(self, fname: str) -> None:
        self.readers.append(_Reader(fname))
        # merge chromosome ordering from header contig lists
        for name in self.readers[-1].header.ctg_names:
            if name not in self._chr_order:
                self._chr_order[name] = len(self._chr_order)

    def _chrom_key(self, rdr: _Reader, rec: BcfRecord) -> Tuple[int, int]:
        name = rdr.header.rid2name(rec.rid)
        if name not in self._chr_order:
            self._chr_order[name] = len(self._chr_order)
        return self._chr_order[name], rec.pos

    def _in_targets(self, rdr: _Reader, rec: BcfRecord) -> bool:
        if not self.targets and not self.regions:
            return True
        from htslib_tpu.index import parse_region
        name = rdr.header.rid2name(rec.rid)
        for spec in (self.targets or []) + (self.regions or []):
            colon = spec.rfind(":")
            if colon < 0:
                if spec == name:
                    return True
                continue
            cn = spec[:colon]
            if cn != name:
                continue
            rng = spec[colon + 1:]
            if "-" in rng:
                b, e = rng.split("-")
                if int(b) - 1 <= rec.pos <= int(e) - 1:
                    return True
            elif int(rng) - 1 == rec.pos:
                return True
        return False

    def next_line(self) -> int:
        """bcf_sr_next_line (synced_bcf_reader.c:866): returns the number
        of readers with a record at the new position (0 = EOF)."""
        while True:
            best: Optional[Tuple[int, int]] = None
            for rdr in self.readers:
                while True:
                    rec = rdr.peek()
                    if rec is None or self._in_targets(rdr, rec):
                        break
                    rdr.pop()
                if rec is None:
                    continue
                key = self._chrom_key(rdr, rec)
                if best is None or key < best:
                    best = key
            if best is None:
                self.lines = [None] * self.nreaders
                return 0
            # candidate records at `best` per reader
            cands: List[List[BcfRecord]] = []
            for rdr in self.readers:
                recs = []
                while True:
                    rec = rdr.peek()
                    if rec is None or self._chrom_key(rdr, rec) != best:
                        break
                    recs.append(rdr.pop())
                cands.append(recs)
            rounds = self._pair_rounds(cands)
            if not rounds:
                continue
            # requeue later rounds
            this_round = rounds[0]
            for ri, recs in enumerate(cands):
                used = this_round[ri]
                rest = [r for r in recs if r is not used]
                self.readers[ri].buffer[0:0] = rest
            self.lines = this_round
            return sum(1 for r in this_round if r is not None)

    def _pair_rounds(self, cands: List[List[BcfRecord]],
                     ) -> List[List[Optional[BcfRecord]]]:
        """Simplified bcf_sr_sort: group one record per reader per round."""
        pair = self.pair
        if pair & BCF_SR_PAIR_EXACT:
            # group by exact allele string
            keys: List[str] = []
            for recs in cands:
                for r in recs:
                    k = ",".join(r.alleles)
                    if k not in keys:
                        keys.append(k)
            rounds = []
            for k in keys:
                row: List[Optional[BcfRecord]] = []
                for recs in cands:
                    hit = next((r for r in recs
                                if ",".join(r.alleles) == k), None)
                    row.append(hit)
                rounds.append(row)
            return rounds
        # type-compatible pairing
        def compatible(a: str, b: str) -> bool:
            if pair & BCF_SR_PAIR_ANY:
                return True
            if a == b and a == "snp":
                return bool(pair & BCF_SR_PAIR_SNPS)
            if a == b and a == "indel":
                return bool(pair & BCF_SR_PAIR_INDELS)
            if "ref" in (a, b):
                other = b if a == "ref" else a
                if other == "snp":
                    return bool(pair & BCF_SR_PAIR_SNP_REF)
                if other == "indel":
                    return bool(pair & BCF_SR_PAIR_INDEL_REF)
            return a == b
        rounds = []
        work = [list(recs) for recs in cands]
        while any(work):
            row: List[Optional[BcfRecord]] = [None] * len(work)
            seed_type = None
            for ri, recs in enumerate(work):
                if recs:
                    seed_type = _vtype(recs[0])
                    break
            for ri, recs in enumerate(work):
                for r in recs:
                    if compatible(seed_type, _vtype(r)):
                        row[ri] = r
                        recs.remove(r)
                        break
            if all(v is None for v in row):
                break
            rounds.append(row)
        return rounds

    def has_line(self, i: int) -> bool:
        return self.lines[i] is not None

    def get_line(self, i: int) -> Optional[BcfRecord]:
        return self.lines[i]

    def get_header(self, i: int) -> BcfHeader:
        return self.readers[i].header

    def close(self) -> None:
        for r in self.readers:
            r.fp.close()
