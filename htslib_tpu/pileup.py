"""Pileup engine — bam_plp/bam_mplp equivalents (reference sam.c:5352-6330).

Streaming per-position column builder over position-sorted reads: per-read
CIGAR cursor state machine (resolve_cigar2, sam.c:5409), insertion
extraction (bam_plp_insertion_mod, sam.c:5517), overlapping mate-pair
quality tweaking (tweak_overlap_quality, sam.c:5803) and the multi-sample
lock-step merge (bam_mplp_*, sam.c:6211).

TPU note: the batch formulation of this engine (CIGAR expansion to
(ref_pos, qpos, op) event tensors + segment sums per position tile) lives
in htslib_tpu.ops.pileup_kernel; this module is the semantics reference
and the record-at-a-time API.
"""
from __future__ import annotations

from typing import Callable, Dict, Iterator, List, Optional, Tuple

import numpy as np

from htslib_tpu.sam.cigar import (BAM_CDEL, BAM_CDIFF, BAM_CEQUAL,
                                  BAM_CHARD_CLIP, BAM_CINS, BAM_CMATCH,
                                  BAM_CPAD, BAM_CREF_SKIP, BAM_CSOFT_CLIP,
                                  cigar2rlen)
from htslib_tpu.sam.record import (FDUP, FMUNMAP, FPAIRED, FPROPER_PAIR,
                                   FQCFAIL, FSECONDARY, FUNMAP,
                                   BamRecord, SEQ_NT16_STR)

_M_OPS = (BAM_CMATCH, BAM_CEQUAL, BAM_CDIFF)


class PileupRead:
    """bam_pileup1_t."""

    __slots__ = ("b", "qpos", "is_del", "is_refskip", "is_head", "is_tail",
                 "indel", "cigar_ind")

    def __init__(self, b: BamRecord):
        self.b = b
        self.qpos = 0
        self.is_del = 0
        self.is_refskip = 0
        self.is_head = 0
        self.is_tail = 0
        self.indel = 0
        self.cigar_ind = 0


class _Node:
    __slots__ = ("b", "beg", "end", "k", "x", "y", "s_end", "qual")

    def __init__(self, b: BamRecord):
        self.b = b
        self.beg = b.pos
        self.end = b.pos + cigar2rlen(b.cigar)
        self.k = -1        # cstate_t
        self.x = 0
        self.y = 0
        self.s_end = self.end - 1
        self.qual = bytearray(b.qual)  # mutable copy for overlap tweaking


def _resolve_cigar2(p: PileupRead, pos: int, s: _Node) -> None:
    """resolve_cigar2 (sam.c:5409), operating on the node's cursor."""
    b = s.b
    cigar = b.cigar
    n_cigar = len(cigar)
    if s.k == -1:
        p.qpos = 0
        if n_cigar == 1:
            if (cigar[0] & 0xF) in _M_OPS:
                s.k, s.x, s.y = 0, b.pos, 0
        else:
            s.x, s.y = b.pos, 0
            for k in range(n_cigar):
                op = int(cigar[k]) & 0xF
                l = int(cigar[k]) >> 4
                if op in (BAM_CMATCH, BAM_CDEL, BAM_CREF_SKIP, BAM_CEQUAL,
                          BAM_CDIFF):
                    break
                if op in (BAM_CINS, BAM_CSOFT_CLIP):
                    s.y += l
            s.k = k
    else:
        l = int(cigar[s.k]) >> 4
        if pos - s.x >= l:
            op_cur = int(cigar[s.k]) & 0xF
            if op_cur in _M_OPS:
                s.y += l
            s.x += l
            k = s.k + 1
            while k < n_cigar:
                op = int(cigar[k]) & 0xF
                l2 = int(cigar[k]) >> 4
                if op in (BAM_CMATCH, BAM_CDEL, BAM_CREF_SKIP, BAM_CEQUAL,
                          BAM_CDIFF):
                    break
                if op in (BAM_CINS, BAM_CSOFT_CLIP):
                    s.y += l2
                k += 1
            s.k = k
    # collect pileup info
    op = int(cigar[s.k]) & 0xF
    l = int(cigar[s.k]) >> 4
    p.is_del = p.indel = p.is_refskip = 0
    if s.x + l - 1 == pos and s.k + 1 < n_cigar:
        op2 = int(cigar[s.k + 1]) & 0xF
        l2 = int(cigar[s.k + 1]) >> 4
        if op2 == BAM_CDEL and op != BAM_CDEL:
            p.indel = -l2
            for k in range(s.k + 2, n_cigar):
                op2 = int(cigar[k]) & 0xF
                l2 = int(cigar[k]) >> 4
                if op2 == BAM_CDEL:
                    p.indel -= l2
                else:
                    break
        elif op2 == BAM_CINS:
            p.indel = l2
            for k in range(s.k + 2, n_cigar):
                op2 = int(cigar[k]) & 0xF
                l2 = int(cigar[k]) >> 4
                if op2 == BAM_CINS:
                    p.indel += l2
                elif op2 != BAM_CPAD:
                    break
        elif op2 == BAM_CPAD and s.k + 2 < n_cigar:
            l3 = 0
            for k in range(s.k + 2, n_cigar):
                op2 = int(cigar[k]) & 0xF
                l2 = int(cigar[k]) >> 4
                if op2 == BAM_CINS:
                    l3 += l2
                elif op2 in (BAM_CDEL, BAM_CMATCH, BAM_CREF_SKIP, BAM_CEQUAL,
                             BAM_CDIFF):
                    break
            if l3 > 0:
                p.indel = l3
    if op in _M_OPS:
        p.qpos = s.y + (pos - s.x)
    elif op in (BAM_CDEL, BAM_CREF_SKIP):
        p.is_del = 1
        p.qpos = s.y
        p.is_refskip = 1 if op == BAM_CREF_SKIP else 0
    p.is_head = 1 if pos == b.pos else 0
    p.is_tail = 1 if pos == s.s_end else 0
    p.cigar_ind = s.k


def plp_insertion(p: PileupRead, with_mods=None) -> Tuple[str, int]:
    """bam_plp_insertion_mod (sam.c:5517): returns (padded insertion
    string, del_len following the insertion)."""
    if p.indel <= 0:
        return "", 0
    cigar = p.b.cigar
    n_cigar = len(cigar)
    del_len = 0
    out: List[str] = []
    seq = p.b.seq  # ASCII string
    k = p.cigar_ind + 1
    j = 1
    while k < n_cigar:
        op = int(cigar[k]) & 0xF
        ln = int(cigar[k]) >> 4
        if op == BAM_CPAD:
            out.append("*" * ln)
        elif op == BAM_CINS:
            for _ in range(ln):
                qp = p.qpos + j - p.is_del
                out.append(seq[qp] if qp < p.b.l_qseq else "N")
                j += 1
        else:
            if op == BAM_CDEL:
                del_len = ln
            break
        k += 1
    return "".join(out), del_len


# ---------------------------------------------------------------------------
# overlap quality tweaking (sam.c:5700-5940)
# ---------------------------------------------------------------------------

def _x31_hash(s: bytes) -> int:
    h = 0
    for c in s:
        h = ((h << 5) - h + c) & 0xFFFFFFFF
    return h


def _wang_hash(key: int) -> int:
    key = (key + (~(key << 15) & 0xFFFFFFFF)) & 0xFFFFFFFF
    key ^= key >> 10
    key = (key + ((key << 3) & 0xFFFFFFFF)) & 0xFFFFFFFF
    key ^= key >> 6
    key = (key + (~(key << 11) & 0xFFFFFFFF)) & 0xFFFFFFFF
    key ^= key >> 16
    return key


class _CigCursor:
    """cigar_iref2iseq_set/next state over one read."""

    __slots__ = ("cigar", "ci", "icig", "iseq", "iref")

    def __init__(self, b: BamRecord):
        self.cigar = b.cigar
        self.ci = 0
        self.icig = 0
        self.iseq = 0
        self.iref = 0

    def set(self, pos: int) -> int:
        if pos < 0:
            return -1
        self.icig = self.iseq = self.iref = 0
        while self.ci < len(self.cigar):
            c = int(self.cigar[self.ci])
            op, ln = c & 0xF, c >> 4
            if op == BAM_CSOFT_CLIP:
                self.ci += 1
                self.iseq += ln
                self.icig = 0
                continue
            if op in (BAM_CHARD_CLIP, BAM_CPAD):
                self.ci += 1
                self.icig = 0
                continue
            if op in _M_OPS:
                pos -= ln
                if pos < 0:
                    self.icig = ln + pos
                    self.iseq += self.icig
                    self.iref += self.icig
                    return BAM_CMATCH
                self.ci += 1
                self.iseq += ln
                self.icig = 0
                self.iref += ln
                continue
            if op == BAM_CINS:
                self.ci += 1
                self.iseq += ln
                self.icig = 0
                continue
            if op in (BAM_CDEL, BAM_CREF_SKIP):
                pos -= ln
                if pos < 0:
                    pos = 0
                self.ci += 1
                self.icig = 0
                self.iref += ln
                continue
            return -2
        self.iseq = -1
        return -1

    def next(self) -> int:
        while self.ci < len(self.cigar):
            c = int(self.cigar[self.ci])
            op, ln = c & 0xF, c >> 4
            if op in _M_OPS:
                if self.icig >= ln - 1:
                    self.icig = -1
                    self.ci += 1
                    continue
                self.iseq += 1
                self.icig += 1
                self.iref += 1
                return BAM_CMATCH
            if op in (BAM_CDEL, BAM_CREF_SKIP):
                self.ci += 1
                self.iref += ln
                self.icig = -1
                continue
            if op == BAM_CINS or op == BAM_CSOFT_CLIP:
                self.ci += 1
                self.iseq += ln
                self.icig = -1
                continue
            if op in (BAM_CHARD_CLIP, BAM_CPAD):
                self.ci += 1
                self.icig = -1
                continue
            return -2
        self.iseq = -1
        self.iref = -1
        return -1

    def prev_op_is_del(self) -> bool:
        return self.ci > 0 and (int(self.cigar[self.ci - 1]) & 0xF) == BAM_CDEL


def tweak_overlap_quality(na: _Node, nb: _Node) -> int:
    """tweak_overlap_quality (sam.c:5803) on the nodes' mutable quals."""
    a, b = na.b, nb.b
    ca, cb = _CigCursor(a), _CigCursor(b)
    a_seq4 = np.frombuffer(a.seq4, np.uint8)
    b_seq4 = np.frombuffer(b.seq4, np.uint8)

    def seqi(s4, i):
        byte = s4[i >> 1]
        return (byte >> 4) if (i & 1) == 0 else (byte & 0xF)

    iref = b.pos
    a_ret = ca.set(iref - a.pos)
    if a_ret < 0:
        return -1 if a_ret < -1 else 0
    b_ret = cb.set(iref - b.pos)
    if b_ret < 0:
        return -1 if b_ret < -1 else 0
    if _wang_hash(_x31_hash(a.qname)) & 1:
        amul, bmul = 1, 0
    else:
        amul, bmul = 0, 1
    while True:
        while a_ret >= 0 and ca.iref >= 0 and ca.iref < iref - a.pos:
            a_ret = ca.next()
        if a_ret < 0:
            return -1 if a_ret < -1 else 0
        while b_ret >= 0 and cb.iref >= 0 and cb.iref < iref - b.pos:
            b_ret = cb.next()
        if b_ret < 0:
            return -1 if b_ret < -1 else 0
        if iref < ca.iref + a.pos:
            iref = ca.iref + a.pos
        if iref < cb.iref + b.pos:
            iref = cb.iref + b.pos
        iref += 1
        if ca.iref + a.pos != cb.iref + b.pos:
            if (ca.iref + a.pos < cb.iref + b.pos and cb.prev_op_is_del()):
                while True:
                    na.qual[ca.iseq] = int(na.qual[ca.iseq] * 0.8) if amul else 0
                    a_ret = ca.next()
                    if a_ret < 0:
                        return -1 if a_ret < -1 else 0
                    if not (ca.iref + a.pos < cb.iref + b.pos):
                        break
            elif (cb.iref + b.pos < ca.iref + a.pos and ca.prev_op_is_del()):
                while True:
                    nb.qual[cb.iseq] = int(nb.qual[cb.iseq] * 0.8) if bmul else 0
                    b_ret = cb.next()
                    if b_ret < 0:
                        return -1 if b_ret < -1 else 0
                    if not (cb.iref + b.pos < ca.iref + a.pos):
                        break
            else:
                continue
        if ca.iseq > a.l_qseq or cb.iseq > b.l_qseq:
            return -1
        if seqi(a_seq4, ca.iseq) == seqi(b_seq4, cb.iseq):
            q = na.qual[ca.iseq] + nb.qual[cb.iseq]
            q = 200 if q > 200 else q
            na.qual[ca.iseq] = amul * q
            nb.qual[cb.iseq] = bmul * q
        else:
            if na.qual[ca.iseq] > nb.qual[cb.iseq]:
                na.qual[ca.iseq] = int(0.8 * na.qual[ca.iseq])
                nb.qual[cb.iseq] = 0
            elif na.qual[ca.iseq] < nb.qual[cb.iseq]:
                nb.qual[cb.iseq] = int(0.8 * nb.qual[cb.iseq])
                na.qual[ca.iseq] = 0
            else:
                na.qual[ca.iseq] = amul * int(0.8 * na.qual[ca.iseq])
                nb.qual[cb.iseq] = bmul * int(0.8 * nb.qual[cb.iseq])


# ---------------------------------------------------------------------------
# the iterator
# ---------------------------------------------------------------------------

class Pileup:
    """bam_plp_t: push sorted records, pull columns."""

    def __init__(self, read_func: Optional[Callable[[], Optional[BamRecord]]] = None,
                 overlaps: bool = False, maxcnt: int = 8000):
        self.func = read_func
        self.nodes: List[_Node] = []
        self.tid = -1
        self.pos = 0
        self.max_tid = -1
        self.max_pos = -1
        self.is_eof = False
        self.error = False
        self.overlaps: Optional[Dict[bytes, _Node]] = {} if overlaps else None
        self.maxcnt = maxcnt

    # -- push side ------------------------------------------------------
    def push(self, b: Optional[BamRecord]) -> int:
        if self.error:
            return -1
        if b is None:
            self.is_eof = True
            return 0
        if b.tid < 0 or (b.flag & FUNMAP):
            self._overlap_remove(b)
            return 0
        node = _Node(b.copy())
        node.b.qual = bytes(node.qual)  # decouple; qual accessed via node
        if b.tid < self.max_tid:
            self.error = True
            raise ValueError("The input is not sorted (chromosomes out of order)")
        if b.tid == self.max_tid and node.beg < self.max_pos:
            self.error = True
            raise ValueError("The input is not sorted (reads out of order)")
        self.max_tid, self.max_pos = b.tid, node.beg
        if node.end > self.pos or b.tid > self.tid:
            if self._overlap_push(node) < 0:
                self.error = True
                return -1
            self.nodes.append(node)
        return 0

    def _overlap_push(self, node: _Node) -> int:
        if self.overlaps is None:
            return 0
        b = node.b
        if (b.flag & FMUNMAP) or not (b.flag & FPROPER_PAIR):
            return 0
        if (b.mtid >= 0 and b.tid != b.mtid) or \
                (abs(b.isize) >= 2 * b.l_qseq and b.mpos >= node.end):
            return 0
        key = b.qname
        mate = self.overlaps.get(key)
        if mate is None:
            if b.mpos >= b.pos or ((b.flag & FPAIRED) and b.mpos == -1):
                self.overlaps[key] = node
            return 0
        err = tweak_overlap_quality(mate, node)
        del self.overlaps[key]
        return err or 0

    def _overlap_remove(self, b: Optional[BamRecord]) -> None:
        if self.overlaps is None:
            return
        if b is None:
            self.overlaps.clear()
        elif not ((b.flag & FUNMAP) or not (b.flag & FPROPER_PAIR)):
            self.overlaps.pop(b.qname, None)

    # -- pull side ------------------------------------------------------
    def next_column(self) -> Optional[Tuple[int, int, List[PileupRead]]]:
        """bam_plp64_next (sam.c:6011)."""
        if self.error:
            return None
        if self.is_eof and not self.nodes:
            return None
        while (self.is_eof or self.max_tid > self.tid
               or (self.max_tid == self.tid and self.max_pos > self.pos)):
            plp: List[PileupRead] = []
            keep: List[_Node] = []
            for node in self.nodes:
                if node.b.tid < self.tid or (node.b.tid == self.tid
                                             and node.end <= self.pos):
                    self._overlap_remove(node.b)
                    continue
                if node.b.tid == self.tid and node.beg <= self.pos:
                    p = PileupRead(node.b)
                    # expose tweaked quals
                    node.b.qual = bytes(node.qual)
                    _resolve_cigar2(p, self.pos, node)
                    plp.append(p)
                keep.append(node)
            self.nodes = keep
            tid, pos = self.tid, self.pos
            if self.nodes:
                head = self.nodes[0]
                if self.tid > head.b.tid:
                    self.error = True
                    raise ValueError("Unsorted input. Pileup aborts")
                if self.tid < head.b.tid:
                    self.tid = head.b.tid
                    self.pos = head.beg
                elif self.pos < head.beg:
                    self.pos = head.beg
                else:
                    self.pos += 1
            else:
                self.pos += 1
            if plp:
                return tid, pos, plp
            if self.is_eof and not self.nodes:
                break
        return None

    def auto(self) -> Optional[Tuple[int, int, List[PileupRead]]]:
        """bam_plp_auto: pull, reading more input as needed."""
        while True:
            col = self.next_column()
            if col is not None:
                return col
            if self.is_eof:
                return None
            b = self.func() if self.func else None
            self.push(b)

    def __iter__(self) -> Iterator[Tuple[int, int, List[PileupRead]]]:
        while True:
            col = self.auto()
            if col is None:
                return
            yield col


def mpileup_text(path: str, overlaps: bool = True,
                 skip_mask: int = FUNMAP | FSECONDARY | FQCFAIL | FDUP,
                 ) -> Tuple[object, bytes]:
    """Whole-file pileup text in the test/pileup.c column format:
    (header, text).  Uses the native engine (htstpu_mpileup: the
    resolve_cigar2 + overlap-tweak port) and falls back to the Python
    engine on exotic records (CG escapes)."""
    from htslib_tpu.native import native
    from htslib_tpu.sam import BamReader, SamReader

    is_sam = not path.endswith((".bam",))
    opener = SamReader if is_sam else BamReader
    with opener(path) as r:
        header = r.header
        if native is not None:
            try:
                if is_sam:
                    import numpy as np
                    with open(path, "rb") as fh:
                        text = fh.read()
                    # skip the @-header block with one scan, no split
                    p = 0
                    while p < len(text) and text[p:p + 1] == b"@":
                        nl = text.find(b"\n", p)
                        if nl < 0:
                            p = len(text)
                            break
                        p = nl + 1
                    stream = native.sam_to_bam(
                        np.frombuffer(text, np.uint8, len(text) - p, p),
                        header.ref_names)
                else:
                    stream, _, _ = r.raw_records()
                return header, native.mpileup(
                    stream, header.ref_names, skip_mask, overlaps)
            except (BlockingIOError, IOError):
                pass
        # Python fallback: the reference-ported engine
        recs = [b for b in iter(r.read1, None) if not (b.flag & skip_mask)]

    from htslib_tpu.pileup import Pileup as _P
    it = iter(recs + [None])
    lines: List[str] = []
    for tid, pos, col in _P(lambda: next(it), overlaps=overlaps):
        if tid < 0:
            break
        lines.append(_format_plp_column(header, tid, pos, col))
    blob = ("\n".join(lines) + ("\n" if lines else "")).encode()
    return header, blob


def _format_plp_column(header, tid: int, pos: int, plp) -> str:
    """test/pileup.c:76-133 column format (shared with the native
    engine's output)."""
    out = [header.tid2name(tid), str(pos + 1), str(len(plp))]
    seq_parts = []
    for p in plp:
        is_rev = bool(p.b.flag & 0x10)
        if p.is_head:
            seq_parts.append("^" + chr(ord("!") + min(p.b.mapq, 93)))
        if p.is_del:
            seq_parts.append(("<" if is_rev else ">") if p.is_refskip
                             else "*")
        else:
            c = p.b.seq[p.qpos]
            seq_parts.append(c.lower() if is_rev else c.upper())
        ins, del_len = plp_insertion(p)
        if p.indel > 0:
            seq_parts.append(f"+{len(ins)}(" +
                             (ins.lower() if is_rev else ins.upper()) + ")")
        else:
            del_len = -p.indel
        if del_len > 0:
            seq_parts.append(f"-{del_len}()")
        if p.is_tail:
            seq_parts.append("$")
    quals = []
    for p in plp:
        q = "~"
        if p.qpos < p.b.l_qseq and p.b.qual[p.qpos] + 33 < ord("~"):
            q = chr(p.b.qual[p.qpos] + 33)
        quals.append(q)
    return "\t".join(["\t".join(out[:3]), "".join(seq_parts),
                      "".join(quals)])


class MultiPileup:
    """bam_mplp_t (sam.c:6211): n samples iterated in locus lock-step."""

    def __init__(self, read_funcs: List[Callable[[], Optional[BamRecord]]],
                 overlaps: bool = False, maxcnt: int = 8000):
        self.iters = [Pileup(f, overlaps=overlaps, maxcnt=maxcnt)
                      for f in read_funcs]
        self._cur: List[Optional[Tuple[int, int, List[PileupRead]]]] = [
            None] * len(read_funcs)
        self._started = False

    def auto(self) -> Optional[Tuple[int, int, List[Optional[List[PileupRead]]]]]:
        n = len(self.iters)
        if not self._started:
            for i in range(n):
                self._cur[i] = self.iters[i].auto()
            self._started = True
        live = [(c[0], c[1]) for c in self._cur if c is not None]
        if not live:
            return None
        min_key = min(live)
        tid, pos = min_key
        out: List[Optional[List[PileupRead]]] = []
        any_data = False
        for i in range(n):
            c = self._cur[i]
            if c is not None and (c[0], c[1]) == min_key:
                out.append(c[2])
                any_data = True
                self._cur[i] = self.iters[i].auto()
            else:
                out.append(None)
        if not any_data:
            return None
        return tid, pos, out


def mpileup_text_parallel(path: str, nthreads: int = 0,
                          overlaps: bool = True,
                          skip_mask: int = FUNMAP | FSECONDARY
                          | FQCFAIL | FDUP) -> Tuple[object, bytes]:
    """Coordinate-sharded parallel mpileup with the NATIVE engine per
    tile (the parallel/pileup_shard.py plan run through htstpu_mpileup
    with an emission window): the genome splits into read-count-balanced
    tiles, each worker processes every read OVERLAPPING its tile (halo
    replication keeps overlap-pair quality tweaking exact — the tweak
    only touches positions covered by both mates, so any pair affecting
    a tile column has both mates in the tile's read set) and emits only
    its own columns.  Concatenated output is byte-identical to
    mpileup_text.  Falls back to the serial engine when the native
    library is unavailable."""
    import os as _os

    import numpy as np

    from htslib_tpu.native import native
    from htslib_tpu.sam import BamReader, SamReader

    if native is None:
        return mpileup_text(path, overlaps, skip_mask)
    nthreads = nthreads or (_os.cpu_count() or 2)

    is_sam = not path.endswith(".bam")
    opener = SamReader if is_sam else BamReader
    with opener(path) as r:
        header = r.header
        if is_sam:
            with open(path, "rb") as fh:
                text = fh.read()
            p = 0
            while p < len(text) and text[p:p + 1] == b"@":
                nl = text.find(b"\n", p)
                if nl < 0:
                    p = len(text)
                    break
                p = nl + 1
            stream = native.sam_to_bam(
                np.frombuffer(text, np.uint8, len(text) - p, p),
                header.ref_names)
        else:
            stream, _, _ = r.raw_records()
    stream = np.ascontiguousarray(np.asarray(stream))
    offs, sizes = native.bam_scan(stream, 0)
    offs = np.asarray(offs, np.int64)
    sizes = np.asarray(sizes, np.int64)
    tids, poss, ends, flags = native.bam_fields(stream, offs)
    kept = (flags & skip_mask) == 0
    mapped = kept & (tids >= 0) & ((flags & 4) == 0)
    n_mapped = int(mapped.sum())
    if n_mapped == 0 or nthreads <= 1:
        return header, native.mpileup(stream, header.ref_names,
                                      skip_mask, overlaps)
    # tile plan balanced by mapped-read count (plan_pileup_tiles model)
    m_idx = np.nonzero(mapped)[0]
    per = (n_mapped + nthreads - 1) // nthreads
    bounds = [(-(1 << 30), 0)]
    for si in range(1, nthreads):
        i = si * per
        if i >= n_mapped:
            break
        k = (int(tids[m_idx[i]]), int(poss[m_idx[i]]))
        if k > bounds[-1]:
            bounds.append(k)
    bounds.append(((1 << 30), 1 << 62))
    tiles = [(bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)]

    pos_key = tids.astype(np.int64) * (1 << 40) + poss
    end_key = tids.astype(np.int64) * (1 << 40) + ends

    def run_tile(tile):
        lo, hi = tile
        lo_k = lo[0] * (1 << 40) + lo[1]
        hi_k = hi[0] * (1 << 40) + hi[1]
        # one CONTIGUOUS record range covers the tile: [first read whose
        # span reaches past lo, last read starting before hi].  In-range
        # reads that don't overlap the tile are processed but emit
        # nothing (the engine's window gates emission), which keeps the
        # sub-stream a zero-copy slice of the original.
        need = mapped & (end_key > lo_k) & (pos_key < hi_k)
        idx = np.nonzero(need)[0]
        if idx.size == 0:
            return b""
        i0, i1 = int(idx[0]), int(idx[-1])
        sub = stream[int(offs[i0]):int(offs[i1]) + int(sizes[i1])]
        return native.mpileup(sub, header.ref_names, skip_mask,
                              overlaps, window=(lo, hi))

    from htslib_tpu.pipeline import shared_pool
    pool = shared_pool()
    outs = list(pool.map(run_tile, tiles))
    return header, b"".join(outs)
