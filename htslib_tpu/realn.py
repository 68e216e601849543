"""BAQ — probabilistic banded glocal HMM realignment (reference
probaln.c:77 probaln_glocal, realn.c:106 sam_prob_realn, realn.c:39
sam_cap_mapq; API htslib/hts.h:1465, htslib/sam.h:2140-2208).

The forward/backward recurrences follow the reference's summation order
exactly so quality outputs are bit-identical (Python floats are C
doubles).  A lax.scan device formulation is the planned hot-path variant;
this module is the semantics reference.
"""
from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np

from htslib_tpu.sam.cigar import (BAM_CDEL, BAM_CDIFF, BAM_CEQUAL,
                                  BAM_CHARD_CLIP, BAM_CINS, BAM_CMATCH,
                                  BAM_CREF_SKIP, BAM_CSOFT_CLIP)
from htslib_tpu.sam.record import FUNMAP, BamRecord, _NT16_TABLE

BAQ_APPLY = 1
BAQ_EXTEND = 2
BAQ_REDO = 4

EI = 0.25
EM = 0.33333333333

# nt16 -> 0..4 (seq_nt16_int)
_NT16_INT = [4] * 16
_NT16_INT[1], _NT16_INT[2], _NT16_INT[4], _NT16_INT[8] = 0, 1, 2, 3

_QUAL2PROB = [10.0 ** (-i / 10.0) for i in range(256)]


class ProbalnParams:
    def __init__(self, d=0.001, e=0.1, bw=10):
        self.d = d
        self.e = e
        self.bw = bw


def probaln_glocal(ref: bytes, query: bytes, iqual: bytes,
                   c: ProbalnParams, want_map: bool = True,
                   ) -> Tuple[int, Optional[List[int]], Optional[bytes]]:
    """Returns (phred score Pr, state list, q bytes); state/q None when
    want_map is False.  Faithful port of probaln.c:77."""
    l_ref, l_query = len(ref), len(query)
    if l_ref == 0 or l_query == 0:
        return 0, None, None
    bw = max(l_ref, l_query)
    if bw > c.bw:
        bw = c.bw
    if bw < abs(l_ref - l_query):
        bw = abs(l_ref - l_query)
    bw2 = bw * 2 + 1
    i_dim = bw2 * 3 + 6 if bw2 < l_ref else l_ref * 3 + 6

    def set_u(i, k):
        x = i - bw
        if x < 0:
            x = 0
        return (k - x + 1) * 3

    f = np.zeros((l_query + 1) * i_dim)
    b = np.zeros((l_query + 1) * i_dim) if want_map else None
    s = np.zeros(l_query + 2)
    qual = [0.0] * l_query
    for i in range(l_query):
        qual[i] = _QUAL2PROB[iqual[i] if iqual is not None else 30]

    sM = sI = 1.0 / (2 * l_query + 2)
    m = [0.0] * 9
    m[0] = (1 - c.d - c.d) * (1 - sM)
    m[1] = m[2] = c.d * (1 - sM)
    m[3] = (1 - c.e) * (1 - sI)
    m[4] = c.e * (1 - sI)
    m[5] = 0.0
    m[6] = 1 - c.e
    m[7] = 0.0
    m[8] = c.e
    bM = (1 - c.d) / l_ref
    bI = c.d / l_ref

    # forward
    k0 = set_u(0, 0)
    f[0 * i_dim + k0] = s[0] = 1.0
    beg, end = 1, min(l_ref, bw + 1)
    ssum = 0.0
    for k in range(beg, end + 1):
        e = (1.0 if (ref[k - 1] > 3 or query[0] > 3)
             else (1.0 - qual[0]) if ref[k - 1] == query[0]
             else qual[0] * EM)
        u = set_u(1, k)
        f[1 * i_dim + u] = e * bM
        f[1 * i_dim + u + 1] = EI * bI
        ssum += f[1 * i_dim + u] + f[1 * i_dim + u + 1]
    s[1] = ssum
    for i in range(2, l_query + 1):
        fi = (i) * i_dim
        fi1 = (i - 1) * i_dim
        qli = qual[i - 1]
        qyi = query[i - 1]
        beg = max(1, i - bw)
        end = min(l_ref, i + bw)
        E = [qli * EM, 1.0 - qli, 1.0, 1.0]
        M = 1.0 / s[i - 1]
        ssum = 0.0
        for k in range(beg, end + 1):
            u = set_u(i, k)
            v11 = set_u(i - 1, k - 1)
            v10 = set_u(i - 1, k)
            v01 = set_u(i, k - 1)
            e = E[(1 if (ref[k - 1] > 3 or qyi > 3) else 0) * 2
                  + (1 if ref[k - 1] == qyi else 0)]
            f[fi + u] = e * (m[0] * M * f[fi1 + v11] + m[3] * M * f[fi1 + v11 + 1]
                             + m[6] * M * f[fi1 + v11 + 2])
            f[fi + u + 1] = EI * (m[1] * M * f[fi1 + v10] + m[4] * M * f[fi1 + v10 + 1])
            f[fi + u + 2] = m[2] * f[fi + v01] + m[8] * f[fi + v01 + 2]
            ssum += f[fi + u] + f[fi + u + 1] + f[fi + u + 2]
        s[i] = ssum
    # f[l_query+1]
    M = 1.0 / s[l_query]
    ssum = 0.0
    for k in range(1, l_ref + 1):
        u = set_u(l_query, k)
        if u < 3 or u >= i_dim:
            continue
        ssum += (M * f[l_query * i_dim + u] * sM
                 + M * f[l_query * i_dim + u + 1] * sI)
    s[l_query + 1] = ssum
    # likelihood
    p = 1.0
    Pr1 = 0.0
    for i in range(l_query + 2):
        p *= s[i]
        if p < 1e-100:
            Pr1 += -4.343 * math.log(p)
            p = 1.0
    Pr1 += -4.343 * math.log(p * l_ref * l_query)
    Pr = int(Pr1 + 0.499)
    if not want_map:
        return Pr, None, None

    # backward
    for k in range(1, l_ref + 1):
        u = set_u(l_query, k)
        if u < 3 or u >= i_dim:
            continue
        b[l_query * i_dim + u] = sM / s[l_query] / s[l_query + 1]
        b[l_query * i_dim + u + 1] = sI / s[l_query] / s[l_query + 1]
    for i in range(l_query - 1, 0, -1):
        beg = max(1, i - bw)
        end = min(l_ref, i + bw)
        bi = i * i_dim
        bi1 = (i + 1) * i_dim
        y = 1.0 if i > 1 else 0.0
        qli1 = qual[i]
        qyi1 = query[i]
        E = [qli1 * EM, 1.0 - qli1, 1.0, 1.0]
        for k in range(end, beg - 1, -1):
            u = set_u(i, k)
            v11 = set_u(i + 1, k + 1)
            v10 = set_u(i + 1, k)
            v01 = set_u(i, k + 1)
            if k >= l_ref:
                e = 0.0
            else:
                e = E[(1 if (ref[k] > 3 or qyi1 > 3) else 0) * 2
                      + (1 if ref[k] == qyi1 else 0)] * b[bi1 + v11]
            b[bi + u] = e * m[0] + EI * m[1] * b[bi1 + v10 + 1] + m[2] * b[bi + v01 + 2]
            b[bi + u + 1] = e * m[3] + EI * m[4] * b[bi1 + v10 + 1]
            b[bi + u + 2] = (e * m[6] + m[8] * b[bi + v01 + 2]) * y
        _beg = set_u(i, beg)
        _end = set_u(i, end) + 2
        yscale = 1.0 / s[i]
        for k in range(_beg, _end + 1):
            b[bi + k] *= yscale
    # b[0] omitted (only a sanity value in the reference)

    # MAP
    state = [0] * l_query
    q = bytearray(l_query)
    for i in range(1, l_query + 1):
        beg = max(1, i - bw)
        end = min(l_ref, i + bw)
        fi = i * i_dim
        bi = i * i_dim
        M = 1.0 / s[i]
        ssum = 0.0
        mx = 0.0
        max_k = -1
        for k in range(beg, end + 1):
            u = set_u(i, k)
            z = M * f[fi + u] * b[bi + u]
            if z > mx:
                mx = z
                max_k = (k - 1) << 2 | 0
            ssum += z
            z = M * f[fi + u + 1] * b[bi + u + 1]
            if z > mx:
                mx = z
                max_k = (k - 1) << 2 | 1
            ssum += z
        mx /= ssum
        state[i - 1] = max_k
        kk = int(-4.343 * math.log(1.0 - mx) + 0.499)
        q[i - 1] = 99 if kk > 100 else kk
    return Pr, state, bytes(q)


# ---------------------------------------------------------------------------
# sam_prob_realn (realn.c:106)
# ---------------------------------------------------------------------------

def _realn_setup(b: BamRecord, ref: str, flag: int):
    """Front half of sam_prob_realn (realn.c:106): tag fixes, early
    exits, band/window computation, sequence translation.  Returns
    ('done', code) or ('run', (qual, conf, xb, tref, tseq))."""
    apply_baq = flag & BAQ_APPLY
    redo_baq = flag & BAQ_REDO
    conf = ProbalnParams(0.001, 0.1, 10)
    if b.l_qseq > 1000:
        conf.d, conf.e = 1e-7, 1e-1
    ref_len = len(ref)
    qual = bytearray(b.qual)
    if (b.flag & FUNMAP) or b.l_qseq == 0 or (qual and qual[0] == 0xFF):
        return "done", -1
    fix_bq = False
    bq = b.get_aux("BQ")
    zq = b.get_aux("ZQ")
    if bq is not None and not redo_baq:
        if len(bq) != b.l_qseq:
            fix_bq = True
    if zq is not None and len(zq) != b.l_qseq:
        return "done", -4
    if bq is not None and redo_baq:
        b.del_aux("BQ")
        bq = None
    if bq is not None and zq is not None:
        b.del_aux("ZQ")
        zq = None
    if zq is None and fix_bq:
        b.del_aux("BQ")
        bq = None
    if bq is not None or zq is not None:
        if (apply_baq and zq is not None) or (not apply_baq and bq is not None):
            return "done", -3
        if bq is not None and apply_baq:
            bqb = bq.encode("latin-1")
            for i in range(b.l_qseq):
                qual[i] = 0 if qual[i] + 64 < bqb[i] else qual[i] - (bqb[i] - 64)
            b.qual = bytes(qual)
            val = bq
            b.del_aux("BQ")
            b.set_aux("ZQ", "Z", val)
        elif zq is not None and not apply_baq:
            zqb = zq.encode("latin-1")
            for i in range(b.l_qseq):
                qual[i] = (qual[i] + zqb[i] - 64) & 0xFF
            b.qual = bytes(qual)
            val = zq
            b.del_aux("ZQ")
            b.set_aux("BQ", "Z", val)
        return "done", 0

    # alignment extent
    x, y = b.pos, 0
    yb = ye = xb = xe = -1
    for op_l in b.cigar:
        op, l = int(op_l) & 0xF, int(op_l) >> 4
        if op in (BAM_CMATCH, BAM_CEQUAL, BAM_CDIFF):
            if yb < 0:
                yb = y
            if xb < 0:
                xb = x
            ye = y + l
            xe = x + l
            x += l
            y += l
        elif op in (BAM_CSOFT_CLIP, BAM_CINS):
            y += l
        elif op == BAM_CDEL:
            x += l
        elif op == BAM_CREF_SKIP:
            return "done", -1
    if xb == -1:
        return "done", -1
    bw = 7
    if abs((xe - xb) - (ye - yb)) > bw:
        bw = abs((xe - xb) - (ye - yb)) + 3
    conf.bw = bw
    xb -= yb + bw // 2
    if xb < 0:
        xb = 0
    xe += b.l_qseq - ye + bw // 2
    if xe - xb - b.l_qseq > bw:
        adj = (xe - xb - b.l_qseq - bw) // 2
        xb += adj
        xe -= adj
    # translated sequences
    packed = np.frombuffer(b.seq4, np.uint8)
    nib = np.empty(b.l_qseq, np.uint8)
    nib[0::2] = packed[:(b.l_qseq + 1) // 2] >> 4
    nib[1::2] = packed[:b.l_qseq // 2] & 0xF
    tseq = bytes(_NT16_INT[c] for c in nib)
    if xe > ref_len:
        xe = ref_len
    tref = bytes(_NT16_INT[int(_NT16_TABLE[ord(c)])] for c in ref[xb:xe])
    return "run", (qual, conf, xb, tref, tseq)


def sam_prob_realn(b: BamRecord, ref: str, flag: int = 0) -> int:
    kind, payload = _realn_setup(b, ref, flag)
    if kind == "done":
        return payload
    qual, conf, xb, tref, tseq = payload
    res = probaln_glocal(tref, tseq, bytes(qual), conf, want_map=True)
    if res[0] == -(1 << 31):
        return -4
    _, state, q = res
    return _realn_apply(b, qual, xb, state, q, flag)


def sam_prob_realn_batch(recs, ref: str, flag: int = 0) -> List[int]:
    """Batched sam_prob_realn: the banded-HMM MAP runs for the whole
    batch at once through the device kernel (ops.probaln.probaln_batch,
    the TPU formulation of probaln.c:77); tag bookkeeping and BAQ
    application stay per-record.  Returns one sam_prob_realn code per
    input record.  Falls back to the scalar path when JAX is
    unavailable."""
    codes: List[Optional[int]] = [None] * len(recs)
    runs = []   # (index, qual, conf, xb, tref, tseq)
    for i, b in enumerate(recs):
        kind, payload = _realn_setup(b, ref, flag)
        if kind == "done":
            codes[i] = payload
        else:
            runs.append((i,) + payload)
    # group by HMM params: reads >1000bp use d=1e-7 (sam_prob_realn)
    groups = {}
    for run in runs:
        groups.setdefault((run[2].d, run[2].e), []).append(run)
    for (d, e), grp in groups.items():
        try:
            from htslib_tpu.ops.probaln import probaln_batch_host
            results = probaln_batch_host(
                [r[4] for r in grp], [r[5] for r in grp],
                [bytes(r[1]) for r in grp],
                bws=[r[2].bw for r in grp], d=d, e=e)
        except ImportError:  # no jax: scalar fallback
            results = [probaln_glocal(r[4], r[5], bytes(r[1]), r[2],
                                      want_map=True) for r in grp]
        for (i, qual, conf, xb, tref, tseq), (Pr, state, q) in zip(
                grp, results):
            if Pr == -(1 << 31):
                codes[i] = -4
            else:
                codes[i] = _realn_apply(recs[i], qual, xb, state, q, flag)
    return codes


def _realn_apply(b: BamRecord, qual, xb: int, state, q, flag: int) -> int:
    """Back half of sam_prob_realn (realn.c): convert MAP states into
    BQ/ZQ offsets, optionally extend across match runs, apply."""
    apply_baq = flag & BAQ_APPLY
    extend_baq = flag & BAQ_EXTEND
    bq_arr = bytearray(qual)
    if not extend_baq:
        x, y = b.pos, 0
        for op_l in b.cigar:
            op, l = int(op_l) & 0xF, int(op_l) >> 4
            if l == 0:
                continue
            if op in (BAM_CMATCH, BAM_CEQUAL, BAM_CDIFF):
                if l > b.l_qseq - y:
                    l = b.l_qseq - y
                for i in range(y, y + l):
                    if (state[i] & 3) != 0 or state[i] >> 2 != x - xb + (i - y):
                        bq_arr[i] = 0
                    else:
                        bq_arr[i] = min(bq_arr[i], q[i])
                x += l
                y += l
            elif op in (BAM_CSOFT_CLIP, BAM_CINS):
                if l > b.l_qseq - y:
                    l = b.l_qseq - y
                y += l
            elif op == BAM_CDEL:
                x += l
        for i in range(b.l_qseq):
            bq_arr[i] = (qual[i] - bq_arr[i] + 64) & 0xFF
    else:
        left = bytearray(b.l_qseq)
        rght = bytearray(b.l_qseq)
        x, y = b.pos, 0
        cig = [(int(c) & 0xF, int(c) >> 4) for c in b.cigar]
        length = 0
        k = 0
        while k < len(cig):
            op, l = cig[k]
            if op in (BAM_CMATCH, BAM_CEQUAL, BAM_CDIFF):
                if k + 1 < len(cig) and cig[k + 1][0] in (BAM_CMATCH,
                                                          BAM_CEQUAL,
                                                          BAM_CDIFF):
                    length += l
                    k += 1
                    continue
                l += length
                length = 0
            if l == 0:
                k += 1
                continue
            if op in (BAM_CMATCH, BAM_CEQUAL, BAM_CDIFF):
                if l > b.l_qseq - y:
                    l = b.l_qseq - y
                for i in range(y, y + l):
                    bq_arr[i] = (0 if ((state[i] & 3) != 0
                                       or state[i] >> 2 != x - xb + (i - y))
                                 else q[i])
                left[y] = bq_arr[y]
                for i in range(y + 1, y + l):
                    left[i] = max(bq_arr[i], left[i - 1])
                rght[y + l - 1] = bq_arr[y + l - 1]
                for i in range(y + l - 2, y - 1, -1):
                    rght[i] = max(bq_arr[i], rght[i + 1])
                for i in range(y, y + l):
                    bq_arr[i] = min(left[i], rght[i])
                x += l
                y += l
            elif op in (BAM_CSOFT_CLIP, BAM_CINS):
                if l > b.l_qseq - y:
                    l = b.l_qseq - y
                y += l
            elif op == BAM_CDEL:
                x += l
            k += 1
        for i in range(b.l_qseq):
            bq_arr[i] = (64 + (0 if qual[i] <= bq_arr[i]
                               else qual[i] - bq_arr[i])) & 0xFF
    if apply_baq:
        for i in range(b.l_qseq):
            qual[i] = (qual[i] - (bq_arr[i] - 64)) & 0xFF
        b.qual = bytes(qual)
        b.set_aux("ZQ", "Z", bytes(bq_arr))
    else:
        b.set_aux("BQ", "Z", bytes(bq_arr))
    return 0


def sam_cap_mapq(b: BamRecord, ref: str, thres: int = 40) -> int:
    """realn.c:39."""
    if thres < 0:
        thres = 40
    ref_len = len(ref)
    qual = b.qual
    packed = np.frombuffer(b.seq4, np.uint8)
    nib = np.empty(b.l_qseq, np.uint8)
    nib[0::2] = packed[:(b.l_qseq + 1) // 2] >> 4
    nib[1::2] = packed[:b.l_qseq // 2] & 0xF
    mm = q = length = clip_l = clip_q = 0
    x, y = b.pos, 0
    broke = False
    for op_l in b.cigar:
        op, l = int(op_l) & 0xF, int(op_l) >> 4
        if op in (BAM_CMATCH, BAM_CEQUAL, BAM_CDIFF):
            j = 0
            while j < l:
                z = y + j
                if x + j >= ref_len:
                    break
                c1 = int(nib[z])
                c2 = int(_NT16_TABLE[ord(ref[x + j])])
                if c2 != 15 and c1 != 15 and qual[z] >= 13:
                    length += 1
                    if c1 and c1 != c2 and qual[z] >= 13:
                        mm += 1
                        q += min(qual[z], 33)
                j += 1
            if j < l:
                broke = True
                break
            x += l
            y += l
            length += l
        elif op == BAM_CDEL:
            if x + l > ref_len:
                broke = True
                break
            x += l
        elif op == BAM_CSOFT_CLIP:
            clip_q += sum(qual[y:y + l])
            clip_l += l
            y += l
        elif op == BAM_CHARD_CLIP:
            clip_q += 13 * l
            clip_l += l
        elif op == BAM_CINS:
            y += l
        elif op == BAM_CREF_SKIP:
            x += l
    t = 1.0
    for i in range(mm):
        t *= length / (i + 1)
    t = q - 4.343 * math.log(t) + clip_q / 5.0
    if t > thres:
        return -1
    if t < 0:
        t = 0
    t = math.sqrt((thres - t) / thres) * thres
    return int(t + 0.499)
