"""VCF utility functions (reference vcfutils.c:1-1485, htslib/vcfutils.h):
allele trimming/subsetting and genotype index helpers."""
from __future__ import annotations

from typing import List, Tuple

import numpy as np

from htslib_tpu.vcf.header import BCF_HL_INFO, BCF_HL_FMT, BCF_HT_INT, BcfHeader
from htslib_tpu.vcf.record import (INT32_MISSING, INT32_VECTOR_END, BcfRecord)


def gt2alleles(gt_idx: int) -> Tuple[int, int]:
    """bcf_gt2alleles (htslib/vcfutils.h:118): diploid genotype index ->
    (allele j, allele k) with j <= k."""
    k = 0
    dk = 1
    while gt_idx >= dk:
        gt_idx -= dk
        dk += 1
        k += 1
    return gt_idx, k


def alleles2gt(j: int, k: int) -> int:
    """bcf_alleles2gt: (j, k) -> genotype index."""
    if j > k:
        j, k = k, j
    return k * (k + 1) // 2 + j


def ij2G(i: int, j: int) -> int:
    return alleles2gt(i, j)


def trim_alleles(header: BcfHeader, rec: BcfRecord) -> int:
    """bcf_trim_alleles (vcfutils.c:69): remove ALT alleles unused by any
    genotype; returns number removed."""
    gt = rec.get_fmt(header, "GT")
    n_allele = rec.n_allele
    if n_allele <= 1:
        return 0
    used = np.zeros(n_allele, bool)
    used[0] = True
    if gt is not None:
        vals = gt.value.reshape(-1)
        for v in vals:
            v = int(v)
            if v in (INT32_MISSING, INT32_VECTOR_END) or v >> 1 == 0:
                continue
            al = (v >> 1) - 1
            if 0 <= al < n_allele:
                used[al] = True
    else:
        used[:] = True
    n_rm = int((~used).sum())
    if n_rm == 0:
        return 0
    remove_alleles(header, rec, ~used)
    return n_rm


def remove_alleles(header: BcfHeader, rec: BcfRecord,
                   rm_mask: np.ndarray) -> None:
    """bcf_remove_allele_set (vcfutils.c:226): drop flagged ALT alleles,
    remapping GT and Number=A/R INFO/FORMAT vectors."""
    n_allele = rec.n_allele
    keep = ~np.asarray(rm_mask, bool)
    keep[0] = True
    amap = -np.ones(n_allele, np.int32)
    j = 0
    for i in range(n_allele):
        if keep[i]:
            amap[i] = j
            j += 1
    rec.update_alleles(header,
                       [a for i, a in enumerate(rec.alleles) if keep[i]])
    # remap GT
    gt = rec.get_fmt(header, "GT")
    if gt is not None:
        vals = gt.value
        flat = vals.reshape(-1)
        for idx in range(flat.size):
            v = int(flat[idx])
            if v in (INT32_MISSING, INT32_VECTOR_END) or (v >> 1) == 0:
                continue
            al = (v >> 1) - 1
            na = amap[al] if 0 <= al < n_allele else -1
            flat[idx] = ((int(na) + 1) << 1 | (v & 1)) if na >= 0 else (v & 1)
    # subset Number=A and Number=R vectors
    from htslib_tpu.vcf.header import BCF_VL_A, BCF_VL_R
    for group, hl in ((rec.info, BCF_HL_INFO), (rec.fmt, BCF_HL_FMT)):
        for e in group:
            _, vl, _ = header.coltype(hl, e.key)
            if vl == BCF_VL_A:
                sel = keep[1:]
            elif vl == BCF_VL_R:
                sel = keep
            else:
                continue
            v = e.value
            if isinstance(v, bytes):
                parts = v.split(b",")
                if len(parts) == len(sel):
                    e.value = b",".join(p for p, k in zip(parts, sel) if k)
            elif hasattr(v, "ndim"):
                if v.ndim == 1 and len(v) == len(sel):
                    e.value = v[np.asarray(sel)]
                elif v.ndim == 2 and v.shape[1] == len(sel):
                    e.value = v[:, np.asarray(sel)]
    rec.mark_dirty()
