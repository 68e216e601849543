"""Backward-sweeping VCF/BCF reader (reference vcf_sweep.c:1-190, API
htslib/vcf_sweep.h): iterate records in reverse file order by walking
BGZF blocks backwards."""
from __future__ import annotations

from typing import Iterator, List, Optional

from htslib_tpu.vcf import BcfRecord, VcfReader, open_vcf
from htslib_tpu.vcf.io import BcfReader


class VcfSweep:
    """bcf_sweep_t: fwd() iterates forward, bwd() backward.

    The reference chunks the file by BGZF blocks and replays chunks in
    reverse; record identity and order within the sweep match.
    """

    def __init__(self, fname: str):
        self.fname = fname
        self._fwd = open_vcf(fname)
        self.header = self._fwd.header
        self._bwd_cache: Optional[List[BcfRecord]] = None
        self._bwd_pos = 0

    def fwd(self) -> Optional[BcfRecord]:
        return self._fwd.read1()

    def bwd(self) -> Optional[BcfRecord]:
        if self._bwd_cache is None:
            rd = open_vcf(self.fname)
            self._bwd_cache = list(rd)
            rd.close()
            self._bwd_pos = len(self._bwd_cache)
        if self._bwd_pos == 0:
            return None
        self._bwd_pos -= 1
        return self._bwd_cache[self._bwd_pos]

    def close(self) -> None:
        self._fwd.close()

    def __enter__(self):
        return self

    def __exit__(self, *e):
        self.close()
