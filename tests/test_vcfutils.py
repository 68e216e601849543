"""vcfutils + vcf_sweep tests (modeled on test/test-vcf-api.c allele
trimming checks and test/test-vcf-sweep.c)."""
import os

import pytest

from htslib_tpu.vcf import BcfRecord, VcfReader
from htslib_tpu.vcf.header import BcfHeader
from htslib_tpu.vcf_sweep import VcfSweep
from htslib_tpu.vcfutils import alleles2gt, gt2alleles, trim_alleles
from tests.conftest import ref_path, has_ref

HDR = ("##fileformat=VCFv4.2\n"
       "##INFO=<ID=AF,Number=A,Type=Float,Description=\"d\">\n"
       "##FORMAT=<ID=GT,Number=1,Type=String,Description=\"d\">\n"
       "##FORMAT=<ID=AD,Number=R,Type=Integer,Description=\"d\">\n"
       "##contig=<ID=1>\n"
       "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\n")


def test_gt_index_helpers():
    assert gt2alleles(0) == (0, 0)
    assert gt2alleles(1) == (0, 1)
    assert gt2alleles(2) == (1, 1)
    assert gt2alleles(3) == (0, 2)
    for j in range(5):
        for k in range(j, 5):
            assert gt2alleles(alleles2gt(j, k)) == (j, k)


def test_trim_alleles():
    h = BcfHeader(HDR)
    line = "1\t100\t.\tA\tC,G,T\t.\t.\tAF=0.1,0.2,0.3\tGT:AD\t0/2:1,2,3,4\t2|0:5,6,7,8"
    v = BcfRecord.from_vcf(line, h)
    n = trim_alleles(h, v)
    assert n == 2  # C and T unused
    assert v.alleles == ["A", "G"]
    out = v.to_vcf(h)
    assert out.startswith("1\t100\t.\tA\tG\t.\t.\tAF=0.2\tGT:AD\t0/1:1,3\t1|0:5,7")


def test_trim_no_gt_keeps_all():
    h = BcfHeader(HDR)
    v = BcfRecord.from_vcf("1\t5\t.\tA\tC,G\t.\t.\t.", h)
    assert trim_alleles(h, v) == 0
    assert v.alleles == ["A", "C", "G"]


@pytest.mark.skipif(not has_ref("index.vcf"), reason="no corpus")
def test_vcf_sweep_roundtrip():
    with VcfSweep(ref_path("index.vcf")) as sw:
        fwd = []
        while True:
            r = sw.fwd()
            if r is None:
                break
            fwd.append(r.to_vcf(sw.header))
    with VcfSweep(ref_path("index.vcf")) as sw:
        bwd = []
        while True:
            r = sw.bwd()
            if r is None:
                break
            bwd.append(r.to_vcf(sw.header))
    assert bwd == fwd[::-1]
    assert len(fwd) > 0
