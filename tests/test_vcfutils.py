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


# ---------------------------------------------------------------------------
# bcf_hdr_merge / bcf_translate (vcf.c:4918, 5020)

HDR_A = """##fileformat=VCFv4.2
##FILTER=<ID=q10,Description="Q10">
##INFO=<ID=DP,Number=1,Type=Integer,Description="Depth">
##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">
##contig=<ID=chr1,length=1000>
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1
"""

HDR_B = """##fileformat=VCFv4.3
##FILTER=<ID=q20,Description="Q20">
##INFO=<ID=DP,Number=1,Type=Integer,Description="Depth">
##INFO=<ID=AF,Number=A,Type=Float,Description="Freq">
##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">
##FORMAT=<ID=AD,Number=R,Type=Integer,Description="Allelic depths">
##contig=<ID=chr1,length=1000>
##contig=<ID=chr2,length=2000>
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS2
"""


def test_bcf_hdr_merge_combines_records():
    from htslib_tpu.vcf import BcfHeader, bcf_hdr_merge
    dst = BcfHeader(HDR_A)
    src = BcfHeader(HDR_B)
    out = bcf_hdr_merge(dst, src)
    assert out is dst
    # all of src's new IDs landed, dst originals kept
    for key, id_ in [("FILTER", "q10"), ("FILTER", "q20"), ("INFO", "DP"),
                     ("INFO", "AF"), ("FORMAT", "AD"), ("contig", "chr2")]:
        assert any(r.key == key and r.get("ID") == id_ for r in dst.hrecs), \
            (key, id_)
    # fileformat bumped to the newer version
    assert dst.version == "VCFv4.3"
    # no duplicate DP line
    assert sum(1 for r in dst.hrecs
               if r.key == "INFO" and r.get("ID") == "DP") == 1


def test_bcf_hdr_merge_none_dst_copies():
    from htslib_tpu.vcf import BcfHeader, bcf_hdr_merge
    src = BcfHeader(HDR_B)
    out = bcf_hdr_merge(None, src)
    assert out is not src
    assert out.id2int("AF") == src.id2int("AF")


def test_bcf_translate_remaps_ids():
    from htslib_tpu.vcf import BcfHeader, BcfRecord, bcf_hdr_merge, \
        bcf_translate
    dst = BcfHeader(HDR_A)
    src = BcfHeader(HDR_B)
    bcf_hdr_merge(dst, src)
    line = ("chr2\t100\t.\tA\tT\t30\tq20\tDP=7;AF=0.5\tGT:AD\t0/1:3,4")
    rec = BcfRecord.from_vcf(line, src)
    bcf_translate(dst, src, rec)
    # record now renders identically under the merged header
    assert rec.to_vcf(dst) == line
    # and the ids really moved to dst's dictionary slots
    assert rec.rid == dst.name2rid("chr2")
    assert rec.filters == [dst.id2int("q20")]
    assert {dst.id2int("DP"), dst.id2int("AF")} == {e.key for e in rec.info}


def test_bcf_translate_roundtrip_through_bcf(tmp_path):
    # translated records must re-encode to valid BCF under the dst header
    from htslib_tpu.vcf import (BcfHeader, BcfRecord, BcfReader, BcfWriter,
                                bcf_hdr_merge, bcf_translate)
    dst = BcfHeader(HDR_A)
    src = BcfHeader(HDR_B)
    bcf_hdr_merge(dst, src)
    lines = ["chr1\t5\t.\tG\tC\t10\tq10\tDP=2\tGT\t0/0",
             "chr2\t100\trs1\tA\tT\t30\tq20\tDP=7;AF=0.25\tGT:AD\t1/1:0,9"]
    recs = [BcfRecord.from_vcf(l, src) for l in lines]
    for r in recs:
        bcf_translate(dst, src, r)
    p = str(tmp_path / "t.bcf")
    w = BcfWriter(p, dst)
    for r in recs:
        w.write(r)
    w.close()
    with BcfReader(p) as rd:
        back = [rec.to_vcf(rd.header) for rec in rd]
    assert back == lines


def test_vcf_sweep_streaming_constant_memory(tmp_path):
    """Backward sweep over a multi-block bgzipped VCF must chunk (the
    vcf_sweep.c sw_fill_buffer model), never holding every record."""
    from htslib_tpu.bgzf import BGZFWriter
    path = str(tmp_path / "big.vcf.gz")
    hdr = ("##fileformat=VCFv4.2\n"
           "##contig=<ID=c1,length=100000000>\n"
           "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
    w = BGZFWriter(path)
    w.write(hdr.encode())
    n = 20000
    for i in range(n):
        w.write(f"c1\t{i + 1}\t.\tA\tC\t30\tPASS\t.\n".encode())
    w.close()
    with VcfSweep(path, block_size=1 << 14) as sw:
        # chunked: the index must have multiple entries
        first = sw.bwd()
        assert first is not None
        assert first.pos == n - 1            # 0-based position of last rec
        assert len(sw._idx) > 4, "sweep did not chunk the file"
        assert len(sw._buf) < n // 2, "sweep buffered the whole file"
        seen = 1
        while sw.bwd() is not None:
            seen += 1
        assert seen == n
    # direction flip: fwd after bwd restarts from the head
    with VcfSweep(path) as sw:
        assert sw.bwd() is not None
        r = sw.fwd()
        assert r is not None and r.pos == 0
