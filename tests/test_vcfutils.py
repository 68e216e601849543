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


# ---------------------------------------------------------------------------
# bcf_calc_ac / bcf_gt_type / bcf_remove_allele_set parity vs the built
# reference htslib (vcfutils.c:32,134,659) via tests/vcfutils_golden.c
# ---------------------------------------------------------------------------

import subprocess

import numpy as np

from htslib_tpu.vcfutils import (BCF_UN_FMT, BCF_UN_INFO, GT_UNKN, calc_ac,
                                 gt_type, remove_alleles)

BUILD = os.environ.get("HTSLIB_BUILD", "/tmp/htslib-build")

GOLDEN_HDR = """##fileformat=VCFv4.2
##INFO=<ID=AF,Number=A,Type=Float,Description="d">
##INFO=<ID=IR,Number=R,Type=Integer,Description="d">
##INFO=<ID=IG,Number=G,Type=Integer,Description="d">
##INFO=<ID=SA,Number=A,Type=String,Description="d">
##INFO=<ID=SG,Number=G,Type=String,Description="d">
##INFO=<ID=AN,Number=1,Type=Integer,Description="d">
##INFO=<ID=AC,Number=A,Type=Integer,Description="d">
##FORMAT=<ID=GT,Number=1,Type=String,Description="d">
##FORMAT=<ID=AD,Number=R,Type=Integer,Description="d">
##FORMAT=<ID=PL,Number=G,Type=Integer,Description="d">
##FORMAT=<ID=GL,Number=G,Type=Float,Description="d">
##FORMAT=<ID=FA,Number=A,Type=Float,Description="d">
##FORMAT=<ID=RS,Number=R,Type=String,Description="d">
##FORMAT=<ID=GS,Number=G,Type=String,Description="d">
##contig=<ID=1,length=1000>
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\tS3
"""

GOLDEN_LINES = [
    # triallelic, diploid everywhere, full A/R/G INFO+FORMAT
    "1\t10\t.\tA\tC,G\t50\t.\tAF=0.5,0.25;IR=7,8,9;IG=1,2,3,4,5,6;"
    "SA=x,y;SG=aa,bb,cc,dd,ee,ff"
    "\tGT:AD:PL:GL:FA:RS:GS"
    "\t0/1:10,5,0:0,10,100,20,120,200:-0.1,-1,-10,-2,-12,-20:0.5,0.25:r,a,b:g1,g2,g3,g4,g5,g6"
    "\t1/2:0,3,4:90,50,60,10,5,0:-9,-5,-6,-1,-0.5,0:0.9,0.8:u,v,w:h1,h2,h3,h4,h5,h6"
    "\t0/0:9,0,0:0,30,300,40,340,400:0,-3,-30,-4,-34,-40:0.1,0.2:p,q,s:i1,i2,i3,i4,i5,i6",
    # haploid + missing samples
    "1\t20\t.\tT\tA,C\t.\t.\tIR=1,2,3"
    "\tGT:AD:PL"
    "\t1:4,5,6:10,20,30"
    "\t./.:.:."
    "\t2:7,8,9:5,6,7",
    # quad-allelic with AN/AC INFO
    "1\t30\t.\tG\tA,C,T\t9\t.\tAN=6;AC=2,1,0;AF=0.3,0.2,0.1"
    "\tGT:AD"
    "\t0/1:5,2,0,0"
    "\t1/2:1,2,3,0"
    "\t0|0:6,0,0,0",
]


def _golden_bin(tmp_path_factory=None):
    exe = "/tmp/vcfutils_golden_t"
    src = os.path.join(os.path.dirname(__file__), "vcfutils_golden.c")
    if not os.path.exists(os.path.join(BUILD, "libhts.a")):
        return None
    if not os.path.exists(exe) or (
            os.path.getmtime(exe) < os.path.getmtime(src)):
        r = subprocess.run(
            ["gcc", "-I" + BUILD, "-o", exe, src,
             os.path.join(BUILD, "libhts.a"),
             "-ldeflate", "-lz", "-llzma", "-lm", "-lpthread"],
            capture_output=True)
        if r.returncode != 0:
            return None
    return exe


def _run_golden(exe, vcf_path, rm=""):
    out = subprocess.run([exe, vcf_path, rm], capture_output=True,
                         timeout=60)
    assert out.returncode == 0, out.stderr.decode()
    return out.stdout.decode().splitlines()


@pytest.mark.parametrize("rm", ["1", "2", "1,2"])
def test_vcfutils_parity_vs_htslib(tmp_path, rm):
    exe = _golden_bin()
    if exe is None:
        pytest.skip("reference htslib not built")
    vcf = str(tmp_path / "in.vcf")
    with open(vcf, "w") as f:
        f.write(GOLDEN_HDR)
        for ln in GOLDEN_LINES:
            f.write(ln + "\n")
    lines = _run_golden(exe, vcf, rm)

    h = BcfHeader(GOLDEN_HDR)
    li = 0
    for src in GOLDEN_LINES:
        v = BcfRecord.from_vcf(src, h)
        # AC parity
        want = lines[li]; li += 1
        ac = calc_ac(h, v, BCF_UN_FMT)
        if ac is None:
            assert want == "AC ret=0"
        else:
            assert want == "AC ret=1 " + " ".join(str(x) for x in ac)
        # GT type parity
        gt = v.get_fmt(h, "GT")
        if gt is not None:
            for s in range(v.n_sample):
                want = lines[li]; li += 1
                t, ial, jal = gt_type(gt, s)
                ref_t, ref_i, ref_j = (int(x) for x in want.split()[1:])
                assert t == ref_t, (src, s, want)
                if t != GT_UNKN:
                    assert (ial, jal) == (ref_i, ref_j), (src, s, want)
        # remove_allele_set parity
        want = lines[li]; li += 1
        if int(rm.split(",")[0]) >= v.n_allele:
            continue
        mask = np.zeros(v.n_allele, bool)
        for tok in rm.split(","):
            if int(tok) < v.n_allele:
                mask[int(tok)] = True
        remove_alleles(h, v, mask)
        got = "RM " + v.to_vcf(h)
        assert got.rstrip("\n") == want.rstrip("\n"), (src, rm)


def test_calc_ac_from_info():
    h = BcfHeader(GOLDEN_HDR)
    v = BcfRecord.from_vcf(GOLDEN_LINES[2], h)
    assert calc_ac(h, v, BCF_UN_INFO) == [3, 2, 1, 0]
    # FMT split of the same record counts the GTs instead
    assert calc_ac(h, v, BCF_UN_FMT) == [3, 2, 1, 0]
