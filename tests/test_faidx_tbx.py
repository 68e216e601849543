"""faidx + tabix tests — modeled on reference test/test_faidx.c,
test/faidx/test-faidx.sh and test/tabix/tabix.tst goldens."""
import gzip
import os

import pytest

from htslib_tpu import bgzf
from htslib_tpu.faidx import Faidx
from htslib_tpu.tbx import (CONF_BED, CONF_GFF, CONF_VCF, Tabix, tbx_parse1)
from tests.conftest import ref_path, has_ref

TABIX_DIR = "/root/reference/test/tabix"


@pytest.mark.skipif(not has_ref("ce.fa.fai"), reason="no corpus")
def test_fai_build_matches_reference():
    built = Faidx.build(ref_path("ce.fa"), save=False)
    want = open(ref_path("ce.fa.fai")).read().rstrip("\n").split("\n")
    got = [f"{e.name}\t{e.length}\t{e.offset}\t{e.line_blen}\t{e.line_len}"
           for e in built.entries]
    assert got == want


@pytest.mark.parametrize("fa", ["ce.fa", "xx.fa", "c1.fa", "auxf.fa", "md.fa"])
def test_fai_build_all(fa):
    if not has_ref(fa + ".fai"):
        pytest.skip("missing")
    built = Faidx.build(ref_path(fa), save=False)
    want = open(ref_path(fa + ".fai")).read().rstrip("\n").split("\n")
    got = [f"{e.name}\t{e.length}\t{e.offset}\t{e.line_blen}\t{e.line_len}"
           for e in built.entries]
    assert got == want


@pytest.mark.skipif(not has_ref("ce.fa"), reason="no corpus")
def test_fetch_matches_raw():
    fai = Faidx.load(ref_path("ce.fa"), build_missing=False)
    # reconstruct one sequence from raw file and compare a slice
    name = fai.seq_names()[0]
    seq = fai.fetch_seq(name, 0, fai.seq_len(name))
    assert len(seq) == fai.seq_len(name)
    # line boundaries crossing slice
    s2 = fai.fetch_seq(name, 55, 130)
    assert s2 == seq[55:130]
    rn, s3 = fai.fetch(f"{name}:56-130")
    assert rn == name and s3 == seq[55:130]
    fai.close()


def test_fai_bgzf(tmp_path):
    # compress a fasta with bgzip and fetch through .gzi
    src = ref_path("ce.fa")
    if not has_ref("ce.fa"):
        pytest.skip("missing")
    data = open(src, "rb").read()
    gz = str(tmp_path / "ce.fa.gz")
    with bgzf.BGZFWriter(gz) as w:
        w.write(data)
    fai = Faidx.build(gz, save=False)
    plain = Faidx.load(src, build_missing=False)
    name = plain.seq_names()[0]
    assert fai.fetch_seq(name, 100, 200) == plain.fetch_seq(name, 100, 200)
    fai.close()
    plain.close()


def test_fastq_index(tmp_path):
    fq = str(tmp_path / "t.fq")
    with open(fq, "w") as f:
        f.write("@r1 desc\nACGTACGT\n+\nFFFFFFFF\n@r2\nGGGG\n+\nHHHH\n")
    fai = Faidx.build(fq)
    assert fai.seq_names() == ["r1", "r2"]
    assert fai.fetch_seq("r1", 0, 8) == "ACGTACGT"
    assert fai.fetch_qual("r2", 0, 4) == "HHHH"
    fai.close()


# ---------------------------------------------------------------------------
# tabix
# ---------------------------------------------------------------------------

def _bgzip_copy(src, dst):
    data = open(src, "rb").read()
    with bgzf.BGZFWriter(dst) as w:
        w.write(data)


def run_tabix_golden(tmp_path, src, conf, queries, min_shift=0):
    gz = str(tmp_path / (os.path.basename(src) + ".gz"))
    _bgzip_copy(src, gz)
    tbx = Tabix.build(gz, conf, min_shift=min_shift)
    results = {}
    with bgzf.BGZFReader(gz) as fp:
        for q in queries:
            results[q] = list(tbx.query_region(fp, q))
    return results


@pytest.mark.skipif(not os.path.isdir(TABIX_DIR), reason="no corpus")
@pytest.mark.parametrize("min_shift", [0, 12])
def test_tabix_vcf_goldens(tmp_path, min_shift):
    src = os.path.join(TABIX_DIR, "vcf_file.vcf")
    res = run_tabix_golden(tmp_path, src, CONF_VCF,
                           ["1:3000151-3000151", "2:3199812-3199812"],
                           min_shift=min_shift)
    want1 = open(os.path.join(TABIX_DIR, "vcf_file.1.3000151.out")).read()
    want2 = open(os.path.join(TABIX_DIR, "vcf_file.2.3199812.out")).read()
    assert "\n".join(res["1:3000151-3000151"]) + "\n" == want1
    assert "\n".join(res["2:3199812-3199812"]) + "\n" == want2


@pytest.mark.skipif(not os.path.isdir(TABIX_DIR), reason="no corpus")
def test_tabix_bed_golden(tmp_path):
    src = os.path.join(TABIX_DIR, "bed_file.bed")
    res = run_tabix_golden(tmp_path, src, CONF_BED, ["Y:100200-100200"])
    want = open(os.path.join(TABIX_DIR, "bed_file.Y.100200.out")).read()
    assert "\n".join(res["Y:100200-100200"]) + "\n" == want


@pytest.mark.skipif(not os.path.isdir(TABIX_DIR), reason="no corpus")
def test_tabix_gff_golden(tmp_path):
    src = os.path.join(TABIX_DIR, "gff_file.gff")
    res = run_tabix_golden(tmp_path, src, CONF_GFF, ["X:2934832-2935190"])
    want = open(os.path.join(TABIX_DIR, "gff_file.X.2934832.2935190.out")).read()
    assert "\n".join(res["X:2934832-2935190"]) + "\n" == want


@pytest.mark.skipif(not os.path.isdir(TABIX_DIR), reason="no corpus")
def test_tabix_large_chr_csi(tmp_path):
    src = os.path.join(TABIX_DIR, "large_chr.vcf")
    res = run_tabix_golden(tmp_path, src, CONF_VCF, ["chr20:1-2147483647"],
                           min_shift=14)
    want = open(os.path.join(TABIX_DIR, "large_chr.20.1.2147483647.out")).read()
    assert "\n".join(res["chr20:1-2147483647"]) + "\n" == want


@pytest.mark.skipif(not has_ref("index.vcf.gz.tbi"), reason="no corpus")
def test_load_reference_tbi(tmp_path):
    # the .gz itself isn't in the corpus — validate that the reference's
    # prebuilt TBI parses and agrees with one we build from index.vcf
    ref_tbx = Tabix.load(ref_path("index.vcf.gz.tbi"))
    assert ref_tbx.names
    gz = str(tmp_path / "index.vcf.gz")
    _bgzip_copy(ref_path("index.vcf"), gz)
    ours = Tabix.build(gz, CONF_VCF)
    assert ours.names == ref_tbx.names
    assert ours.conf.preset == ref_tbx.conf.preset
    assert ours.conf.sc == ref_tbx.conf.sc
    # all contigs queryable with correct contig column
    with bgzf.BGZFReader(gz) as fp:
        for name in ours.names:
            lines = list(ours.query(fp, ours.name2tid(name), 0, 1 << 40))
            assert lines and all(l.split("\t")[0] == name for l in lines)


def test_tbx_parse1_vcf_end():
    conf = CONF_VCF
    name, beg, end = tbx_parse1(conf, "chr1\t100\t.\tACGT\tA\t.\t.\t.\n")
    assert (name, beg, end) == ("chr1", 99, 103)
    _, beg, end = tbx_parse1(conf, "chr1\t100\t.\tA\t<DEL>\t.\t.\tEND=200;X=1\n")
    assert (beg, end) == (99, 200)
    _, beg, end = tbx_parse1(conf, "chr1\t100\t.\tA\t<DEL>\t.\t.\tSVLEN=-50\n")
    assert (beg, end) == (99, 149)


# ---------------------------------------------------------------------------
# test/faidx subdir goldens (faidx.tst: hostile FASTA/FASTQ geometry)

def test_faidx_subdir_goldens(tmp_path):
    import shutil
    from tests.conftest import REF_TEST
    sub = os.path.join(REF_TEST, "faidx")
    if not os.path.isdir(sub):
        pytest.skip("no corpus")
    fa = str(tmp_path / "faidx.fa")
    fq = str(tmp_path / "fastqs.fq")
    shutil.copy(os.path.join(sub, "faidx.fa"), fa)
    shutil.copy(os.path.join(sub, "fastqs.fq"), fq)
    Faidx.build(fa)
    assert open(fa + ".fai").read() == \
        open(os.path.join(sub, "faidx.fa.expected.fai")).read()
    Faidx.build(fq)
    assert open(fq + ".fqi").read() == \
        open(os.path.join(sub, "fastqs.fq.expected.fai")).read()
    f = Faidx.load(fa)
    # faidx.1.expected.fa regions (empty names, trailing blanks, CRLF)
    for reg, want in [("trailingblank2:28-33", "GGGCCC"),
                      ("trailingblank3:4-5", "TA"), ("bar:4-5", "TA")]:
        _, seq = f.fetch(reg)
        assert seq == want, reg
    # accessor semantics from faidx.tst
    assert f.entries[3].name == "trailingblank3"
    assert f._byname["trailingblank1"].length == 33
    assert "absent" not in f._byname
