"""CLI tool + regidx tests (bgzip.c/tabix.c/htsfile.c equivalents;
regidx modeled on test/test-regidx.c)."""
import os
import subprocess
import sys

import pytest

from htslib_tpu import bgzf
from htslib_tpu.regidx import (RegIdx, parse_bed, parse_reg, parse_tab,
                               regidx_from_file)
from tests.conftest import REPO, ref_path, has_ref


def run_cli(mod, *args, stdin=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    res = subprocess.run([sys.executable, "-m", f"htslib_tpu.cli.{mod}"]
                         + list(args), capture_output=True, input=stdin,
                         env=env, cwd=REPO, timeout=300)
    return res


@pytest.mark.skipif(not has_ref("bgziptest.txt"), reason="no corpus")
def test_bgzip_roundtrip(tmp_path):
    src = str(tmp_path / "t.txt")
    data = open(ref_path("bgziptest.txt"), "rb").read()
    open(src, "wb").write(data)
    r = run_cli("bgzip", "-i", "-k", src)
    assert r.returncode == 0, r.stderr
    assert os.path.exists(src + ".gz")
    assert os.path.exists(src + ".gz.gzi")
    r = run_cli("bgzip", "-t", src + ".gz")
    assert r.returncode == 0
    r = run_cli("bgzip", "-d", "-c", src + ".gz")
    assert r.stdout == data
    # random access
    r = run_cli("bgzip", "-b", "100", "-s", "20", "-I", src + ".gz.gzi",
                src + ".gz")
    assert r.stdout == data[100:120]


@pytest.mark.skipif(not has_ref("bgziptest.txt.gz.gzi"), reason="no corpus")
def test_bgzip_rebgzip(tmp_path):
    # bgzip -g reconstructs byte-identical compressed files from the index
    want = open(ref_path("bgziptest.txt.gz"), "rb").read()
    src = str(tmp_path / "bgziptest.txt")
    open(src, "wb").write(open(ref_path("bgziptest.txt"), "rb").read())
    r = run_cli("bgzip", "-g", "-c", "-I", ref_path("bgziptest.txt.gz.gzi"),
                src)
    assert r.returncode == 0, r.stderr
    # decompressed content identical; blocks boundaries identical
    out, t1 = bgzf.inflate_blocks(r.stdout)
    win, t2 = bgzf.inflate_blocks(want)
    assert bytes(out) == bytes(win)
    assert list(t1.usizes) == list(t2.usizes)


def test_htsfile_identify():
    r = run_cli("htsfile", ref_path("range.bam"), ref_path("index.vcf"),
                ref_path("ce.fa"))
    lines = r.stdout.decode().splitlines()
    assert "BAM" in lines[0]
    assert "VCF" in lines[1]
    assert "FASTA" in lines[2]


def test_tabix_cli(tmp_path):
    src = os.path.join(REF_TEST_DIR, "tabix", "vcf_file.vcf")
    if not os.path.exists(src):
        pytest.skip("missing")
    gz = str(tmp_path / "v.vcf.gz")
    data = open(src, "rb").read()
    with bgzf.BGZFWriter(gz) as w:
        w.write(data)
    r = run_cli("tabix", "-p", "vcf", gz)
    assert r.returncode == 0, r.stderr
    assert os.path.exists(gz + ".tbi")
    r = run_cli("tabix", gz, "1:3000151-3000151")
    want = open(os.path.join(REF_TEST_DIR, "tabix", "vcf_file.1.3000151.out")).read()
    assert r.stdout.decode() == want
    r = run_cli("tabix", "-l", gz)
    assert r.stdout.decode().split() == ["1", "2", "3", "4"]


REF_TEST_DIR = "/root/reference/test"


# -- regidx (test/test-regidx.c style checks) -------------------------------

def test_regidx_overlap():
    idx = RegIdx()
    idx.push("chr1", 100, 200, "a")
    idx.push("chr1", 150, 300, "b")
    idx.push("chr1", 500, 600, "c")
    idx.push("chr2", 0, 10, "d")
    hits = [p for _, _, p in idx.overlap("chr1", 180, 250)]
    assert hits == ["a", "b"]
    assert not idx.has_overlap("chr1", 301, 499)
    assert idx.has_overlap("chr1", 600)
    assert idx.has_overlap("chr2", 5)
    assert not idx.has_overlap("chr3", 5)
    assert idx.nregs() == 4


def test_regidx_parsers():
    assert parse_bed("chr1\t10\t20\n") == ("chr1", 10, 19, None)
    assert parse_tab("chr1\t10\t20\n") == ("chr1", 9, 19, None)
    assert parse_tab("chr1\t10\n") == ("chr1", 9, 9, None)
    assert parse_reg("chr1:100-200") == ("chr1", 99, 199, None)
    name, b, e, _ = parse_reg("chr1")
    assert name == "chr1" and b == 0
    assert parse_bed("#comment") is None


@pytest.mark.skipif(not has_ref("tabix/bed_file.bed"), reason="no corpus")
def test_regidx_from_bed_file():
    idx = regidx_from_file(ref_path("tabix", "bed_file.bed"), parse_bed)
    assert idx.nregs() > 0
    assert idx.has_overlap("Y", 100100, 100200)


@pytest.mark.skipif(not has_ref("tabix/vcf_file.vcf"), reason="no corpus")
def test_tabix_header_reheader_separate(tmp_path):
    """tabix -h/-H/-r/--separate-regions/-R (tabix.c:598-607 options)."""
    src = ref_path("tabix", "vcf_file.vcf")
    data = open(src, "rb").read()
    gz = str(tmp_path / "v.vcf.gz")
    bgzf.bgzf_compress_file(src, gz) if hasattr(bgzf, "bgzf_compress_file") \
        else None
    if not os.path.exists(gz):
        w = bgzf.BGZFWriter(gz)
        w.write(data)
        w.close()
    assert run_cli("tabix", "-p", "vcf", gz).returncode == 0

    hdr_lines = [l for l in data.decode().splitlines() if l.startswith("#")]
    r = run_cli("tabix", "-H", gz)
    assert r.returncode == 0, r.stderr
    assert r.stdout.decode().splitlines() == hdr_lines

    # -h prints the header before the region output
    r = run_cli("tabix", "-h", gz, "1:3000151-3000151")
    out_lines = r.stdout.decode().splitlines()
    assert out_lines[:len(hdr_lines)] == hdr_lines
    assert any("3000151" in l for l in out_lines[len(hdr_lines):])

    # --separate-regions prefixes each region block with "#region"
    r = run_cli("tabix", "--separate-regions", gz,
                "1:3000151-3000151", "1:3000151-3000151")
    body = r.stdout.decode().splitlines()
    assert body.count("#1:3000151-3000151") == 2

    # -R region file
    rf = str(tmp_path / "regions.txt")
    open(rf, "w").write("1:3000151-3000151\n")
    r = run_cli("tabix", "-R", rf, gz)
    assert any("3000151" in l for l in r.stdout.decode().splitlines())

    # -r replaces the header
    new_hdr = str(tmp_path / "new.hdr")
    open(new_hdr, "w").write("##fileformat=VCFv4.1\n##newheader=1\n#CHROM\n")
    r = run_cli("tabix", "-r", new_hdr, gz)
    assert r.returncode == 0, r.stderr
    out_gz = str(tmp_path / "rehdr.vcf.gz")
    open(out_gz, "wb").write(r.stdout)
    with bgzf.BGZFReader(out_gz) as fp:
        text = bytes(fp.read_all()).decode()
    lines = text.splitlines()
    assert lines[0] == "##fileformat=VCFv4.1"
    assert lines[1] == "##newheader=1"
    assert lines[2] == "#CHROM"
    # body preserved verbatim
    body_want = [l for l in data.decode().splitlines()
                 if not l.startswith("#")]
    assert lines[3:] == body_want
