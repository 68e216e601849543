"""Write-side VCF/BCF record CRUD (bcf_update_*, reference
vcf.c:5546-6035, htslib/vcf.h:640-1100) — the API the bcftools
ecosystem sits on.

Covers: update_info (INT/REAL/STR/FLAG, add/replace/remove, END→rlen),
update_format (+GT-first ordering, string formats), update_genotypes,
update_alleles (rlen refresh incl. symbolic SVLEN alleles), filter
CRUD, ID CRUD — plus mutate→write→reference-htslib-reads-it round
trips via the built htslib's htsfile (bcf_read + vcf_format)."""
import os
import subprocess

import numpy as np
import pytest

from htslib_tpu.vcf import (BcfHeader, BcfReader, BcfRecord, BcfWriter,
                            VcfReader, VcfWriter)
from htslib_tpu.vcf.record import (BCF_HT_INT, BCF_HT_REAL, BCF_HT_STR,
                                   INT32_MISSING, INT32_VECTOR_END,
                                   GT_MISSING, get_rlen, gt_phased,
                                   gt_unphased)

HDR = "\n".join([
    "##fileformat=VCFv4.2",
    "##contig=<ID=1,length=1000000>",
    "##contig=<ID=2,length=500000>",
    "##FILTER=<ID=q10,Description=\"Q10\">",
    "##FILTER=<ID=s50,Description=\"S50\">",
    "##INFO=<ID=DP,Number=1,Type=Integer,Description=\"Depth\">",
    "##INFO=<ID=AF,Number=A,Type=Float,Description=\"Freq\">",
    "##INFO=<ID=STR,Number=1,Type=String,Description=\"Str\">",
    "##INFO=<ID=DB,Number=0,Type=Flag,Description=\"dbSNP\">",
    "##INFO=<ID=END,Number=1,Type=Integer,Description=\"End\">",
    "##INFO=<ID=SVLEN,Number=A,Type=Integer,Description=\"SV length\">",
    "##FORMAT=<ID=GT,Number=1,Type=String,Description=\"GT\">",
    "##FORMAT=<ID=DP,Number=1,Type=Integer,Description=\"Depth\">",
    "##FORMAT=<ID=GQ,Number=1,Type=Integer,Description=\"GQ\">",
    "##FORMAT=<ID=PL,Number=G,Type=Integer,Description=\"PL\">",
    "##FORMAT=<ID=GL,Number=G,Type=Float,Description=\"GL\">",
    "##FORMAT=<ID=TS,Number=1,Type=String,Description=\"ts\">",
    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tNA1\tNA2",
]) + "\n"

LINE = "1\t100\trs1\tAC\tA,ACT\t29\tPASS\tDP=10;AF=0.5,0.1\t" \
       "GT:DP\t0/1:12\t1|1:.\n"


def mk():
    hdr = BcfHeader(HDR)
    rec = BcfRecord.from_vcf(LINE, hdr)
    return hdr, rec


# ---------------------------------------------------------------------------
# update_info
# ---------------------------------------------------------------------------

def test_update_info_int_replace_and_add():
    hdr, rec = mk()
    assert rec.update_info(hdr, "DP", 42) == 0
    e = rec.get_info(hdr, "DP")
    assert list(e.value) == [42]
    # formats back
    assert "DP=42" in rec.to_vcf(hdr)
    # undefined key -> -1
    assert rec.update_info(hdr, "NOSUCH", 1) == -1


def test_update_info_remove():
    hdr, rec = mk()
    assert rec.update_info(hdr, "DP", None) == 0
    assert rec.get_info(hdr, "DP") is None
    assert "DP=" not in rec.to_vcf(hdr)
    # removing an absent tag is a no-op success
    assert rec.update_info(hdr, "DP", None) == 0


def test_update_info_float_str_flag():
    hdr, rec = mk()
    assert rec.update_info(hdr, "AF", [0.25, None]) == 0
    assert "AF=0.25,." in rec.to_vcf(hdr)
    assert rec.update_info(hdr, "STR", "hello,world") == 0
    assert "STR=hello,world" in rec.to_vcf(hdr)
    assert rec.update_info(hdr, "DB", True) == 0
    assert "DB" in rec.to_vcf(hdr).split("\t")[7].split(";")
    assert rec.update_info(hdr, "DB", False) == 0
    assert "DB" not in rec.to_vcf(hdr).split("\t")[7].split(";")


def test_update_info_end_sets_rlen():
    hdr, rec = mk()
    assert rec.rlen == 2          # REF "AC"
    assert rec.update_info(hdr, "END", 199) == 0
    assert rec.rlen == 100        # END-POS (1-based END 199, pos0 99)
    # removal restores the REF length
    assert rec.update_info(hdr, "END", None) == 0
    assert rec.rlen == 2
    # END must be scalar
    assert rec.update_info(hdr, "END", [1, 2]) == -1


def test_update_alleles_and_svlen_rlen():
    hdr, rec = mk()
    assert rec.update_alleles(hdr, ["ACGT", "A"]) == 0
    assert rec.alleles == ["ACGT", "A"]
    assert rec.rlen == 4
    # symbolic deletion + SVLEN drives rlen (get_rlen, vcf.c:6420)
    assert rec.update_alleles(hdr, ["A", "<DEL>"]) == 0
    assert rec.update_info(hdr, "SVLEN", [-500]) == 0
    assert rec.rlen == 501
    assert get_rlen(hdr, rec) == 501


# ---------------------------------------------------------------------------
# update_format / genotypes
# ---------------------------------------------------------------------------

def test_update_format_int():
    hdr, rec = mk()
    assert rec.update_format(hdr, "GQ", [40, 50]) == 0
    cols = rec.to_vcf(hdr).split("\t")
    assert cols[8] == "GT:DP:GQ"
    assert cols[9].endswith(":40") and cols[10].endswith(":50")
    # replace existing values
    assert rec.update_format(hdr, "DP", [[1], [None]]) == 0
    assert cols[8] == "GT:DP:GQ"
    assert rec.to_vcf(hdr).split("\t")[9] == "0/1:1:40"
    assert rec.to_vcf(hdr).split("\t")[10] == "1|1:.:50"
    # remove
    assert rec.update_format(hdr, "DP", None) == 0
    assert rec.to_vcf(hdr).split("\t")[8] == "GT:GQ"
    # undefined tag
    assert rec.update_format(hdr, "XX", [1, 2]) == -1
    assert rec.update_format(hdr, "XX", None) == 0   # removal no-op


def test_update_format_vector_and_float():
    hdr, rec = mk()
    assert rec.update_format(hdr, "PL", [[0, 10, 99], [20, 0, 30]]) == 0
    assert rec.to_vcf(hdr).split("\t")[9].endswith(":0,10,99")
    assert rec.update_format(hdr, "GL", [[-0.5, 0.0], [None, -1.25]]) == 0
    s = rec.to_vcf(hdr)
    assert s.split("\t")[9].endswith(":-0.5,0")
    assert s.split("\t")[10].endswith(":.,-1.25")


def test_update_format_string():
    hdr, rec = mk()
    assert rec.update_format_string(hdr, "TS", ["abc", "de"]) == 0
    s = rec.to_vcf(hdr)
    assert s.split("\t")[9].endswith(":abc")
    assert s.split("\t")[10].endswith(":de")


def test_update_genotypes_and_gt_first():
    hdr, rec = mk()
    # replace GT in place
    assert rec.update_genotypes(
        hdr, [[gt_unphased(1), gt_unphased(1)],
              [gt_phased(0), gt_phased(1)]]) == 0
    cols = rec.to_vcf(hdr).split("\t")
    assert cols[9].startswith("1/1")
    # vcf.c:6345 formats a leading phased 0 as "0|1"
    assert cols[10].split(":")[0] == "0|1"
    # GT added to a record without one is inserted FIRST (vcf.c:5779)
    rec2 = BcfRecord.from_vcf(
        "1\t7\t.\tA\tC\t.\t.\tDP=3\tDP\t5\t6\n", hdr)
    assert rec2.update_genotypes(
        hdr, [[gt_unphased(0)], [GT_MISSING]]) == 0
    cols = rec2.to_vcf(hdr).split("\t")
    assert cols[8] == "GT:DP"
    assert cols[9] == "0:5" and cols[10] == ".:6"


def test_ragged_genotypes_vector_end():
    hdr, rec = mk()
    assert rec.update_genotypes(
        hdr, [[gt_unphased(0)], [gt_unphased(1), gt_unphased(1)]]) == 0
    gt = rec.get_fmt(hdr, "GT")
    assert gt.value.shape == (2, 2)
    assert gt.value[0, 1] == INT32_VECTOR_END
    assert rec.to_vcf(hdr).split("\t")[9].split(":")[0] == "0"


# ---------------------------------------------------------------------------
# filters / id
# ---------------------------------------------------------------------------

def test_filter_crud():
    hdr, rec = mk()
    q10 = hdr.id2int("q10")
    s50 = hdr.id2int("s50")
    assert rec.has_filter(hdr, "PASS") == 1      # PASS explicit
    assert rec.add_filter(hdr, q10) == 1          # replaces lone PASS
    assert rec.to_vcf(hdr).split("\t")[6] == "q10"
    assert rec.add_filter(hdr, s50) == 1
    assert rec.to_vcf(hdr).split("\t")[6] == "q10;s50"
    assert rec.add_filter(hdr, q10) == 0          # already present
    assert rec.has_filter(hdr, "q10") == 1
    assert rec.has_filter(hdr, "NOSUCH") == -1
    rec.remove_filter(hdr, q10, pass_=False)
    assert rec.to_vcf(hdr).split("\t")[6] == "s50"
    rec.remove_filter(hdr, s50, pass_=True)
    assert rec.to_vcf(hdr).split("\t")[6] == "PASS"
    rec.update_filter(hdr, [])
    assert rec.to_vcf(hdr).split("\t")[6] == "."
    assert rec.has_filter(hdr, ".") == 1          # '.' means PASS; empty ok
    # add PASS over others clears them (vcf.c:5845)
    rec.update_filter(hdr, [q10, s50])
    rec.add_filter(hdr, 0)
    assert rec.to_vcf(hdr).split("\t")[6] == "PASS"


def test_id_crud():
    hdr, rec = mk()
    assert rec.update_id("rs99") == 0
    assert rec.to_vcf(hdr).split("\t")[2] == "rs99"
    assert rec.add_id("rs100") == 0
    assert rec.to_vcf(hdr).split("\t")[2] == "rs99;rs100"
    assert rec.add_id("rs99") == 0                # already present
    assert rec.to_vcf(hdr).split("\t")[2] == "rs99;rs100"
    assert rec.update_id(None) == 0
    assert rec.to_vcf(hdr).split("\t")[2] == "."


# ---------------------------------------------------------------------------
# dirty-tracking re-encode and BCF round trips
# ---------------------------------------------------------------------------

def test_mutation_invalidates_wire_blobs(tmp_path):
    hdr, rec = mk()
    p = str(tmp_path / "a.bcf")
    with BcfWriter(p, hdr) as w:
        w.write(rec)
    with BcfReader(p) as r:
        rec2 = next(iter(r))
        rhdr = r.header
    assert rec2._shared is not None
    rec2.update_info(rhdr, "DP", 77)
    assert rec2._shared is None                  # re-encode on next write
    p2 = str(tmp_path / "b.bcf")
    with BcfWriter(p2, rhdr) as w:
        w.write(rec2)
    with BcfReader(p2) as r:
        rec3 = next(iter(r))
        assert list(rec3.get_info(r.header, "DP").value) == [77]
        assert rec3.to_vcf(r.header) == rec2.to_vcf(rhdr)


BUILD = os.environ.get("HTSLIB_BUILD", "/tmp/htslib-build")
HTSFILE = os.path.join(BUILD, "htsfile")


@pytest.mark.skipif(not os.path.exists(HTSFILE),
                    reason="reference htslib not built")
def test_mutate_write_htslib_reads(tmp_path):
    """Mutate via every update_* family member, write BCF, and require
    the reference build's bcf_read+vcf_format (htsfile -c) to reproduce
    our own to_vcf text exactly."""
    hdr, rec = mk()
    rec.update_info(hdr, "DP", 1234)
    rec.update_info(hdr, "AF", [0.125])
    rec.update_info(hdr, "DB", True)
    rec.update_info(hdr, "STR", "xyz")
    rec.update_genotypes(hdr, [[gt_unphased(0), gt_unphased(1)],
                               [gt_phased(1), gt_phased(1)]])
    rec.update_format(hdr, "GQ", [10, None])
    rec.update_format(hdr, "PL", [[0, 3, 60], [50, 0, None]])
    rec.update_format_string(hdr, "TS", ["ab", "cdef"])
    rec.add_filter(hdr, hdr.id2int("q10"))
    rec.add_id("rsX")
    rec.qual = 17.0

    rec2 = BcfRecord.from_vcf(
        "2\t500\t.\tT\t<DEL>\t.\t.\t.\tGT\t./.\t0/0\n", hdr)
    rec2.update_info(hdr, "END", 800)
    rec2.update_info(hdr, "SVLEN", [-300])

    p = str(tmp_path / "mut.bcf")
    with BcfWriter(p, hdr) as w:
        w.write(rec)
        w.write(rec2)
    out = subprocess.run([HTSFILE, "-c", p], capture_output=True,
                         text=True, check=True).stdout
    got = [l for l in out.splitlines() if not l.startswith("#")]
    assert got == [rec.to_vcf(hdr), rec2.to_vcf(hdr)]

    # and the reference's own BCF re-encode agrees byte-for-byte with
    # ours: htsfile -c -> VCF -> our parser -> to_bcf round trip
    with BcfReader(p) as r:
        recs = list(r)
        assert [x.to_vcf(r.header) for x in recs] == got


@pytest.mark.skipif(not os.path.exists(HTSFILE),
                    reason="reference htslib not built")
def test_mutated_corpus_roundtrip(tmp_path):
    """Load the reference corpus VCF, bulk-mutate every record, write
    BCF, and check htslib reads back exactly our text."""
    src = "/root/reference/test/index.vcf"
    with VcfReader(src) as r:
        hdr = r.header.copy()
        recs = list(r)
    assert recs
    for i, rec in enumerate(recs):
        rec.update_id(f"m{i}")
        if rec.get_fmt(hdr, "GT") is not None:
            rec.update_genotypes(hdr, [[gt_unphased(i % 2)]]
                                 * hdr.n_samples)
    p = str(tmp_path / "corpus.bcf")
    with BcfWriter(p, hdr) as w:
        for rec in recs:
            w.write(rec)
    out = subprocess.run([HTSFILE, "-c", p], capture_output=True,
                         text=True, check=True).stdout
    got = [l for l in out.splitlines() if not l.startswith("#")]
    assert got == [rec.to_vcf(hdr) for rec in recs]
