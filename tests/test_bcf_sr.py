"""Synced BCF reader tests vs reference test/bcf-sr goldens
(driver replicates test-bcf-sr.c's summary format)."""
import os

import pytest

from htslib_tpu.synced_reader import (BCF_SR_PAIR_ALL, BCF_SR_PAIR_EXACT,
                                      SyncedReader)
from tests.conftest import REF_TEST

SR_DIR = os.path.join(REF_TEST, "bcf-sr")


def summary(sr: SyncedReader) -> str:
    out = []
    while sr.next_line() > 0:
        line = None
        for i in range(sr.nreaders):
            if sr.has_line(i):
                rec = sr.get_line(i)
                name = sr.get_header(i).rid2name(rec.rid)
                line = f"{name}:{rec.pos + 1}"
                break
        cells = []
        for i in range(sr.nreaders):
            if not sr.has_line(i):
                cells.append("-")
                continue
            rec = sr.get_line(i)
            cells.append(",".join(rec.alleles[1:]) if rec.n_allele > 1 else ".")
        out.append(line + "\t" + "\t".join(cells))
    return "\n".join(out) + "\n"


@pytest.mark.skipif(not os.path.isdir(SR_DIR), reason="no corpus")
def test_merge_noidx_abc_pair_all():
    # test.pl:1302: test-bcf-sr --no-index -p all a.vcf b.vcf c.vcf
    sr = SyncedReader(pair=BCF_SR_PAIR_ALL)
    for f in ("merge.noidx.a.vcf", "merge.noidx.b.vcf", "merge.noidx.c.vcf"):
        sr.add_reader(os.path.join(SR_DIR, f))
    got = summary(sr)
    want = open(os.path.join(SR_DIR, "merge.noidx.abc.expected.out")).read()
    assert got == want
    sr.close()


def test_exact_pairing(tmp_path):
    a = tmp_path / "a.vcf"
    b = tmp_path / "b.vcf"
    hdr = ("##fileformat=VCFv4.2\n##contig=<ID=1>\n"
           "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
    a.write_text(hdr + "1\t100\t.\tC\tT\t.\t.\t.\n1\t200\t.\tA\tG\t.\t.\t.\n")
    b.write_text(hdr + "1\t100\t.\tC\tG\t.\t.\t.\n1\t200\t.\tA\tG\t.\t.\t.\n")
    sr = SyncedReader(pair=BCF_SR_PAIR_EXACT)
    sr.add_reader(str(a))
    sr.add_reader(str(b))
    rounds = []
    while sr.next_line() > 0:
        rounds.append(tuple(sr.has_line(i) for i in range(2)))
    # pos 100: C>T and C>G don't pair exactly -> two rounds; pos 200 pairs
    assert rounds == [(True, False), (False, True), (True, True)]
    sr.close()


def test_pair_all_collapses(tmp_path):
    a = tmp_path / "a.vcf"
    b = tmp_path / "b.vcf"
    hdr = ("##fileformat=VCFv4.2\n##contig=<ID=1>\n"
           "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
    a.write_text(hdr + "1\t100\t.\tC\tT\t.\t.\t.\n")
    b.write_text(hdr + "1\t100\t.\tC\tG\t.\t.\t.\n")
    sr = SyncedReader(pair=BCF_SR_PAIR_ALL)
    sr.add_reader(str(a))
    sr.add_reader(str(b))
    assert sr.next_line() == 2
    assert sr.next_line() == 0
    sr.close()


def test_region_filter(tmp_path):
    a = tmp_path / "a.vcf"
    hdr = ("##fileformat=VCFv4.2\n##contig=<ID=1>\n##contig=<ID=2>\n"
           "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
    a.write_text(hdr + "1\t100\t.\tC\tT\t.\t.\t.\n1\t300\t.\tC\tA\t.\t.\t.\n"
                 "2\t50\t.\tG\tC\t.\t.\t.\n")
    sr = SyncedReader(regions=["1:200-400", "2"])
    sr.add_reader(str(a))
    got = []
    while sr.next_line() > 0:
        rec = sr.get_line(0)
        got.append((sr.get_header(0).rid2name(rec.rid), rec.pos + 1))
    assert got == [("1", 300), ("2", 50)]
    sr.close()
