"""Port of the reference's test-vcf-api.c driver: construct the header
and records entirely through the update API (duplicate updates, string
reallocation, header-line remove/re-append), write BCF, run the
bcf_to_vcf transformation leg, and compare the full output stream
against test-vcf-api.out byte for byte.  The same constructed BCF then
feeds the test-vcf-sweep.c checksum golden (1125066 both directions).
"""
import numpy as np
import pytest

from htslib_tpu.vcf import BcfHeader, BcfReader, BcfRecord, BcfWriter
from htslib_tpu.vcf.record import (GT_MISSING, INT32_MISSING,
                                   INT32_VECTOR_END, gt_phased, gt_unphased)
from tests.conftest import has_ref, ref_path

HDR_LINES = [
    "##fileDate=20090805",
    '##FORMAT=<ID=UF,Number=1,Type=Integer,Description="Unused FORMAT">',
    '##INFO=<ID=UI,Number=1,Type=Integer,Description="Unused INFO">',
    '##FILTER=<ID=Flt,Description="Unused FILTER">',
    '##unused=<XX=AA,Description="Unused generic">',
    '##unused=<ID=BB,Description="Unused generic with ID">',
    "##unused=unformatted text 1",
    "##unused=unformatted text 2",
    "##contig=<ID=Unused,length=1>",
    "##source=myImputationProgramV3.1",
    "##reference=file:///seq/references/1000GenomesPilot-NCBI36.fasta",
    "##contig=<ID=20,length=62435964,assembly=B36,"
    'md5=f126cdf8a6e0c7f379d618ff66beb2da,species="Homo sapiens",'
    "taxonomy=x>",
    "##phasing=partial",
    '##INFO=<ID=NS,Number=1,Type=Integer,Description="Number of Samples'
    ' With Data">',
    '##INFO=<ID=DP,Number=1,Type=Integer,Description="Total Depth">',
    '##INFO=<ID=NEG,Number=.,Type=Integer,Description="Test -ve Numbers">',
    '##INFO=<ID=AF,Number=A,Type=Float,Description="Allele Frequency">',
    '##INFO=<ID=AA,Number=1,Type=String,Description="Ancestral Allele">',
    '##INFO=<ID=DB,Number=0,Type=Flag,Description="dbSNP membership,'
    ' build 129">',
    '##INFO=<ID=H2,Number=0,Type=Flag,Description="HapMap2 membership">',
    '##FILTER=<ID=q10,Description="Quality below 10">',
    '##FILTER=<ID=s50,Description="Less than half of samples have data">',
    '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
    '##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="Genotype Quality">',
    '##FORMAT=<ID=DP,Number=1,Type=Integer,Description="Read Depth">',
    '##FORMAT=<ID=HQ,Number=2,Type=Integer,Description="Haplotype'
    ' Quality">',
    '##FORMAT=<ID=TS,Number=1,Type=String,Description="Test String 1">',
]


def _write_api_bcf(path):
    """write_bcf (test-vcf-api.c:110-285) through our update API."""
    hdr = BcfHeader()
    for line in HDR_LINES:
        hdr.append_line(line)
    # remove + re-append quartet (test-vcf-api.c:154-161): the
    # dictionary ids must survive the line reordering (IDX= in BCF)
    hdr.remove_hrec("contig", "Unused")
    hdr.append_line("##contig=<ID=Unused,length=62435964>")
    hdr.remove_hrec("FORMAT", "TS")
    hdr.append_line('##FORMAT=<ID=TS,Number=1,Type=String,'
                    'Description="Test String">')
    hdr.remove_hrec("INFO", "NEG")
    hdr.append_line('##INFO=<ID=NEG,Number=.,Type=Integer,'
                    'Description="Test Negative Numbers">')
    hdr.remove_hrec("FILTER", "s50")
    hdr.append_line('##FILTER=<ID=s50,Description="Less than 50% of'
                    ' samples have data">')
    hdr.samples = ["NA00001", "NA00002", "NA00003"]

    rec = BcfRecord()
    rec.n_sample = 3
    rec.rid = hdr.ctg_names.index("20")
    rec.pos = 14369
    rec.update_id("rs6054257")
    rec.update_alleles_str(hdr, "G,A")
    rec.qual = 29
    rec.update_filter(hdr, [hdr.id2int("PASS")])
    rec.update_info(hdr, "NS", [3])
    rec.update_info(hdr, "DP", [500])        # updated twice more below
    rec.update_info(hdr, "DP", [100000])
    rec.update_info(hdr, "DP", [14])
    rec.update_info(hdr, "NEG", [-127])
    rec.update_info(hdr, "AF", [0.5])
    rec.update_info(hdr, "DB", True)
    rec.update_info(hdr, "H2", True)
    rec.update_genotypes(hdr, [[gt_phased(0), gt_phased(0)],
                               [gt_phased(1), gt_phased(0)],
                               [gt_unphased(1), gt_unphased(1)]])
    rec.update_format(hdr, "GQ", np.array([[48], [48], [43]], np.int32))
    rec.update_format(hdr, "DP", np.array([[0], [0], [1]], np.int32))
    rec.update_format(hdr, "DP", np.array([[1], [100000], [1]], np.int32))
    rec.update_format(hdr, "DP", np.array([[1], [8], [5]], np.int32))
    rec.update_format(hdr, "HQ",
                      np.array([[51, 51], [51, 51],
                                [INT32_MISSING, INT32_MISSING]], np.int32))
    rec.update_format_string(hdr, "TS", ["String1", "SomeOtherString2",
                                         "YetAnotherString3"])
    rec.update_format_string(hdr, "TS",
                             ["LongerStringRequiringBufferReallocation",
                              "SomeOtherString2", "YetAnotherString3"])
    rec.update_format_string(hdr, "TS", ["String1", "SomeOtherString2",
                                         "YetAnotherString3"])

    rec2 = BcfRecord()
    rec2.n_sample = 3
    rec2.rid = hdr.ctg_names.index("20")
    rec2.pos = 1110695
    rec2.update_alleles_str(hdr, "A,G,T")
    rec2.qual = 67
    rec2.update_info(hdr, "NS", [2])
    rec2.update_info(hdr, "DP", [10])
    rec2.update_info(hdr, "NEG", [-128])
    rec2.update_info(hdr, "AF", [0.333, None])   # None -> missing float
    rec2.update_info(hdr, "AA", "SHORT")
    rec2.update_info(hdr, "AA", "LONGSTRING")
    rec2.update_info(hdr, "AA", "T")
    rec2.update_info(hdr, "DB", True)
    rec2.update_genotypes(hdr, [[gt_phased(2), INT32_VECTOR_END],
                                [gt_phased(1), INT32_VECTOR_END],
                                [GT_MISSING, GT_MISSING]])

    with BcfWriter(path, hdr) as w:
        w.write(rec)
        w.write(rec2)


@pytest.mark.skipif(not has_ref("test-vcf-api.out"), reason="no corpus")
def test_vcf_api_golden(tmp_path):
    bcf = str(tmp_path / "api.bcf")
    _write_api_bcf(bcf)

    # bcf_to_vcf leg (test-vcf-api.c:287-404): header-line removals by
    # type (generic vs structured 'unused'), per-record edits between
    # three writes of each record
    with BcfReader(bcf) as r:
        hdr_in = r.header
        recs = list(r)
    hdr_out = hdr_in.copy()
    assert hdr_out.has_hrec("unused", "BB")
    hdr_out.remove_hrec("unused", "BB", structured=True)
    assert not hdr_out.has_hrec("unused", "BB")
    hdr_out.remove_hrec("unused", None, structured=False)
    hdr_out.remove_hrec("FILTER", "Flt")
    hdr_out.remove_hrec("INFO", "UI")
    hdr_out.remove_hrec("FORMAT", "UF")
    hdr_out.remove_hrec("contig", "Unused")

    lines = []
    for rc in recs:
        lines.append(rc.to_vcf(hdr_out))
        rc.update_id(None)
        rc.update_format(hdr_in, "GQ", None)
        lines.append(rc.to_vcf(hdr_out))      # the bcf_dup write
        rc.update_alleles_str(hdr_out, "G,A")
        rc.update_info(hdr_out, "DP", [99])
        rc.update_format(hdr_out, "DP", np.array([[9], [9], [9]], np.int32))
        lines.append(rc.to_vcf(hdr_out))

    got = hdr_out.text() + "".join(line + "\n" for line in lines)
    assert got == open(ref_path("test-vcf-api.out")).read()


@pytest.mark.skipif(not has_ref("test-vcf-sweep.out"), reason="no corpus")
def test_vcf_sweep_golden(tmp_path):
    """test-vcf-sweep.c checksums over the API-constructed BCF:
    fwd == bwd == 1125066 (sum of 1-based positions)."""
    from htslib_tpu.vcf_sweep import VcfSweep

    bcf = str(tmp_path / "api.bcf")
    _write_api_bcf(bcf)
    sw = VcfSweep(bcf)
    fwd = 0
    while True:
        r = sw.fwd()
        if r is None:
            break
        fwd += r.pos + 1
    bwd = 0
    while True:
        r = sw.bwd()
        if r is None:
            break
        bwd += r.pos + 1
    sw.close()
    assert fwd == bwd == 1125066
