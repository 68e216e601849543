"""FASTQ/FASTA tests vs reference test/fastq/*.sam and *.fq goldens."""
import os

import pytest

from htslib_tpu.sam import SamReader
from htslib_tpu.sam.fastq import FastqState, FastxReader, fastq_format1
from tests.conftest import REF_TEST

FQ_DIR = os.path.join(REF_TEST, "fastq")

# (input, golden sam, state kwargs) from fastq/fastq.tst
READ_CASES = [
    ("minimal.fq", "minimal.sam", {}),
    ("minimal.fa", "minimal-q.sam", {}),
    ("multiline.fq", "multiline.sam", {}),
    ("multiline.fa", "multiline-q.sam", {}),
    ("longline.fq", "longline.sam", {"aux": True}),
    ("single.fq", "single_noaux.sam", {}),
    ("single.fa", "single_noaux-q.sam", {}),
    ("single.fq", "single_aux.sam", {"aux": True}),
    ("single.fa", "single_aux-q.sam", {"aux": True}),
    ("interleaved.fq", "inter_noaux.sam", {}),
    ("interleaved.fa", "inter_noaux-q.sam", {}),
    ("interleaved.fq", "inter_aux.sam", {"aux": True}),
    ("interleaved.fa", "inter_aux-q.sam", {"aux": True}),
    ("interleaved_casava.fq", "inter_casava.sam", {"casava": True}),
    ("interleaved_casava.fq", "inter_casavaOX.sam",
     {"casava": True, "barcode": "OX"}),
    ("interleaved_casava.fa", "inter_casava-q.sam", {"casava": True}),
    ("interleaved_casava.fa", "inter_casavaOX-q.sam",
     {"casava": True, "barcode": "OX"}),
    ("filter_casava.fq", "filter_casava.sam", {"casava": True}),
    ("filter_casava.fa", "filter_casava-q.sam", {"casava": True}),
    ("r1.fq", "r1.sam", {"aux": True}),
    ("r2.fq", "r2.sam", {"aux": True}),
    ("r1.fa", "r1-q.sam", {"aux": True}),
    ("r2.fa", "r2-q.sam", {"aux": True}),
    ("name2.fq", "name2.sam", {"name2": True}),
    ("name2.fa", "name2-q.sam", {"name2": True}),
    ("UMI.fq", "UMI.sam", {"umi": "1"}),
]

WRITE_CASES = [
    ("minimal.sam", "minimal.fq", False, {}),
    ("inter_aux.sam", "interleaved.fq", False,
     {"aux": True, "rnum": True}),
    ("inter_aux.sam", "interleaved.fa", True,
     {"aux": True, "rnum": True}),
    ("inter_casava.sam", "interleaved_casava.fq", False, {"casava": True}),
    ("inter_casavaOX.sam", "interleaved_casava.fq", False,
     {"casava": True, "barcode": "OX"}),
    ("filter_casava.sam", "filter_casava.fq", False, {"casava": True}),
    ("r1.sam", "r1.fq", False, {"aux": True, "rnum": True}),
    ("r2.sam", "r2.fq", False, {"aux": True, "rnum": True}),
    ("UMI.sam", "UMI.fq", False, {"rnum": True, "umi": "1"}),
]


@pytest.mark.parametrize("fin,golden,kwargs", READ_CASES)
def test_fastx_to_sam(fin, golden, kwargs):
    if not os.path.exists(os.path.join(FQ_DIR, fin)):
        pytest.skip("missing")
    fasta = fin.endswith(".fa")
    state = FastqState(fasta=fasta, **kwargs)
    with FastxReader(os.path.join(FQ_DIR, fin), fasta=fasta, state=state) as r:
        got = [rec.to_sam(r.header) for rec in r]
    want = [l for l in open(os.path.join(FQ_DIR, golden)).read()
            .rstrip("\n").split("\n") if l and not l.startswith("@")]
    assert got == want, f"fastq parse mismatch {fin} -> {golden}"


@pytest.mark.parametrize("fin,golden,fasta,kwargs", WRITE_CASES)
def test_sam_to_fastx(fin, golden, fasta, kwargs):
    if not os.path.exists(os.path.join(FQ_DIR, fin)):
        pytest.skip("missing")
    state = FastqState(fasta=fasta, **kwargs)
    out = []
    with SamReader(os.path.join(FQ_DIR, fin)) as r:
        for rec in r:
            out.append(fastq_format1(state, rec))
    got = "".join(out)
    want = open(os.path.join(FQ_DIR, golden)).read()
    if fasta:
        # goldens ending .fa: compare seq lines only (no qual)
        want = "".join(l + "\n" for i, l in enumerate(want.split("\n")) if l)
    assert got == want, f"fastq write mismatch {fin} -> {golden}"
