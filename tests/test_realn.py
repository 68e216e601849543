"""BAQ tests — byte-exact vs reference test/realn0*_exp*.sam goldens
(driver replicates test/test_realn.c + test.pl:1475-1494)."""
import os

import pytest

from htslib_tpu.faidx import Faidx
from htslib_tpu.realn import BAQ_APPLY, BAQ_EXTEND, BAQ_REDO, sam_prob_realn
from htslib_tpu.sam import SamReader
from tests.conftest import ref_path, has_ref


def run_realn(sam, fa, flags):
    fai = Faidx.load(ref_path(fa), build_missing=False)
    out = []
    with SamReader(ref_path(sam)) as r:
        out.append(r.header.full_text_with_refs())
        refs = {}
        for rec in r:
            if rec.tid >= 0:
                name = r.header.tid2name(rec.tid)
                if name not in refs:
                    refs[name] = fai.fetch_seq(name)
                res = sam_prob_realn(rec, refs[name], flags)
                if res <= -4:
                    raise IOError("sam_prob_realn failed")
            out.append(rec.to_sam(r.header) + "\n")
    fai.close()
    return "".join(out)


CASES = [
    ("realn01.sam", "realn01.fa", 0, "realn01_exp.sam"),
    ("realn02.sam", "realn02.fa", 0, "realn02_exp.sam"),
    ("realn01.sam", "realn01.fa", BAQ_APPLY, "realn01_exp-a.sam"),
    ("realn02.sam", "realn02.fa", BAQ_APPLY, "realn02_exp-a.sam"),
    ("realn01.sam", "realn01.fa", BAQ_EXTEND, "realn01_exp-e.sam"),
    ("realn02.sam", "realn02.fa", BAQ_EXTEND, "realn02_exp-e.sam"),
    ("realn02-r.sam", "realn02.fa", BAQ_REDO, "realn02_exp.sam"),
    ("realn02_exp.sam", "realn02.fa", BAQ_APPLY, "realn02_exp-a.sam"),
    ("realn02_exp-a.sam", "realn02.fa", 0, "realn02_exp.sam"),
]


@pytest.mark.parametrize("sam,fa,flags,want", CASES)
def test_realn_goldens(sam, fa, flags, want):
    if not has_ref(sam):
        pytest.skip("missing")
    got = run_realn(sam, fa, flags)
    expect = open(ref_path(want)).read()
    assert got == expect, f"realn mismatch: {sam} flags={flags}"


@pytest.mark.skipif(not has_ref("realn03.sam"), reason="missing")
def test_realn_multi_match_same_as_single():
    # test.pl:1494+: 50M50M == 100M treatment
    got = run_realn("realn03.sam", "realn03.fa", BAQ_EXTEND)
    expect = open(ref_path("realn03_exp.sam")).read()
    assert got == expect
