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


def test_probaln_batch_matches_scalar():
    """The device batch kernel (ops.probaln.probaln_batch) must reproduce
    probaln_glocal bit-for-bit under float64: Pr, MAP states and BAQ
    quality bytes (probaln.c:77)."""
    from tests.conftest import clean_jax_run
    out = clean_jax_run(r'''
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)
from htslib_tpu.realn import probaln_glocal, ProbalnParams
from htslib_tpu.ops.probaln import probaln_batch_host

rng = np.random.default_rng(7)
refs, qrys, quals, want = [], [], [], []
for t in range(32):
    lr = int(rng.integers(4, 80))
    lq = int(rng.integers(3, 70))
    ref = rng.integers(0, 5, lr, dtype=np.uint8)
    q = (ref[:lq].copy() if lr >= lq else
         np.concatenate([ref, rng.integers(0, 4, lq - lr, dtype=np.uint8)]))
    mut = rng.random(lq) < 0.2
    q[mut] = rng.integers(0, 4, mut.sum())
    iq = rng.integers(3, 45, lq, dtype=np.uint8)
    refs.append(ref.tobytes()); qrys.append(q.tobytes())
    quals.append(iq.tobytes())
    want.append(probaln_glocal(ref.tobytes(), q.tobytes(), iq.tobytes(),
                               ProbalnParams(0.001, 0.1, 10), want_map=True))
got = probaln_batch_host(refs, qrys, quals, bw_param=10)
for w, g in zip(want, got):
    assert w[0] == g[0], (w[0], g[0])
    assert list(w[1]) == list(g[1])
    assert w[2] == g[2]
print("PROBALN_BATCH_OK")
''')
    assert "PROBALN_BATCH_OK" in out


@pytest.mark.skipif(not has_ref("realn01.sam"), reason="missing")
def test_sam_prob_realn_batch_matches_scalar():
    """sam_prob_realn_batch (device-batched BAQ) must produce exactly the
    records the per-read sam_prob_realn path produces."""
    from tests.conftest import clean_jax_run
    out = clean_jax_run(r'''
import jax
jax.config.update("jax_enable_x64", True)
from htslib_tpu.sam import SamReader
from htslib_tpu.faidx import Faidx
from htslib_tpu.realn import (BAQ_APPLY, BAQ_EXTEND, sam_prob_realn,
                              sam_prob_realn_batch)
from tests.conftest import REF_TEST
import os

for flags in (0, BAQ_APPLY, BAQ_EXTEND, BAQ_APPLY | BAQ_EXTEND):
    for sam, fa in (("realn01.sam", "realn01.fa"),
                    ("realn02.sam", "realn02.fa")):
        fai = Faidx.load(os.path.join(REF_TEST, fa))
        with SamReader(os.path.join(REF_TEST, sam)) as r:
            hdr = r.header
            recs_a = list(r)
        with SamReader(os.path.join(REF_TEST, sam)) as r:
            recs_b = list(r)
        codes_a = []
        for rec in recs_a:
            ref = fai.fetch_seq(hdr.tid2name(rec.tid)) if rec.tid >= 0 else ""
            codes_a.append(sam_prob_realn(rec, ref, flags))
        refname = hdr.tid2name(recs_b[0].tid)
        codes_b = sam_prob_realn_batch(recs_b, fai.fetch_seq(refname), flags)
        assert codes_a == codes_b, (sam, flags)
        got = [rec.to_sam(hdr) for rec in recs_b]
        want = [rec.to_sam(hdr) for rec in recs_a]
        assert got == want, (sam, flags)
print("REALN_BATCH_OK")
''')
    assert "REALN_BATCH_OK" in out
