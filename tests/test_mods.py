"""Base-modification tests — byte-exact vs reference test/base_mods/*.out
(driver replicates test/test_mod.c)."""
import glob
import os

import pytest

from htslib_tpu.sam import SamReader
from htslib_tpu.sam.mods import (BaseModState, HTS_MOD_REPORT_UNCHECKED,
                                 HTS_MOD_UNCHECKED, HTS_MOD_UNKNOWN)
from tests.conftest import REF_TEST

BM_DIR = os.path.join(REF_TEST, "base_mods")


def _code(v):
    return chr(v) if v > 0 else f"({-v})"


def _qstr(q):
    if q == HTS_MOD_UNCHECKED:
        return "#"
    if q == HTS_MOD_UNKNOWN:
        return "."
    return str(q)


def run_test_mod(path, extended=False, flags=0):
    out = []
    with SamReader(path) as r:
        for b in r:
            st = BaseModState()
            if st.parse(b, flags) < 0:
                raise IOError("Failed to parse MM/ML aux tags")
            seq = b.seq
            for i in range(b.l_qseq):
                mods = st.at_next_pos(b, 5)
                line = f"{i}\t{seq[i]}"
                sp = "\t"
                for m in mods[:5]:
                    if extended:
                        q = st.query_type(m.modified_base)
                        assert q is not None
                        strand, implicit, canonical = q
                        assert canonical == m.canonical_base
                        assert strand == m.strand
                        line += (f"{sp}{m.canonical_base}{'+-'[m.strand]}"
                                 f"{_code(m.modified_base)}{'?.'[implicit]}"
                                 f"{_qstr(m.qual)}")
                    else:
                        line += (f"{sp}{m.canonical_base}{'+-'[m.strand]}"
                                 f"{_code(m.modified_base)}{_qstr(m.qual)}")
                    sp = " "
                out.append(line)
            out.append("---")
            st = BaseModState()
            st.parse(b, flags)
            pres = "Present:"
            for i, code in enumerate(st.recorded()):
                strand, implicit, canonical = st.queryi(i)
                pres += (f" {chr(code)}" if code > 0 else f" #{code}")
                pres += "?."[implicit]
            out.append(pres)
            while True:
                mods, pos = st.next_basemod(b, 5)
                if not mods:
                    break
                line = f"{pos}\t{seq[pos]}"
                sp = "\t"
                for m in mods[:5]:
                    line += (f"{sp}{m.canonical_base}{'+-'[m.strand]}"
                             f"{_code(m.modified_base)}{_qstr(m.qual)}")
                    sp = " "
                out.append(line)
            out.append("\n===\n")
    return "\n".join(out) + "\n"


# base-mods.tst: which goldens use which driver and flags
TEST_MOD_CASES = ["MM-chebi", "MM-double", "MM-multi", "MM-explicit",
                  "MM-not-all-modded"]


@pytest.mark.parametrize("case", TEST_MOD_CASES)
def test_base_mods_goldens(case):
    if not os.path.exists(os.path.join(BM_DIR, case + ".sam")):
        pytest.skip("no corpus")
    got = run_test_mod(os.path.join(BM_DIR, case + ".sam"))
    want = open(os.path.join(BM_DIR, case + ".out")).read()
    assert got == want, f"base mods mismatch for {case}"


@pytest.mark.skipif(not os.path.isdir(BM_DIR), reason="no corpus")
def test_base_mods_variants_f1():
    # base-mods.tst: $test_mod -f 1 MM-variants.sam
    got = run_test_mod(os.path.join(BM_DIR, "MM-variants.sam"),
                       flags=HTS_MOD_REPORT_UNCHECKED)
    want = open(os.path.join(BM_DIR, "MM-variants.out")).read()
    assert got == want


def run_pileup_mod(path):
    """Replicates test/pileup_mod.c process_mod_pileup1."""
    from htslib_tpu.pileup import Pileup
    from htslib_tpu.sam.mods import BaseModState
    reader = SamReader(path)
    states = {}

    def getstate(b):
        st = states.get(id(b))
        if st is None:
            st = BaseModState()
            if st.parse(b) < 0:
                raise IOError("bad MM/ML")
            states[id(b)] = st
        return st

    out = []
    it = Pileup(reader.read1)
    for tid, pos, plp in it:
        line = f"{reader.header.tid2name(tid)}\t{pos}\t"
        quals = []
        for p in plp:
            if p.is_del:
                line += "*"
                continue
            c = p.b.seq[p.qpos]
            line += c
            quals.append(chr(min(ord("~"), 33 + p.b.qual[p.qpos])))
            st = getstate(p.b)
            mods = []
            while st.seq_pos <= p.qpos:
                mods = st.at_next_pos(p.b, 5)
            if mods:
                line += "[" + "".join(
                    (f"{'+-'[m.strand]}({-m.modified_base}){m.qual}"
                     if m.modified_base < 0 else
                     f"{'+-'[m.strand]}{chr(m.modified_base)}{m.qual}")
                    for m in mods[:5]) + "]"
        line += "\t" + "".join(quals)
        out.append(line)
    reader.close()
    return "\n".join(out) + "\n"


@pytest.mark.parametrize("sam,out", [("MM-pileup.sam", "MM-pileup.out"),
                                     ("MM-pileup2.sam", "MM-pileup2.out"),
                                     ("MM-MNp.sam", "MM-pileup.out")])
def test_pileup_mod_goldens(sam, out):
    if not os.path.exists(os.path.join(BM_DIR, sam)):
        pytest.skip("no corpus")
    got = run_pileup_mod(os.path.join(BM_DIR, sam))
    want = open(os.path.join(BM_DIR, out)).read()
    assert got == want


@pytest.mark.parametrize("sam", ["MM-MNf1.sam", "MM-MNf2.sam"])
def test_bad_mn_rejected(sam):
    # base-mods.tst N-cases: MN mismatch must error
    if not os.path.exists(os.path.join(BM_DIR, sam)):
        pytest.skip("no corpus")
    with pytest.raises(IOError):
        run_pileup_mod(os.path.join(BM_DIR, sam))


@pytest.mark.skipif(not os.path.exists(os.path.join(BM_DIR, "MM-explicit-x.out")),
                    reason="no corpus")
def test_base_mods_extended():
    got = run_test_mod(os.path.join(BM_DIR, "MM-explicit.sam"), extended=True)
    want = open(os.path.join(BM_DIR, "MM-explicit-x.out")).read()
    assert got == want


@pytest.mark.skipif(not os.path.exists(os.path.join(BM_DIR, "MM-explicit-f.out")),
                    reason="no corpus")
def test_base_mods_report_unchecked():
    got = run_test_mod(os.path.join(BM_DIR, "MM-explicit.sam"),
                       flags=HTS_MOD_REPORT_UNCHECKED)
    want = open(os.path.join(BM_DIR, "MM-explicit-f.out")).read()
    assert got == want
