"""Pileup tests — byte-exact vs reference test/mpileup/*.out goldens
(driver replicates test/pileup.c's output format)."""
import glob
import os

import pytest

from htslib_tpu.pileup import MultiPileup, Pileup, plp_insertion
from htslib_tpu.sam import SamReader
from htslib_tpu.sam.record import (FDUP, FQCFAIL, FSECONDARY, FUNMAP)
from tests.conftest import REF_TEST

MP_DIR = os.path.join(REF_TEST, "mpileup")

CASES = sorted(
    os.path.basename(p)[:-4] for p in glob.glob(os.path.join(MP_DIR, "*.sam"))
    if os.path.exists(p[:-4] + ".out")
) if os.path.isdir(MP_DIR) else []


def read_filtered(path):
    """readaln (test/pileup.c:62): skip unmapped/secondary/qcfail/dup."""
    reader = SamReader(path)

    def func():
        while True:
            rec = reader.read1()
            if rec is None:
                return None
            if rec.flag & (FUNMAP | FSECONDARY | FQCFAIL | FDUP):
                continue
            return rec
    return reader, func


def format_column(header, tid, pos, plp):
    """test/pileup.c:76-133 output format."""
    out = [header.tid2name(tid), str(pos + 1), str(len(plp))]
    seq_parts = []
    for p in plp:
        is_rev = bool(p.b.flag & 0x10)
        if p.is_head:
            seq_parts.append("^" + chr(ord("!") + min(p.b.mapq, 93)))
        if p.is_del:
            seq_parts.append(("<" if is_rev else ">") if p.is_refskip else "*")
        else:
            c = p.b.seq[p.qpos]
            seq_parts.append(c.lower() if is_rev else c.upper())
        ins, del_len = plp_insertion(p)
        if p.indel > 0:
            seq_parts.append(f"+{len(ins)}(" +
                             (ins.lower() if is_rev else ins.upper()) + ")")
        else:
            del_len = -p.indel
        if del_len > 0:
            seq_parts.append(f"-{del_len}()")
        if p.is_tail:
            seq_parts.append("$")
    quals = []
    for p in plp:
        q = "~"
        if p.qpos < p.b.l_qseq and p.b.qual[p.qpos] + 33 < ord("~"):
            q = chr(p.b.qual[p.qpos] + 33)
        quals.append(q)
    return "\t".join(["\t".join(out[:3]), "".join(seq_parts), "".join(quals)])


def run_pileup(path, use_mplp=False):
    reader, func = read_filtered(path)
    lines = []
    if use_mplp:
        mp = MultiPileup([func], overlaps=True)
        while True:
            col = mp.auto()
            if col is None:
                break
            tid, pos, plps = col
            if tid < 0:
                break
            plp = plps[0] or []
            lines.append(format_column(reader.header, tid, pos, plp))
    else:
        it = Pileup(func)
        for tid, pos, plp in it:
            if tid < 0:
                break
            lines.append(format_column(reader.header, tid, pos, plp))
    reader.close()
    return "\n".join(lines) + ("\n" if lines else "")


@pytest.mark.parametrize("case", CASES or ["skip"])
def test_pileup_goldens(case):
    if case == "skip":
        pytest.skip("no corpus")
    if case.startswith("mp_overlap"):
        # mpileup.tst runs the overlap files only with -m
        pytest.skip("overlap cases are -m only")
    got = run_pileup(os.path.join(MP_DIR, case + ".sam"))
    want = open(os.path.join(MP_DIR, case + ".out")).read()
    assert got == want, f"pileup mismatch for {case}"


@pytest.mark.parametrize("case", CASES or ["skip"])
def test_mpileup_goldens_with_overlaps(case):
    # the -m variant (bam_mplp + init_overlaps); same goldens
    if case == "skip":
        pytest.skip("no corpus")
    got = run_pileup(os.path.join(MP_DIR, case + ".sam"), use_mplp=True)
    want = open(os.path.join(MP_DIR, case + ".out")).read()
    assert got == want, f"mpileup mismatch for {case}"


def test_device_pileup_matches_host_engine():
    """The device pileup tile (ops.pileup_kernel.device_pileup_counts)
    must agree position-by-position with the streaming host engine
    (bam_plp columns) on the reference mpileup corpus."""
    import glob as _glob
    from tests.conftest import clean_jax_run
    sams = sorted(_glob.glob(os.path.join(REF_TEST, "mpileup", "mp_*.sam")))
    if not sams:
        pytest.skip("no corpus")
    out = clean_jax_run(r'''
import glob, os
import numpy as np
from htslib_tpu.sam import SamReader
from htslib_tpu.pileup import Pileup
from htslib_tpu.ops.pileup_kernel import device_pileup_counts
from tests.conftest import REF_TEST

SEQ_NT16 = "=ACMGRSVTWYHKDBN"
checked = 0
for sam in sorted(glob.glob(os.path.join(REF_TEST, "mpileup", "mp_*.sam"))):
    with SamReader(sam) as r:
        hdr = r.header
        recs = [b for b in r if not (b.flag & 4) and b.tid == 0]
    if not recs:
        continue
    # host engine columns
    it = iter(recs + [None])
    plp = Pileup(lambda: next(it))
    host_depth = {}
    host_counts = {}
    while True:
        col = plp.auto()
        if col is None:
            break
        tid, pos, reads = col
        host_depth[pos] = len(reads)
        c = np.zeros(16, np.int32)
        for p in reads:
            if p.is_del or p.is_refskip:
                continue
            seq4 = np.frombuffer(p.b.seq4, np.uint8)
            nib = (seq4[p.qpos // 2] >> 4) if p.qpos % 2 == 0 \
                else (seq4[p.qpos // 2] & 0xF)
            c[nib] += 1
        host_counts[pos] = c
    lo = min(host_depth)
    hi = max(host_depth) + 1
    depth, counts = device_pileup_counts(recs, lo, hi - lo)
    for pos in range(lo, hi):
        want_d = host_depth.get(pos, 0)
        assert depth[pos - lo] == want_d, (sam, pos, int(depth[pos - lo]), want_d)
        want_c = host_counts.get(pos, np.zeros(16, np.int32))
        assert np.array_equal(counts[pos - lo], want_c), (sam, pos)
    checked += 1
assert checked >= 5
print("DEVICE_PILEUP_OK", checked)
''')
    assert "DEVICE_PILEUP_OK" in out


def test_native_mpileup_matches_goldens():
    """The native engine (htstpu_mpileup: resolve_cigar2 + overlap
    tweak + test/pileup.c formatter in C++) must reproduce every
    reference golden byte-for-byte."""
    from htslib_tpu.native import native
    from htslib_tpu.pileup import mpileup_text
    if native is None:
        pytest.skip("native library unavailable")
    if not CASES:
        pytest.skip("no corpus")
    for case in CASES:
        hdr, got = mpileup_text(os.path.join(MP_DIR, case + ".sam"))
        want = open(os.path.join(MP_DIR, case + ".out"), "rb").read()
        assert got == want, f"native mpileup mismatch for {case}"


def test_native_mpileup_matches_python_engine(tmp_path):
    """Differential: native vs the Python engine on a dense synthetic
    paired file (overlap tweaks at every depth)."""
    from htslib_tpu.native import native
    from htslib_tpu.pileup import mpileup_text
    if native is None:
        pytest.skip("native library unavailable")
    from tests.test_distributed import _synth_paired_sam
    sam = str(tmp_path / "dense.sam")
    _synth_paired_sam(sam, n_pairs=200, seed=11)
    hdr, got = mpileup_text(sam)
    want = run_pileup(sam, use_mplp=True).encode()
    assert got == want


def test_mpileup_parallel_byte_exact(tmp_path):
    """Coordinate-sharded parallel mpileup (native engine per tile,
    emission windows, halo replication) == the serial engine, byte for
    byte, on every reference mpileup file and a deep synthetic pile."""
    import glob

    from htslib_tpu.pileup import mpileup_text, mpileup_text_parallel
    n = 0
    for f in sorted(glob.glob(os.path.join(REF_TEST, "mpileup",
                                           "*.sam"))):
        _, want = mpileup_text(f)
        for nt in (2, 3):
            _, got = mpileup_text_parallel(f, nthreads=nt)
            assert got == want, (f, nt)
        n += 1
    assert n >= 10


def test_mpileup_parallel_multicontig_ragged(tmp_path):
    """Parallel mpileup across contig boundaries with indel-heavy
    CIGARs: tiles that split mid-contig and across contigs must stay
    byte-exact at every shard count."""
    import numpy as np

    from htslib_tpu.pileup import mpileup_text, mpileup_text_parallel
    rng = np.random.default_rng(17)
    path = str(tmp_path / "mc.sam")
    with open(path, "w") as f:
        f.write("@HD\tVN:1.6\tSO:coordinate\n")
        for c in range(5):
            f.write(f"@SQ\tSN:ctg{c}\tLN:1000000\n")
        i = 0
        for c in range(5):
            n = int(rng.integers(50, 400))
            pos = np.sort(rng.integers(1, 5000, n))
            for p in pos:
                L = int(rng.integers(20, 120))
                r = rng.random()
                if r < 0.3:
                    a = int(rng.integers(1, L))
                    ins = int(rng.integers(1, 5))
                    cig, qlen = f"{a}M{ins}I{L - a}M", L + ins
                elif r < 0.5:
                    a = int(rng.integers(1, L))
                    d = int(rng.integers(1, 9))
                    cig, qlen = f"{a}M{d}D{L - a}M", L
                else:
                    cig, qlen = f"{L}M", L
                seq = "".join(rng.choice(list("ACGT"), qlen))
                qual = "".join(chr(33 + int(q))
                               for q in rng.integers(5, 40, qlen))
                f.write(f"r{i}\t0\tctg{c}\t{p}\t60\t{cig}\t*\t0\t0\t"
                        f"{seq}\t{qual}\n")
                i += 1
    _, want = mpileup_text(path)
    for nt in (2, 3, 5, 8):
        _, got = mpileup_text_parallel(path, nthreads=nt)
        assert got == want, nt
