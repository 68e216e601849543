"""Multi-host sharding gate (SURVEY §7 stage 9): record-aligned shard
plans over BGZF block ranges must reproduce the single-host output
byte-exactly when concatenated in shard order."""
import numpy as np
import pytest

from htslib_tpu.parallel.distributed import (decode_shard_to_sam,
                                             plan_bam_shards)
from htslib_tpu.sam import BamReader
from htslib_tpu.sam.batch import bam_stream_to_sam
from tests.conftest import has_ref, ref_path


@pytest.mark.parametrize("n_shards", [1, 2, 4, 7])
def test_shard_concat_equals_whole(n_shards):
    if not has_ref("range.bam"):
        pytest.skip("no corpus")
    path = ref_path("range.bam")
    with BamReader(path) as r:
        hdr = r.header
        whole = bam_stream_to_sam(r.fp.read_all(), hdr).tobytes()
    plan = plan_bam_shards(path, n_shards)
    assert sum(s.n_records for s in plan.shards) == 112
    parts = [decode_shard_to_sam(plan, s, hdr) for s in plan.shards]
    assert b"".join(parts) == whole
    # shards are disjoint and cover the record stream contiguously
    for a, b in zip(plan.shards, plan.shards[1:]):
        assert a.uend == b.ustart


def test_shards_balanced():
    if not has_ref("range.bam"):
        pytest.skip("no corpus")
    plan = plan_bam_shards(ref_path("range.bam"), 4)
    sizes = [s.uend - s.ustart for s in plan.shards]
    assert max(sizes) < 2 * min(sizes)


# ---------------------------------------------------------------------------
# coordinate-sharded exact mpileup (SURVEY §7 hard part #4)
# ---------------------------------------------------------------------------

import glob
import os
import random
import socket
import subprocess
import sys

from htslib_tpu.parallel.pileup_shard import (mpileup_one_tile,
                                              plan_pileup_tiles,
                                              sharded_mpileup, _load_records)
from tests.conftest import REF_TEST, REPO
from tests.test_pileup import format_column, run_pileup

MP_SAMS = sorted(glob.glob(os.path.join(REF_TEST, "mpileup", "*.sam")))


@pytest.mark.parametrize("n_shards", [2, 3, 5])
def test_sharded_mpileup_equals_single_engine(n_shards):
    """Concatenated tile outputs must equal the single-engine mpileup
    byte-for-byte — including the overlap-pair quality tweak across
    tile boundaries (reference sam.c:5803 semantics)."""
    if not MP_SAMS:
        pytest.skip("no corpus")
    for sam in MP_SAMS:
        want = run_pileup(sam, use_mplp=True)
        parts = sharded_mpileup(sam, n_shards, format_column)
        got = "\n".join(l for part in parts for l in part)
        got = got + "\n" if got else ""
        assert got == want, f"{os.path.basename(sam)} n={n_shards}"


def _synth_paired_sam(path, n_pairs=120, seed=7):
    """Dense overlapping mate pairs across a long contig so that any
    tile boundary cuts through many overlap pairs."""
    rng = random.Random(seed)
    lines = ["@HD\tVN:1.6\tSO:coordinate", "@SQ\tSN:c1\tLN:100000"]
    recs = []
    for i in range(n_pairs):
        pos = rng.randrange(1, 5000)
        gap = rng.randrange(0, 40)     # mate starts inside the read
        mpos = pos + gap
        seq = "".join(rng.choice("ACGT") for _ in range(60))
        mseq = "".join(rng.choice("ACGT") for _ in range(60))
        q1 = "".join(chr(33 + rng.randrange(0, 40)) for _ in range(60))
        q2 = "".join(chr(33 + rng.randrange(0, 40)) for _ in range(60))
        recs.append((pos, f"p{i}\t99\tc1\t{pos}\t60\t60M\t=\t{mpos}\t"
                     f"{mpos - pos + 60}\t{seq}\t{q1}"))
        recs.append((mpos, f"p{i}\t147\tc1\t{mpos}\t60\t60M\t=\t{pos}\t"
                     f"{pos - mpos - 60}\t{mseq}\t{q2}"))
    recs.sort()
    lines += [r[1] for r in recs]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_sharded_mpileup_dense_overlaps(tmp_path, n_shards):
    sam = str(tmp_path / "dense.sam")
    _synth_paired_sam(sam)
    want = run_pileup(sam, use_mplp=True)
    parts = sharded_mpileup(sam, n_shards, format_column)
    got = "\n".join(l for part in parts for l in part) + "\n"
    assert got == want


# ---------------------------------------------------------------------------
# real multi-process execution: 2 workers + jax.distributed coordinator
# ---------------------------------------------------------------------------

_WORKER = r'''
import sys
pid, nprocs, port, outdir, bam, sam = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
    sys.argv[5], sys.argv[6])
import jax
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nprocs, process_id=pid)
assert jax.process_count() == nprocs

# 1) shard-plan BAM decode: this process's shard only
from htslib_tpu.parallel.distributed import (decode_shard_to_sam,
                                             plan_bam_shards)
plan = plan_bam_shards(bam, nprocs)
blob = decode_shard_to_sam(plan, plan.shards[pid])
open(f"{outdir}/shard{pid}.sam", "wb").write(blob)

# 2) coordinate-sharded exact pileup: this process's tile only
from htslib_tpu.parallel.pileup_shard import (_load_records,
                                              mpileup_one_tile,
                                              plan_pileup_tiles)
from tests.test_pileup import format_column
_, records = _load_records(sam)
tiles = plan_pileup_tiles(records, nprocs)
cols = mpileup_one_tile(sam, tiles[pid], format_column)
open(f"{outdir}/tile{pid}.txt", "w").write("\n".join(cols))

# 3) a real cross-process collective through the coordinator
import numpy as np
from jax.experimental import multihost_utils
g = multihost_utils.process_allgather(
    np.array([len(blob), len(cols)], np.int64))
open(f"{outdir}/gather{pid}.txt", "w").write(
    ",".join(map(str, np.asarray(g).ravel().tolist())))
'''


def test_two_process_jax_distributed(tmp_path):
    """Two OS processes, a jax.distributed coordinator, CPU backend:
    each worker decodes its BAM shard and its pileup tile; the
    concatenated outputs must equal the single-process results, and a
    process_allgather must give both workers the same global view."""
    if not has_ref("range.bam"):
        pytest.skip("no corpus")
    bam = ref_path("range.bam")
    sam = str(tmp_path / "dense.sam")
    _synth_paired_sam(sam)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["PYTHONPATH"] = ":".join(
        [REPO] + [p for p in env.get("PYTHONPATH", "").split(":")
                  if p and ".axon_site" not in p])
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, str(pid), "2", str(port),
         str(tmp_path), bam, sam],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True) for pid in (0, 1)]
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"

    # shard decode equality
    with BamReader(bam) as r:
        whole = bam_stream_to_sam(r.fp.read_all(), r.header).tobytes()
    got = b"".join(open(str(tmp_path / f"shard{i}.sam"), "rb").read()
                   for i in (0, 1))
    assert got == whole

    # pileup tile equality
    want = run_pileup(sam, use_mplp=True)
    cols = []
    for i in (0, 1):
        t = open(str(tmp_path / f"tile{i}.txt")).read()
        if t:
            cols.append(t)
    assert "\n".join(cols) + "\n" == want

    # both workers saw the same allgathered view
    g0 = open(str(tmp_path / "gather0.txt")).read()
    g1 = open(str(tmp_path / "gather1.txt")).read()
    assert g0 == g1 and len(g0.split(",")) == 4


_WORKER2 = r'''
import sys
pid, nprocs, port, outdir, bam, cram, bcf = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4],
    sys.argv[5], sys.argv[6], sys.argv[7])
import jax
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nprocs, process_id=pid)
assert jax.process_count() == nprocs

# 1) CRAM container shard lane: this process's shard only
from htslib_tpu.parallel.distributed import (decode_cram_shard_to_sam,
                                             plan_cram_shards)
cplan = plan_cram_shards(cram, nprocs)
cblob = decode_cram_shard_to_sam(cplan, cplan.shards[pid])
open(f"{outdir}/cram{pid}.sam", "wb").write(cblob)

# 2) BCF record shard lane: this process's shard only
from htslib_tpu.parallel.distributed import (decode_bcf_shard_to_vcf,
                                             plan_bcf_shards)
bplan = plan_bcf_shards(bcf, nprocs)
bblob = decode_bcf_shard_to_vcf(bplan, bplan.shards[pid])
open(f"{outdir}/bcf{pid}.vcf", "wb").write(bblob)

# 3) flagstat: local shard counters + cross-process reduction
import numpy as np
from jax.experimental import multihost_utils
from htslib_tpu.parallel.distributed import (flagstat_shard,
                                             plan_bam_shards)
fplan = plan_bam_shards(bam, nprocs)
local = flagstat_shard(fplan, fplan.shards[pid])
summed = np.asarray(multihost_utils.process_allgather(
    local.astype(np.int64))).sum(axis=0)
open(f"{outdir}/flagstat{pid}.txt", "w").write(
    ",".join(map(str, summed.tolist())))
'''


def test_two_process_cram_bcf_flagstat(tmp_path):
    """Two OS processes under a jax.distributed coordinator run the
    CRAM container shard lane, the BCF record shard lane, and the
    shard-parallel flagstat reduction (VERDICT r4 item #8): each lane's
    concatenated output must equal the single-process result, and both
    workers must agree on the reduced counters."""
    from htslib_tpu.cram.batch import bam_to_cram_file, cram_file_to_sam
    from htslib_tpu.parallel.distributed import (distributed_flagstat,
                                                 plan_bam_shards)
    from htslib_tpu.sam import BamWriter, SamReader
    from htslib_tpu.vcf import BcfHeader, BcfRecord, BcfWriter
    from htslib_tpu.vcf.io import bcf_file_to_vcf
    src = ref_path("ce#1000.sam")
    if not os.path.exists(src):
        pytest.skip("no corpus")
    bam = str(tmp_path / "t.bam")
    with SamReader(src) as r:
        hdr = r.header
        recs = list(r)
    with BamWriter(bam, hdr) as w:
        for rec in recs:
            w.write(rec)
    cram = str(tmp_path / "t.cram")
    bam_to_cram_file(bam, cram, seqs_per_slice=100, slices_per_container=1)
    _, cram_single = cram_file_to_sam(cram)
    bcf = str(tmp_path / "t.bcf")
    vhdr = BcfHeader("\n".join([
        "##fileformat=VCFv4.2", "##contig=<ID=1,length=1000000>",
        '##INFO=<ID=DP,Number=1,Type=Integer,Description="d">',
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1",
    ]) + "\n")
    with BcfWriter(bcf, vhdr) as w:
        for i in range(400):
            w.write(BcfRecord.from_vcf(
                f"1\t{i * 3 + 1}\t.\tA\tC\t30\t.\tDP={i % 90}\tGT\t0/1",
                vhdr))
    _, vcf_single = bcf_file_to_vcf(bcf)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["PYTHONPATH"] = ":".join(
        [REPO] + [p for p in env.get("PYTHONPATH", "").split(":")
                  if p and ".axon_site" not in p])
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER2, str(pid), "2", str(port),
         str(tmp_path), bam, cram, bcf],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True) for pid in (0, 1)]
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"

    got_cram = b"".join(
        open(str(tmp_path / f"cram{i}.sam"), "rb").read() for i in (0, 1))
    assert got_cram == cram_single.tobytes()
    got_vcf = b"".join(
        open(str(tmp_path / f"bcf{i}.vcf"), "rb").read() for i in (0, 1))
    assert got_vcf == bytes(vcf_single)
    want_fs = distributed_flagstat(bam, 1)
    f0 = open(str(tmp_path / "flagstat0.txt")).read()
    f1 = open(str(tmp_path / "flagstat1.txt")).read()
    assert f0 == f1
    assert [int(x) for x in f0.split(",")] == want_fs.tolist()


def test_cram_container_shard_plan(tmp_path):
    """CRAM container-offset sharding (SURVEY §2.5 last row): N-shard
    decode concatenates byte-identically to the single-host output, and
    the N==1 plan is the whole file."""
    from htslib_tpu.cram.batch import bam_to_cram_file, cram_file_to_sam
    from htslib_tpu.parallel.distributed import (decode_cram_shard_to_sam,
                                                 plan_cram_shards)
    from htslib_tpu.sam import BamWriter, SamReader
    src = ref_path("ce#1000.sam")
    if not os.path.exists(src):
        pytest.skip("no corpus")
    bam = str(tmp_path / "t.bam")
    with SamReader(src) as r:
        hdr = r.header
        recs = list(r)
    with BamWriter(bam, hdr) as w:
        for rec in recs:
            w.write(rec)
    cram = str(tmp_path / "t.cram")
    bam_to_cram_file(bam, cram, seqs_per_slice=100, slices_per_container=1)
    _, single = cram_file_to_sam(cram)

    for n in (1, 2, 3, 5):
        plan = plan_cram_shards(cram, n)
        assert sum(s.n_records for s in plan.shards) == len(recs)
        parts = [decode_cram_shard_to_sam(plan, s) for s in plan.shards]
        assert b"".join(parts) == single.tobytes(), f"n={n} mismatch"
    # the plan covers every container exactly once, in order
    plan = plan_cram_shards(cram, 3)
    assert plan.shards[0].offset == int(plan.offsets[0])
    assert plan.shards[-1].end == int(plan.ends[-1])


def test_bcf_shard_plan(tmp_path):
    """BCF record-aligned sharding: N-shard VCF text concatenates
    byte-identically to the single-host bcf_file_to_vcf body."""
    from htslib_tpu.parallel.distributed import (decode_bcf_shard_to_vcf,
                                                 plan_bcf_shards)
    from htslib_tpu.vcf import BcfHeader, BcfRecord, BcfWriter
    from htslib_tpu.vcf.io import bcf_file_to_vcf
    hdr_text = "\n".join([
        "##fileformat=VCFv4.2", "##contig=<ID=1,length=1000000>",
        '##INFO=<ID=DP,Number=1,Type=Integer,Description="d">',
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="g">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1",
    ]) + "\n"
    hdr = BcfHeader(hdr_text)
    path = str(tmp_path / "t.bcf")
    with BcfWriter(path, hdr) as w:
        for i in range(500):
            w.write(BcfRecord.from_vcf(
                f"1\t{i * 3 + 1}\t.\tA\tC\t30\t.\tDP={i % 90}\tGT\t0/1",
                hdr))
    _, single = bcf_file_to_vcf(path)
    for n in (1, 2, 5):
        plan = plan_bcf_shards(path, n)
        assert sum(s.rec_hi - s.rec_lo for s in plan.shards) == 500
        parts = [decode_bcf_shard_to_vcf(plan, s) for s in plan.shards]
        assert b"".join(parts) == bytes(single), f"n={n}"


def test_distributed_flagstat(tmp_path):
    """Shard-parallel flagstat == whole-file counts, and the mesh psum
    step returns the same counters."""
    import numpy as np
    from htslib_tpu.parallel.distributed import (distributed_flagstat,
                                                 plan_bam_shards,
                                                 flagstat_shard)
    from htslib_tpu.sam import BamWriter, SamReader
    src = ref_path("ce#1000.sam")
    if not os.path.exists(src):
        pytest.skip("no corpus")
    bam = str(tmp_path / "t.bam")
    with SamReader(src) as r:
        hdr = r.header
        recs = list(r)
    with BamWriter(bam, hdr) as w:
        for rec in recs:
            w.write(rec)
    want = np.zeros(11, np.int64)
    for rec in recs:
        f = rec.flag
        want[0] += 1
        want[1] += bool(f & 0x100)
        want[2] += bool(f & 0x800)
        want[3] += bool(f & 0x400)
        want[4] += not (f & 4)
        want[5] += bool(f & 1)
        want[6] += bool(f & 0x40)
        want[7] += bool(f & 0x80)
        want[8] += bool(f & 2)
        want[9] += bool(f & 1) and not (f & 4) and not (f & 8)
        want[10] += bool(f & 1) and not (f & 4) and bool(f & 8)
    for n in (1, 3):
        got = distributed_flagstat(bam, n)
        assert (got == want).all(), (n, got, want)

    # mesh psum step over the same flags (virtual CPU devices)
    from tests.conftest import clean_jax_run
    flags = np.array([rec.flag for rec in recs], np.int32)
    np.save(str(tmp_path / "flags.npy"), flags)
    out = clean_jax_run(f"""
import numpy as np
import jax
from htslib_tpu.parallel.mesh import make_flagstat_step, make_mesh, shard_batch
flags = np.load({str(tmp_path / 'flags.npy')!r})
n_dev = 4
per = (len(flags) + n_dev - 1) // n_dev
pad = per * n_dev
fl = np.zeros(pad, np.int32); fl[:len(flags)] = flags
va = np.zeros(pad, bool); va[:len(flags)] = True
mesh = make_mesh(n=n_dev)
step = make_flagstat_step(mesh)
counts = np.asarray(step(*shard_batch(mesh, fl, va)))
print("COUNTS", ",".join(map(str, counts)))
""")
    line = [l for l in out.splitlines() if l.startswith("COUNTS")][0]
    got_mesh = np.array([int(x) for x in line.split()[1].split(",")])
    assert (got_mesh == want).all(), (got_mesh, want)
