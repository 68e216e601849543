"""Multi-host scale-out (SURVEY §7 stage 9; new design — the reference
is single-process pthreads with no distributed backend).

The file-level unit of distribution is a *shard plan*: record-aligned
ranges of the uncompressed stream plus the BGZF blocks covering them.
A plan is computed once (one cheap native scan pass) and replicated to
every host — the same model as BASELINE's per-host replicated
FASTA/index.  Each host inflates only its covering blocks and formats
only its records; outputs concatenate deterministically in shard order,
so N-host output == 1-host output by construction (the stage-9 gate).

``initialize()`` wraps jax.distributed.initialize for real pods; the
shard-plan math is pure host code and is exercised in tests by running
several shards in one process.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize wrapper; no-op when single-process
    (env unset) so code paths are identical on one host."""
    if coordinator is None and "JAX_COORDINATOR_ADDRESS" not in os.environ:
        return
    import jax
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


@dataclass
class BamShard:
    index: int
    ustart: int          # absolute uncompressed offset of first record
    uend: int            # absolute offset past this shard's last record
    n_records: int


@dataclass
class BamShardPlan:
    path: str
    coffsets: np.ndarray  # per BGZF block
    csizes: np.ndarray
    ustarts: np.ndarray   # absolute uncompressed start per block
    usizes: np.ndarray
    shards: List[BamShard] = field(default_factory=list)


def plan_bam_shards(path: str, n_shards: int) -> BamShardPlan:
    """Split a BAM into record-aligned shards balanced by uncompressed
    bytes (block-range sharding by file offset, SURVEY §2.5 last row)."""
    from htslib_tpu.native import native
    from htslib_tpu.sam import BamReader

    raw = np.fromfile(path, np.uint8)
    if native is not None:
        co, cs, us = native.bgzf_scan(raw)
    else:
        from htslib_tpu.bgzf import scan_blocks
        bt = scan_blocks(raw.tobytes())
        co = np.asarray(bt.coffsets, np.uint64)
        cs = np.asarray(bt.csizes, np.uint32)
        us = np.asarray(bt.usizes, np.uint32)
    ustarts = np.zeros(len(us), np.uint64)
    np.cumsum(us[:-1].astype(np.uint64), out=ustarts[1:])
    total_u = int(ustarts[-1]) + int(us[-1]) if len(us) else 0

    with BamReader(path) as r:
        data, offs, sizes = r.raw_records()
    rec_base = total_u - int(data.nbytes)  # records begin after the header
    n = len(offs)
    rec_ends = np.asarray(offs, np.int64) + np.asarray(sizes, np.int64)

    plan = BamShardPlan(path, co, cs, ustarts, us)
    per = (int(data.nbytes) + max(n_shards, 1) - 1) // max(n_shards, 1)
    lo_rec = 0
    for si in range(n_shards):
        if lo_rec >= n:
            break
        target = (si + 1) * per
        hi_rec = int(np.searchsorted(rec_ends, target, side="right"))
        hi_rec = max(hi_rec, lo_rec + 1)
        if si == n_shards - 1:
            hi_rec = n
        plan.shards.append(BamShard(
            si, rec_base + int(offs[lo_rec]),
            rec_base + int(rec_ends[hi_rec - 1]), hi_rec - lo_rec))
        lo_rec = hi_rec
    return plan


# ---------------------------------------------------------------------------
# CRAM container shard plans (VERDICT r3 #9; SURVEY §2.5 last row —
# "host sharding of ... CRAM containers by file offset").  The container
# scan mirrors cram_index.c:851-1021's container counting/offset walk.
# ---------------------------------------------------------------------------

@dataclass
class CramShard:
    index: int
    offset: int          # absolute byte offset of the first container
    end: int             # past-end byte offset of the last container
    n_records: int


@dataclass
class CramShardPlan:
    path: str
    ref: Optional[str]
    offsets: np.ndarray  # per data container: absolute byte offset
    ends: np.ndarray     # per data container: past-end byte offset
    nrecs: np.ndarray
    shards: List["CramShard"] = field(default_factory=list)


def plan_cram_shards(path: str, n_shards: int,
                     ref: Optional[str] = None) -> CramShardPlan:
    """Split a CRAM into container-aligned shards balanced by container
    bytes.  One cheap header-only scan (read_container_header + skip,
    the cram_index.c:851 container walk); the plan is replicated to
    every host and each host decodes only its byte range."""
    from htslib_tpu.cram import CRAM_EOF_START, CramReader

    offsets: List[int] = []
    ends: List[int] = []
    nrecs: List[int] = []
    with CramReader(path, ref=ref) as r:
        while True:
            pos = r.fp.tell()
            c = r.io.read_container_header()
            if c is None:
                break
            if c.ref_seq_id == -1 and c.ref_seq_start == CRAM_EOF_START:
                break
            r.io.skip_container_data(c)
            if c.length == 0 or c.num_records == 0:
                continue
            offsets.append(pos)
            ends.append(c.data_offset + c.length)
            nrecs.append(c.num_records)

    plan = CramShardPlan(path, ref, np.asarray(offsets, np.int64),
                         np.asarray(ends, np.int64),
                         np.asarray(nrecs, np.int64))
    nc = len(offsets)
    if nc == 0:
        return plan
    sizes = plan.ends - plan.offsets
    csum = np.cumsum(sizes)
    total = int(csum[-1])
    per = (total + max(n_shards, 1) - 1) // max(n_shards, 1)
    lo = 0
    for si in range(n_shards):
        if lo >= nc:
            break
        target = (si + 1) * per
        hi = int(np.searchsorted(csum, target, side="left")) + 1
        hi = max(hi, lo + 1)
        if si == n_shards - 1:
            hi = nc
        hi = min(hi, nc)
        plan.shards.append(CramShard(
            si, int(plan.offsets[lo]), int(plan.ends[hi - 1]),
            int(plan.nrecs[lo:hi].sum())))
        lo = hi
    return plan


def decode_cram_shard_to_sam(plan: CramShardPlan, shard: CramShard,
                             window: int = 4) -> bytes:
    """One host's work: decode only this shard's containers through the
    slice-parallel fused pipeline.  Concatenating results in shard
    order reproduces the single-host cram_file_to_sam output."""
    from htslib_tpu.cram.batch import cram_range_to_sam
    _, sam = cram_range_to_sam(plan.path, shard.offset, shard.end,
                               ref=plan.ref, window=window)
    return sam.tobytes()


# ---------------------------------------------------------------------------
# BCF record shard plans + distributed flagstat reduction
# (VERDICT r3 missing #5: distributed VCF lane, flagstat-style psum)
# ---------------------------------------------------------------------------

@dataclass
class BcfShard:
    index: int
    rec_lo: int          # first record ordinal
    rec_hi: int          # past-end ordinal
    ustart: int          # body-relative uncompressed byte offset
    uend: int


@dataclass
class BcfShardPlan:
    path: str
    offs: np.ndarray     # per record: body-relative byte offset
    sizes: np.ndarray    # per record: 8 + l_shared + l_indiv
    shards: List["BcfShard"] = field(default_factory=list)


def plan_bcf_shards(path: str, n_shards: int) -> BcfShardPlan:
    """Split a BCF into record-aligned shards balanced by uncompressed
    record bytes (one frame walk over the inflated body; the BGZF scan
    itself is the cheap native pass)."""
    import struct as _st

    from htslib_tpu.vcf.io import BcfReader

    with BcfReader(path) as r:
        body = r.fp.read_all()
    buf = body.tobytes() if hasattr(body, "tobytes") else bytes(body)
    offs: List[int] = []
    sizes: List[int] = []
    p = 0
    n = len(buf)
    while p + 8 <= n:
        l_shared, l_indiv = _st.unpack_from("<II", buf, p)
        offs.append(p)
        sizes.append(8 + l_shared + l_indiv)
        p += 8 + l_shared + l_indiv
    if p != n:
        raise IOError("BCF body: trailing bytes after the last record")
    plan = BcfShardPlan(path, np.asarray(offs, np.int64),
                        np.asarray(sizes, np.int64))
    nr = len(offs)
    if nr == 0:
        return plan
    ends = plan.offs + plan.sizes
    per = (int(ends[-1]) + max(n_shards, 1) - 1) // max(n_shards, 1)
    lo = 0
    for si in range(n_shards):
        if lo >= nr:
            break
        hi = int(np.searchsorted(ends, (si + 1) * per, side="right"))
        hi = max(hi, lo + 1)
        if si == n_shards - 1:
            hi = nr
        hi = min(hi, nr)
        plan.shards.append(BcfShard(si, lo, hi, int(plan.offs[lo]),
                                    int(ends[hi - 1])))
        lo = hi
    return plan


def decode_bcf_shard_to_vcf(plan: BcfShardPlan, shard: BcfShard,
                            header=None) -> bytes:
    """One host's work: format only this shard's records as VCF text
    through the native vcf_format engine.  Concatenating results in
    shard order reproduces the single-host bcf_file_to_vcf body."""
    from htslib_tpu.native import native
    from htslib_tpu.vcf.io import BcfReader

    with BcfReader(plan.path) as r:
        hdr = header or r.header
        body = r.fp.read_all()
    data = np.asarray(body, np.uint8) if not isinstance(body, np.ndarray) \
        else body
    chunk = np.ascontiguousarray(data[shard.ustart:shard.uend])
    if native is not None:
        return native.bcf_to_vcf(chunk, hdr.ctg_names, hdr.id_names,
                                 hdr.id2int("GT"), hdr.v44)
    import struct as _st

    from htslib_tpu.vcf.record import BcfRecord
    buf = chunk.tobytes()
    lines = []
    p = 0
    while p + 8 <= len(buf):
        l_shared, l_indiv = _st.unpack_from("<II", buf, p)
        shared = buf[p + 8:p + 8 + l_shared]
        indiv = buf[p + 8 + l_shared:p + 8 + l_shared + l_indiv]
        p += 8 + l_shared + l_indiv
        lines.append(BcfRecord.from_bcf(shared, indiv, hdr).to_vcf(hdr))
    return ("\n".join(lines) + ("\n" if lines else "")).encode()


def flagstat_shard(plan: BamShardPlan, shard: BamShard) -> np.ndarray:
    """Per-shard flag-category counts (the samtools flagstat counters):
    one int64 vector ready for a psum merge across hosts.  Categories:
    [total, secondary, supplementary, duplicates, mapped, paired,
    read1, read2, proper_pair, both_mapped, singleton]."""
    from htslib_tpu.native import native
    from htslib_tpu.sam import BamReader

    b_lo = int(np.searchsorted(plan.ustarts, shard.ustart,
                               side="right")) - 1
    b_hi = int(np.searchsorted(plan.ustarts, shard.uend, side="left"))
    b_lo = max(b_lo, 0)
    b_hi = max(b_hi, b_lo + 1)
    raw = np.fromfile(plan.path, np.uint8)
    data = native.inflate_batch(raw, plan.coffsets[b_lo:b_hi],
                                plan.csizes[b_lo:b_hi],
                                plan.usizes[b_lo:b_hi])
    base = int(plan.ustarts[b_lo])
    chunk = np.ascontiguousarray(
        np.asarray(data)[shard.ustart - base:shard.uend - base])
    offs, sizes = native.bam_scan(chunk, 0)
    _, _, _, flags = native.bam_fields(chunk, np.asarray(offs, np.int64))
    f = flags.astype(np.int64)
    out = np.zeros(11, np.int64)
    out[0] = len(f)
    out[1] = int(((f & 0x100) != 0).sum())        # secondary
    out[2] = int(((f & 0x800) != 0).sum())        # supplementary
    out[3] = int(((f & 0x400) != 0).sum())        # dup
    out[4] = int(((f & 4) == 0).sum())            # mapped
    out[5] = int(((f & 1) != 0).sum())            # paired
    out[6] = int(((f & 0x40) != 0).sum())         # read1
    out[7] = int(((f & 0x80) != 0).sum())         # read2
    out[8] = int(((f & 2) != 0).sum())            # proper pair
    out[9] = int((((f & 1) != 0) & ((f & 4) == 0)
                  & ((f & 8) == 0)).sum())        # both mapped
    out[10] = int((((f & 1) != 0) & ((f & 4) == 0)
                   & ((f & 8) != 0)).sum())       # singleton
    return out


def distributed_flagstat(path: str, n_shards: int) -> np.ndarray:
    """Shard-parallel flagstat: per-shard counters merged by summation —
    the host-level mirror of the mesh psum reduction
    (parallel/mesh.py make_flagstat_step)."""
    plan = plan_bam_shards(path, n_shards)
    total = np.zeros(11, np.int64)
    for sh in plan.shards:
        total += flagstat_shard(plan, sh)
    return total


def decode_shard_to_sam(plan: BamShardPlan, shard: BamShard,
                        header=None) -> bytes:
    """One host's work: inflate only the BGZF blocks covering this
    shard, then scan+format its records.  Deterministic: concatenating
    results in shard order reproduces the single-host output."""
    from htslib_tpu.native import native
    from htslib_tpu.sam import BamReader
    from htslib_tpu.sam.batch import bam_stream_to_sam

    if header is None:
        with BamReader(plan.path) as r:
            header = r.header
    b_lo = int(np.searchsorted(plan.ustarts, shard.ustart,
                               side="right")) - 1
    b_hi = int(np.searchsorted(plan.ustarts, shard.uend, side="left"))
    b_lo = max(b_lo, 0)
    b_hi = max(b_hi, b_lo + 1)

    raw = np.fromfile(plan.path, np.uint8)
    co = plan.coffsets[b_lo:b_hi]
    cs = plan.csizes[b_lo:b_hi]
    us = plan.usizes[b_lo:b_hi]
    if native is not None:
        data = native.inflate_batch(raw, co, cs, us)
    else:
        from htslib_tpu.bgzf import decompress_block
        parts = []
        for o, s in zip(co, cs):
            parts.append(decompress_block(raw[int(o):int(o) + int(s)]
                                          .tobytes())[0])
        data = np.frombuffer(b"".join(parts), np.uint8)
    base = int(plan.ustarts[b_lo])
    chunk = np.ascontiguousarray(
        np.asarray(data)[shard.ustart - base:shard.uend - base])
    return bam_stream_to_sam(chunk, header).tobytes()
