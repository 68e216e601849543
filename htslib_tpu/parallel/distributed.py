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
