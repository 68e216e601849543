"""Batch pileup accumulation on device.

Reformulates the reference's per-column state machine (resolve_cigar2,
sam.c:5409) as CIGAR-expansion -> event tensors -> segment sums over
genome tiles (SURVEY §7 stage 7): each read contributes +1 at its start
and -1 after its end on the coverage difference array; depth is the
prefix sum.  Base counts use one-hot scatter adds.  Tiles shard over the
device mesh with psum merges; tile edges need ±max_read_len halo.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("tile_len",))
def coverage_tile(starts: jax.Array, ends: jax.Array, valid: jax.Array,
                  tile_start, tile_len: int) -> jax.Array:
    """Depth per position for one genome tile [tile_start, tile_start+len).

    starts/ends: int32 [N] read alignment spans (end exclusive); valid
    masks padding lanes.  Difference-array scatter + cumsum.
    """
    s = jnp.clip(starts - tile_start, 0, tile_len)
    e = jnp.clip(ends - tile_start, 0, tile_len)
    w = jnp.where(valid, 1, 0)
    diff = jnp.zeros(tile_len + 1, jnp.int32)
    diff = diff.at[s].add(w)
    diff = diff.at[e].add(-w)
    return jnp.cumsum(diff[:-1])


@functools.partial(jax.jit, static_argnames=("tile_len",))
def basecount_tile(ref_positions: jax.Array, base_codes: jax.Array,
                   valid: jax.Array, tile_start, tile_len: int) -> jax.Array:
    """Per-position base counts [tile_len, 16] from flattened
    (ref_pos, nt16 code) events."""
    idx = ref_positions - tile_start
    ok = valid & (idx >= 0) & (idx < tile_len)
    idx = jnp.clip(idx, 0, tile_len - 1)
    out = jnp.zeros((tile_len, 16), jnp.int32)
    return out.at[idx, base_codes].add(jnp.where(ok, 1, 0))


def expand_cigar_events(cigar: np.ndarray, pos: int):
    """Host helper: packed CIGAR -> (ref_pos, qpos) event arrays for
    M/=/X bases (the feature stream the device kernels consume)."""
    ops = cigar & 0xF
    lens = (cigar >> 4).astype(np.int64)
    ref_pos = []
    qpos = []
    r, q = pos, 0
    for op, ln in zip(ops, lens):
        if op in (0, 7, 8):       # M/=/X
            ref_pos.append(np.arange(r, r + ln))
            qpos.append(np.arange(q, q + ln))
            r += ln
            q += ln
        elif op == 1 or op == 4:  # I/S
            q += ln
        elif op == 2 or op == 3:  # D/N
            r += ln
    if not ref_pos:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    return np.concatenate(ref_pos), np.concatenate(qpos)


def device_pileup_counts(recs, tile_start: int, tile_len: int,
                         min_qual: int = 0):
    """End-to-end device pileup for one genome tile: the batch
    reformulation of bam_plp (sam.c:6011 bam_plp64_next + resolve_cigar2,
    sam.c:5409).  Host does CIGAR expansion into (ref_pos, base) event
    tensors; the device does the per-position accumulation.

    recs: BamRecords (same tid, any order).  Returns (depth [tile_len],
    basecounts [tile_len, 16]); depth counts every read whose alignment
    covers the position (matching a bam_plp column's n, including
    deletion/refskip entries), basecounts count aligned query bases by
    nt16 code (the non-is_del, non-is_refskip column entries).
    """
    import jax.numpy as jnp

    starts, ends, rp_all, code_all = [], [], [], []
    for b in recs:
        if b.flag & 4 or b.tid < 0:
            continue
        starts.append(b.pos)
        e = b.endpos()
        ends.append(e if e > b.pos else b.pos + 1)
        rp, qp = expand_cigar_events(np.asarray(b.cigar, np.uint32), b.pos)
        if len(rp) == 0:
            continue
        seq4 = np.frombuffer(b.seq4, np.uint8)
        nib = np.empty(b.l_qseq, np.uint8)
        nib[0::2] = seq4[:(b.l_qseq + 1) // 2] >> 4
        nib[1::2] = seq4[:b.l_qseq // 2] & 0xF
        if min_qual and b.qual:
            q = np.frombuffer(b.qual, np.uint8)
            keep = q[qp] >= min_qual
            rp, qp = rp[keep], qp[keep]
        rp_all.append(rp)
        code_all.append(nib[qp])
    if not starts:
        z = np.zeros(tile_len, np.int32)
        return z, np.zeros((tile_len, 16), np.int32)
    starts = jnp.asarray(np.asarray(starts, np.int32))
    ends = jnp.asarray(np.asarray(ends, np.int32))
    valid = jnp.ones(len(starts), bool)
    depth = coverage_tile(starts, ends, valid, jnp.int32(tile_start),
                          tile_len)
    rp = jnp.asarray(np.concatenate(rp_all).astype(np.int32))
    codes = jnp.asarray(np.concatenate(code_all).astype(np.int32))
    counts = basecount_tile(rp, codes, jnp.ones(len(rp), bool),
                            jnp.int32(tile_start), tile_len)
    return np.asarray(depth), np.asarray(counts)
