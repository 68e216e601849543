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


def _batch_cigar_events(cigars, n_ops, poss):
    """Vectorised CIGAR -> (ref_pos, global_qpos) expansion for M/=/X
    bases across a whole record batch (the resolve_cigar2 reformulation,
    sam.c:5409, with no per-record or per-base Python loop).

    cigars: concatenated packed u32 ops [K]; n_ops: per-record op counts
    [N]; poss: per-record 0-based positions [N].  Returns (ref_pos [E],
    qpos_global [E], rec_of_event [E], qlen_offsets [N]) where
    qpos_global indexes into the concatenation of per-record query
    sequences."""
    K = len(cigars)
    N = len(n_ops)
    if K == 0:
        z = np.empty(0, np.int64)
        return z, z, z, np.zeros(N + 1, np.int64)
    ops = (cigars & 0xF).astype(np.int64)
    lens = (cigars >> 4).astype(np.int64)
    rec_of_op = np.repeat(np.arange(N), n_ops)
    op_starts = np.zeros(N + 1, np.int64)
    np.cumsum(n_ops, out=op_starts[1:])

    consumes_ref = np.isin(ops, (0, 2, 3, 7, 8))
    consumes_q = np.isin(ops, (0, 1, 4, 7, 8))
    ref_adv = np.where(consumes_ref, lens, 0)
    q_adv = np.where(consumes_q, lens, 0)
    # segmented exclusive cumsum: global cumsum minus the record's base
    ref_cum = np.cumsum(ref_adv)
    q_cum = np.cumsum(q_adv)
    ref_excl = ref_cum - ref_adv
    q_excl = q_cum - q_adv
    ref_base = np.zeros(K, np.int64)
    q_base = np.zeros(K, np.int64)
    starts = op_starts[:-1]
    ref_base = ref_excl[starts][rec_of_op]
    q_base = q_excl[starts][rec_of_op]
    r0 = poss[rec_of_op] + (ref_excl - ref_base)
    q0 = q_excl - q_base
    # per-record query length offsets (for global qpos)
    qlens = np.zeros(N, np.int64)
    np.add.at(qlens, rec_of_op, q_adv)
    qlen_off = np.zeros(N + 1, np.int64)
    np.cumsum(qlens, out=qlen_off[1:])

    m = np.isin(ops, (0, 7, 8)) & (lens > 0)
    mlens = lens[m]
    E = int(mlens.sum())
    if E == 0:
        z = np.empty(0, np.int64)
        return z, z, z, qlen_off
    within = np.arange(E) - np.repeat(np.cumsum(mlens) - mlens, mlens)
    ref_pos = np.repeat(r0[m], mlens) + within
    qpos = np.repeat(q0[m] + qlen_off[:-1][rec_of_op[m]], mlens) + within
    rec_of_event = np.repeat(rec_of_op[m], mlens)
    return ref_pos, qpos, rec_of_event, qlen_off


def device_pileup_counts(recs, tile_start: int, tile_len: int,
                         min_qual: int = 0):
    """End-to-end device pileup for one genome tile: the batch
    reformulation of bam_plp (sam.c:6011 bam_plp64_next + resolve_cigar2,
    sam.c:5409).  CIGAR expansion into (ref_pos, base) event tensors is
    fully vectorised numpy (no per-record loops over bases); the device
    does the per-position accumulation.

    recs: BamRecords (same tid, any order).  Returns (depth [tile_len],
    basecounts [tile_len, 16]); depth counts every read whose alignment
    covers the position (matching a bam_plp column's n, including
    deletion/refskip entries), basecounts count aligned query bases by
    nt16 code (the non-is_del, non-is_refskip column entries).
    """
    import jax.numpy as jnp

    use = [b for b in recs if not (b.flag & 4) and b.tid >= 0]
    if not use:
        z = np.zeros(tile_len, np.int32)
        return z, np.zeros((tile_len, 16), np.int32)
    poss = np.fromiter((b.pos for b in use), np.int64, len(use))
    n_ops = np.fromiter((len(b.cigar) for b in use), np.int64, len(use))
    cigars = (np.concatenate([np.asarray(b.cigar, np.uint32)
                              for b in use])
              if n_ops.sum() else np.empty(0, np.uint32))
    ends = np.fromiter((b.endpos() for b in use), np.int64, len(use))
    ends = np.maximum(ends, poss + 1)

    ref_pos, qpos, rec_of_event, qlen_off = _batch_cigar_events(
        cigars, n_ops, poss)

    # concatenated packed sequences -> nt16 codes at global qpos
    seq4_all = np.concatenate([np.frombuffer(b.seq4, np.uint8)
                               for b in use]) if use else np.empty(0, np.uint8)
    seq_off = np.zeros(len(use) + 1, np.int64)
    np.cumsum([len(b.seq4) for b in use], out=seq_off[1:])
    if len(ref_pos):
        # local qpos within the record, then nibble address in seq4_all
        local_q = qpos - qlen_off[rec_of_event]
        gaddr = seq_off[rec_of_event] * 2 + local_q
        nib = (seq4_all[gaddr >> 1] >> ((1 - (gaddr & 1)) * 4)) & 0xF
        if min_qual:
            qual_all = np.concatenate(
                [np.frombuffer(b.qual, np.uint8) if b.qual
                 else np.zeros(b.l_qseq, np.uint8) for b in use])
            qual_off = np.zeros(len(use) + 1, np.int64)
            np.cumsum([b.l_qseq for b in use], out=qual_off[1:])
            keep = qual_all[qual_off[rec_of_event] + local_q] >= min_qual
            ref_pos = ref_pos[keep]
            nib = nib[keep]
    else:
        nib = np.empty(0, np.uint8)

    starts_j = jnp.asarray(poss.astype(np.int32))
    ends_j = jnp.asarray(ends.astype(np.int32))
    valid = jnp.ones(len(use), bool)
    depth = coverage_tile(starts_j, ends_j, valid, jnp.int32(tile_start),
                          tile_len)
    counts = basecount_tile(jnp.asarray(ref_pos.astype(np.int32)),
                            jnp.asarray(nib.astype(np.int32)),
                            jnp.ones(len(ref_pos), bool),
                            jnp.int32(tile_start), tile_len)
    return np.asarray(depth), np.asarray(counts)
