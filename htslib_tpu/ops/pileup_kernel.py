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
