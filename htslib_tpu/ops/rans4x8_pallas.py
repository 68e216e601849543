"""Pallas TPU rANS 4x8 order-0 decode — the CRAM 3.0 entropy coder on
chip (htscodecs rANS_static.c via cram/cram_io.c:1668), so VANILLA 3.0
CRAM data series (no special write profile) feed the on-device
decode->reduce pipelines.

Same architecture as the Nx16 kernel (`ops/rans_pallas.py`): gatherless
VMEM-table resolve (12-bit slots, identical packing), replicated-row
[8, 128] tiles, per-block stream cursors.  Differences: 4 interleaved
states per stream (so 32 blocks fill the 128 lanes), byte-granular
renormalisation against L = 1<<23 (up to TWO 8-bit refills per state
per round -> two masked refill passes), and a larger round tile
(_TILE4) to amortise the 32 per-block window reloads.
"""
from __future__ import annotations

import functools
from typing import List, Tuple

import numpy as np

from htslib_tpu.ops.rans_pallas import (TOTFREQ, TF_SHIFT, _resolve8,
                                        _row_fold, pack_tables)

RANS8_L = 1 << 23
NWAY4 = 4
BLOCKS4 = 32
SEG4 = 1024        # rounds per kernel call (x4 states = 4096 syms/blk)
_TILE4 = 16        # rounds per window reload
_WIN4 = 192        # window rows; consumption/block/tile <= 4*2*16 = 128


def _grp_cumsum_excl(v, gpos, nway):
    import jax.numpy as jnp

    from jax.experimental.pallas import tpu as pltpu
    acc = v
    s = 1
    while s < nway:
        acc = acc + jnp.where(gpos >= s, pltpu.roll(acc, s, axis=1), 0)
        s <<= 1
    return acc - v


def _grp_total(incl, gpos, nway):
    import jax.numpy as jnp

    from jax.experimental.pallas import tpu as pltpu
    v = incl
    s = 1
    while s < nway:
        cand = pltpu.roll(v, v.shape[1] - s, axis=1)
        v = jnp.where(gpos + s < nway, jnp.maximum(v, cand), v)
        s <<= 1
    return v


def _seg4_kernel(data_ref, lo_ref, dfc_ref, x_ref, cur_ref, cnt_ref,
                 out_ref, x_out_ref, cur_out_ref):
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl

    L = BLOCKS4 * NWAY4
    lo = lo_ref[:]
    dfc = dfc_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, L), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, L), 0)
    gpos = lane % NWAY4
    masks = [(lane >= b * NWAY4) & (lane < (b + 1) * NWAY4)
             for b in range(BLOCKS4)]

    cnt = cnt_ref[:]

    def refill_pass(x8, woff, win, active):
        need = jnp.where(active & (x8 < RANS8_L), 1, 0)
        pre = _grp_cumsum_excl(need, gpos, NWAY4)
        idx = woff + pre
        b8 = None
        for ch in range(_WIN4 // 8):
            sl = slice(ch * 8, ch * 8 + 8)
            hit = jnp.where(idx == row + ch * 8, win[sl], 0)
            b8 = hit if b8 is None else b8 + hit
        byte = _row_fold(b8)
        x8 = jnp.where(need > 0, (x8 << 8) | byte, x8)
        woff = woff + _grp_total(pre + need, gpos, NWAY4)
        return x8, woff

    def one_round(x8, woff, win, active):
        sym, x_new = _resolve8(x8, lo, dfc)
        x8 = jnp.where(active, x_new, x8)         # frozen lanes keep x
        x8, woff = refill_pass(x8, woff, win, active)   # byte 1
        x8, woff = refill_pass(x8, woff, win, active)   # byte 2 (rare)
        return sym, x8, woff

    def body(t, carry):
        x8 = carry[0]
        curs = carry[1:]
        win = jnp.zeros((_WIN4, L), jnp.int32)
        for b in range(BLOCKS4):
            win_b = data_ref[pl.ds(curs[b], _WIN4), b:b + 1]
            win = jnp.where((jax.lax.broadcasted_iota(
                jnp.int32, (_WIN4, L), 1) // NWAY4) == b, win_b, win)
        woff = jnp.zeros((8, L), jnp.int32)
        tile = jnp.zeros((8, L), jnp.int32)
        for r in range(_TILE4):
            active = (t * _TILE4 + r) < cnt
            sym, x8, woff = one_round(x8, woff, win, active)
            tile = jnp.where(row == (r % 8), sym, tile)
            if (r % 8) == 7:
                out_ref[pl.ds(t * _TILE4 + (r - 7), 8), :] = tile
        w_max = data_ref.shape[0] - _WIN4
        new = tuple(jnp.minimum(
            curs[b] + jnp.sum(jnp.where(masks[b], woff, 0)) // (8 * NWAY4),
            w_max) for b in range(BLOCKS4))
        return (x8,) + new

    curs0 = tuple(cur_ref[0, b] for b in range(BLOCKS4))
    carry = jax.lax.fori_loop(0, SEG4 // _TILE4, body,
                              (x_ref[:],) + curs0)
    x_out_ref[:] = carry[0]
    import jax.numpy as jnp2
    cur_out_ref[:] = jnp2.concatenate(
        [jnp2.full((1, 1), carry[1 + b], jnp2.int32)
         for b in range(BLOCKS4)], axis=1)


@functools.lru_cache(maxsize=None)
def _compiled_seg4(W: int, a_pad: int, interpret: bool = False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = BLOCKS4 * NWAY4

    @jax.jit
    def run_seg(data, lo, dfc, x, cur, cnt):
        return pl.pallas_call(
            _seg4_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((SEG4, L), jnp.int32),
                jax.ShapeDtypeStruct((8, L), jnp.int32),
                jax.ShapeDtypeStruct((1, BLOCKS4), jnp.int32),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 3),
            interpret=interpret,
        )(data, lo, dfc, x, cur, cnt)

    return run_seg


def _prepare_group4(group: List[bytes]):
    """Parse up to BLOCKS4 rANS 4x8 order-0 streams (9-byte prefix +
    freq table + 4 LE u32 states + byte payload)."""
    import struct

    from htslib_tpu.codecs.rans4x8 import _read_freqs

    freqs = np.zeros((BLOCKS4, 256), np.int64)
    states = np.zeros((BLOCKS4, NWAY4), np.int64)
    payloads: List[np.ndarray] = []
    out_szs = [0] * BLOCKS4
    for gi, data in enumerate(group):
        if data[0] != 0:
            raise ValueError("device rans4x8: order-0 only")
        comp_sz, out_sz = struct.unpack_from("<II", data, 1)
        out_szs[gi] = out_sz
        f, p = _read_freqs(data, 9)
        if f.sum() > TOTFREQ:
            raise ValueError("rans4x8: frequencies exceed 4096")
        # rounding-tolerant tables (sum may be < 4096): slots past the
        # cumulative end are never hit by valid streams, so the packed
        # tables are built from the actual frequencies as-is
        freqs[gi] = f
        for j in range(NWAY4):
            states[gi, j] = int.from_bytes(data[p + 4 * j:p + 4 * j + 4],
                                           "little")
        p += 16
        payloads.append(np.frombuffer(data, np.uint8, len(data) - p, p))
    for gi in range(len(group), BLOCKS4):
        freqs[gi, 0] = TOTFREQ
        states[gi, :] = RANS8_L
        payloads.append(np.zeros(0, np.uint8))

    a_max = max(int((freqs[gi] > 0).sum()) for gi in range(BLOCKS4))
    a_pad = 8
    while a_pad < a_max:
        a_pad <<= 1
    lo_b, dfc_b = pack_tables(freqs, a_pad)
    lo = np.repeat(lo_b, NWAY4, axis=1)
    dfc = np.repeat(dfc_b, NWAY4, axis=1)
    L = BLOCKS4 * NWAY4
    x = np.broadcast_to(states.reshape(1, L), (8, L)) \
        .astype(np.uint32).view(np.int32).copy()
    max_b = max(len(pl_) for pl_ in payloads)
    W = max_b + 2 * _WIN4
    # uint8 rows: the host->device transfer ships the streams at their
    # actual byte size (an i32-per-byte layout cost 4x tunnel bandwidth)
    data_w = np.zeros((W, BLOCKS4), np.uint8)
    for gi, pl_ in enumerate(payloads):
        data_w[:len(pl_), gi] = pl_
    return data_w, lo, dfc, x, out_szs, a_pad, W


def decode_4x8_o0_batch(blocks: List[bytes],
                        interpret: bool = False) -> List[bytes]:
    """Wire-exact rANS 4x8 order-0 decode on device, BLOCKS4 streams
    per pass (the CRAM 3.0 wire; codecs/rans4x8.py is the host
    model)."""
    import jax.numpy as jnp

    out: List[bytes] = [b""] * len(blocks)
    L = BLOCKS4 * NWAY4
    for base in range(0, len(blocks), BLOCKS4):
        group = blocks[base:base + BLOCKS4]
        data_w, lo, dfc, x, out_szs, a_pad, W = _prepare_group4(group)
        rounds_needed = max(1, max(out_szs) // NWAY4)   # main rounds
        n_segs = (rounds_needed + SEG4 - 1) // SEG4
        run = _compiled_seg4(W, a_pad, interpret)
        data_j = jnp.asarray(data_w.astype(np.int32))
        lo_j = jnp.asarray(lo)
        dfc_j = jnp.asarray(dfc)
        x_j = jnp.asarray(x)
        cur_j = jnp.asarray(np.zeros((1, BLOCKS4), np.int32))
        cnt_lane = np.zeros(L, np.int32)
        for b in range(BLOCKS4):
            cnt_lane[b * NWAY4:(b + 1) * NWAY4] = out_szs[b] // NWAY4
        segs = []
        for si in range(n_segs):
            cnt_seg = np.broadcast_to(
                np.maximum(cnt_lane - si * SEG4, 0)[None, :],
                (8, L)).astype(np.int32).copy()
            syms, x_j, cur_j = run(data_j, lo_j, dfc_j, x_j, cur_j,
                                   jnp.asarray(cnt_seg))
            segs.append(np.asarray(syms))
        allsym = np.concatenate(segs, axis=0)
        x_fin = np.asarray(x_j)[0].astype(np.int64) & 0xFFFFFFFF
        cur_fin = np.asarray(cur_j)[0]
        for gi, data in enumerate(group):
            n = out_szs[gi]
            nmain = n // NWAY4
            cols = allsym[:nmain, gi * NWAY4:(gi + 1) * NWAY4]
            stream = np.empty(n, np.uint8)
            stream[:nmain * NWAY4] = cols.reshape(-1).astype(np.uint8)
            if n - nmain * NWAY4:
                # tail: finish states 0..n%4-1 on host from the final
                # kernel state (byte-exact continuation)
                from htslib_tpu.codecs.rans4x8 import _read_freqs
                import struct as _st
                f, p0 = _read_freqs(data, 9)
                cum = np.zeros(257, np.int64)
                np.cumsum(f, out=cum[1:])
                D = np.repeat(np.arange(256, dtype=np.uint8), f)
                if len(D) < TOTFREQ:
                    D = np.concatenate(
                        [D, np.zeros(TOTFREQ - len(D), np.uint8)])
                arr = np.frombuffer(data, np.uint8)
                ptr = p0 + 16 + int(cur_fin[gi])
                xs = x_fin[gi * NWAY4:(gi + 1) * NWAY4].copy()
                for k in range(n - nmain * NWAY4):
                    j = k
                    m = int(xs[j]) & (TOTFREQ - 1)
                    sym = int(D[m])
                    stream[nmain * NWAY4 + k] = sym
                    xs[j] = (int(f[sym]) * (int(xs[j]) >> TF_SHIFT)
                             + m - int(cum[sym]))
                    while xs[j] < RANS8_L and ptr < len(arr):
                        xs[j] = (int(xs[j]) << 8) | int(arr[ptr])
                        ptr += 1
            out[base + gi] = stream.tobytes()
    return out
