"""Pallas TPU rANS 4x8 order-0 decode — the CRAM 3.0 entropy coder on
chip (htscodecs rANS_static.c via cram/cram_io.c:1668), so VANILLA 3.0
CRAM data series (no special write profile) feed the on-device
decode->reduce pipelines.

Same architecture as the Nx16 kernel (`ops/rans_pallas.py`, round-5
form): gatherless VMEM-table resolve (12-bit slots, identical packing),
replicated-row [8, L] tiles, STATE-MAJOR lanes (state j of block b at
lane j*BLOCKS4 + b) so the per-block window expands with one
pltpu.repeat, byte-PACKED windows (4 stream bytes per i32 row), and
tree-shaped accumulations (the round is latency/issue-bound —
scripts/probe_rans_ablate.py).  4x8-specific: 4 interleaved states per
stream (256 blocks fill 1024 lanes), byte-granular renormalisation
against L = 1<<23 with up to TWO refills per state per round — the
refill count n = (x<2^23)+(x<2^15) is value-independent, so ONE scan
pass covers both bytes (two window selects, one cumsum/total).
"""
from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from htslib_tpu.ops.rans_pallas import (TOTFREQ, TF_SHIFT,
                                        _alpha_select,
                                        _group_cumsum_exclusive,
                                        _group_total, _resolve8,
                                        _resolve_stacked, _row_fold,
                                        _tree_acc, _win_fetch,
                                        pack_tables)

RANS8_L = 1 << 23
NWAY4 = 4
BLOCKS4 = 64       # streams per kernel call (64 x 4 = 256 lanes; more
                   # blocks would widen further but the per-block scalar
                   # cursor machinery — carry entries + window slices —
                   # scales linearly and dominates compile time)
SEG4 = 1024        # rounds per kernel call (x4 states = 4096 syms/blk)
_TILE4 = 16        # rounds per window reload
_WINR4 = 40        # window i32 rows, 4 stream BYTES packed per row
                   # (>= ceil((16*4*2 + 3)/4) = 33 for an odd cursor)


def _seg4_kernel(data_ref, lo_ref, dfc_ref, x_ref, cur_ref, cnt_ref,
                 out_ref, x_out_ref, cur_out_ref):
    L = BLOCKS4 * NWAY4
    lo = lo_ref[:]
    dfc = dfc_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, L), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, L), 0)
    gpos = lane // BLOCKS4            # state index within the stream
    blk = lane % BLOCKS4

    cnt = cnt_ref[:]

    def one_round(x8, woff, win, active):
        sym, x_new = _resolve8(x8, lo, dfc)
        x8 = jnp.where(active, x_new, x8)         # frozen lanes keep x
        # refill count is value-independent: 0, 1 or 2 bytes
        need = jnp.where(active & (x8 < RANS8_L), 1, 0) \
            + jnp.where(active & (x8 < (1 << 15)), 1, 0)
        pre = _group_cumsum_exclusive(need, gpos, NWAY4, stride=BLOCKS4)
        idx = woff + pre                           # byte offset
        idx2 = idx + 1

        def fetch(ix):
            return _win_fetch(win, ix, row, 2)

        b1 = fetch(idx)
        b2 = fetch(idx2)
        x8 = jnp.where(need >= 1, (x8 << 8) | b1, x8)
        x8 = jnp.where(need == 2, (x8 << 8) | b2, x8)
        woff = woff + _group_total(pre + need, gpos, NWAY4,
                                   stride=BLOCKS4)
        return sym, x8, woff

    def body(t, carry):
        x8 = carry[0]
        par = carry[1]
        curs = carry[2:]
        win_c = jnp.concatenate(
            [data_ref[pl.ds(
                jax.lax.shift_right_logical(curs[b], 2), _WINR4),
                b:b + 1] for b in range(BLOCKS4)], axis=1)
        win = pltpu.repeat(win_c, NWAY4, axis=1)
        woff = par
        tiles = []
        for r in range(_TILE4):
            active = (t * _TILE4 + r) < cnt
            sym, x8, woff = one_round(x8, woff, win, active)
            tiles.append(jnp.where(row == (r % 8), sym, 0))
        out = jnp.concatenate(
            [sum(tiles[k * 8:(k + 1) * 8][r] for r in range(8))
             for k in range(_TILE4 // 8)], axis=0)
        out_ref[pl.ds(t * _TILE4, _TILE4), :] = out
        par = woff & 3
        w_max = (data_ref.shape[0] - _WINR4) * 4
        new = tuple(jnp.minimum(
            curs[b] - (curs[b] & 3) + woff[0, b], w_max)
            for b in range(BLOCKS4))
        return (x8, par) + new

    curs0 = tuple(cur_ref[0, b] for b in range(BLOCKS4))
    par0 = jnp.zeros((8, L), jnp.int32)
    for b in range(BLOCKS4):
        par0 = jnp.where(blk == b, cur_ref[0, b] & 3, par0)
    carry = jax.lax.fori_loop(0, SEG4 // _TILE4, body,
                              (x_ref[:], par0) + curs0)
    x_out_ref[:] = carry[0]
    cur_out_ref[:] = jnp.concatenate(
        [jnp.full((1, 1), carry[2 + b], jnp.int32)
         for b in range(BLOCKS4)], axis=1)


def _seg4_hist_kernel(qbins, o1, data_ref, lo_ref, dfc_ref, ad_ref,
                      x_ref, cur_ref, ctx_ref, cnt_ref,
                      hist_ref, x_out_ref, cur_out_ref, ctx_out_ref):
    """Decode+HISTOGRAM segment for the 4x8 wire, order-0 OR order-1
    (o1 static flag).  Order-1 fuses the context into the telescoping
    key exactly as ops/rans_o1_pallas.py: lo carries ctx_idx*4096+cum
    boundaries over stacked sparse (ctx,sym) rows, the packed delta
    word's top byte is the DENSE symbol index (next context), and `ad`
    telescopes the union alphabet back to symbol values.  cnt [8, L] =
    remaining main rounds per lane (validity + freeze mask); the
    state-3 tail finishes on the host from the returned state/ctx."""
    L = BLOCKS4 * NWAY4
    lo = lo_ref[:]
    dfc = dfc_ref[:]
    ad = ad_ref[:]
    A2 = lo.shape[0]
    A = ad.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, L), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, L), 0)
    gpos = lane // BLOCKS4
    blk = lane % BLOCKS4
    cnt = cnt_ref[:]

    def one_round(x8, ctxd, woff, win, active):
        if o1:
            key = ctxd * TOTFREQ + (x8 & (TOTFREQ - 1))
        else:
            key = x8 & (TOTFREQ - 1)
        idx, f, c = _resolve_stacked(key, lo, dfc)
        m = x8 & (TOTFREQ - 1)
        x_new = f * (x8 >> TF_SHIFT) + m - c
        if o1:
            sym = _alpha_select(idx, ad, row)
            ctxd = jnp.where(active, idx, ctxd)
        else:
            sym = idx
        x8 = jnp.where(active, x_new, x8)
        # byte refill: n = (x<2^23)+(x<2^15), value-independent
        need = jnp.where(active & (x8 < RANS8_L), 1, 0) \
            + jnp.where(active & (x8 < (1 << 15)), 1, 0)
        pre = _group_cumsum_exclusive(need, gpos, NWAY4, stride=BLOCKS4)
        idxb = woff + pre

        def fetch(ix):
            return _win_fetch(win, ix, row, 2)

        b1 = fetch(idxb)
        b2 = fetch(idxb + 1)
        x8 = jnp.where(need >= 1, (x8 << 8) | b1, x8)
        x8 = jnp.where(need == 2, (x8 << 8) | b2, x8)
        woff = woff + _group_total(pre + need, gpos, NWAY4,
                                   stride=BLOCKS4)
        return sym, x8, ctxd, woff

    def body(t, carry):
        x8, ctxd, par = carry[0], carry[1], carry[2]
        hists = carry[3]
        curs = carry[4:]
        win_c = jnp.concatenate(
            [data_ref[pl.ds(
                jax.lax.shift_right_logical(curs[b], 2), _WINR4),
                b:b + 1] for b in range(BLOCKS4)], axis=1)
        win = pltpu.repeat(win_c, NWAY4, axis=1)
        woff = par
        for r in range(_TILE4):
            active = (t * _TILE4 + r) < cnt
            sym, x8, ctxd, woff = one_round(x8, ctxd, woff, win, active)
            q = jnp.clip(sym, 0, qbins - 1)
            hists = tuple(
                hists[ch] + jnp.where(active & (q == row + ch * 8), 1, 0)
                for ch in range(qbins // 8))
        par = woff & 3
        w_max = (data_ref.shape[0] - _WINR4) * 4
        new = tuple(jnp.minimum(
            curs[b] - (curs[b] & 3) + woff[0, b], w_max)
            for b in range(BLOCKS4))
        return (x8, ctxd, par, hists) + new

    curs0 = tuple(cur_ref[0, b] for b in range(BLOCKS4))
    par0 = jnp.zeros((8, L), jnp.int32)
    for b in range(BLOCKS4):
        par0 = jnp.where(blk == b, cur_ref[0, b] & 3, par0)
    hist0 = tuple(jnp.zeros((8, L), jnp.int32)
                  for _ in range(qbins // 8))
    carry = jax.lax.fori_loop(0, SEG4 // _TILE4, body,
                              (x_ref[:], ctx_ref[:], par0, hist0)
                              + curs0)
    x_out_ref[:] = carry[0]
    ctx_out_ref[:] = carry[1]
    for ch in range(qbins // 8):
        hist_ref[ch * 8:(ch + 1) * 8, :] = carry[3][ch]
    cur_out_ref[:] = jnp.concatenate(
        [jnp.full((1, 1), carry[4 + b], jnp.int32)
         for b in range(BLOCKS4)], axis=1)


@functools.lru_cache(maxsize=None)
def _compiled_seg4_hist(a2_pad: int, a_pad: int, o1: bool,
                        qbins: int = 64, interpret: bool = False):
    L = BLOCKS4 * NWAY4

    @jax.jit
    def run_seg(data, lo, dfc, ad, x, cur, ctx, cnt):
        return pl.pallas_call(
            functools.partial(_seg4_hist_kernel, qbins, o1),
            out_shape=(
                jax.ShapeDtypeStruct((qbins, L), jnp.int32),
                jax.ShapeDtypeStruct((8, L), jnp.int32),
                jax.ShapeDtypeStruct((1, BLOCKS4), jnp.int32),
                jax.ShapeDtypeStruct((8, L), jnp.int32),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
            out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 4),
            interpret=interpret,
        )(data, lo, dfc, ad, x, cur, ctx, cnt)

    return run_seg


def build_o1_tables_4x8(F: np.ndarray, a2_pad: int, a_pad: int):
    """Stacked sparse (ctx,sym) tables for the 4x8 order-1 wire —
    same construction as ops/rans_o1_pallas.build_o1_tables (the 4x8
    per-context tables may sum to <= 4096; uncovered top slots are
    never hit by valid streams)."""
    from htslib_tpu.ops.rans_o1_pallas import build_o1_tables
    return build_o1_tables(F, a2_pad, a_pad)


@functools.lru_cache(maxsize=None)
def _compiled_seg4(W: int, a_pad: int, interpret: bool = False):
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
    freq table + 4 LE u32 states + byte payload) into the kernel's
    byte-packed state-major device layout."""
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
    # state-major lanes: tables tile, states transpose
    lo = np.tile(lo_b, (1, NWAY4))
    dfc = np.tile(dfc_b, (1, NWAY4))
    L = BLOCKS4 * NWAY4
    x = np.broadcast_to(states.T.reshape(1, L), (8, L)) \
        .astype(np.uint32).view(np.int32).copy()
    max_rows = max((len(pl_) + 3) // 4 for pl_ in payloads)
    W = max_rows + 2 * _WINR4
    # four LE stream bytes per i32 row (same tunnel density as u8)
    data_w = np.zeros((W, BLOCKS4), np.int32)
    for gi, pl_ in enumerate(payloads):
        pad = np.zeros(((len(pl_) + 3) // 4) * 4, np.uint8)
        pad[:len(pl_)] = pl_
        data_w[:len(pad) // 4, gi] = pad.view("<u4").view(np.int32)
    return data_w, lo, dfc, x, out_szs, a_pad, W


def decode_4x8_o0_batch(blocks: List[bytes],
                        interpret: bool = False) -> List[bytes]:
    """Wire-exact rANS 4x8 order-0 decode on device, BLOCKS4 streams
    per pass (the CRAM 3.0 wire; codecs/rans4x8.py is the host
    model)."""
    out: List[bytes] = [b""] * len(blocks)
    L = BLOCKS4 * NWAY4
    for base in range(0, len(blocks), BLOCKS4):
        group = blocks[base:base + BLOCKS4]
        data_w, lo, dfc, x, out_szs, a_pad, W = _prepare_group4(group)
        rounds_needed = max(1, max(out_szs) // NWAY4)   # main rounds
        n_segs = (rounds_needed + SEG4 - 1) // SEG4
        run = _compiled_seg4(W, a_pad, interpret)
        data_j = jnp.asarray(data_w)
        lo_j = jnp.asarray(lo)
        dfc_j = jnp.asarray(dfc)
        x_j = jnp.asarray(x)
        cur_j = jnp.asarray(np.zeros((1, BLOCKS4), np.int32))
        cnt_lane = np.zeros(L, np.int32)
        for b in range(BLOCKS4):
            cnt_lane[b::BLOCKS4] = out_szs[b] // NWAY4
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
            cols = allsym[:nmain, gi::BLOCKS4]     # states 0..3
            stream = np.empty(n, np.uint8)
            stream[:nmain * NWAY4] = cols.reshape(-1).astype(np.uint8)
            if n - nmain * NWAY4:
                # tail: finish states 0..n%4-1 on host from the final
                # kernel state (byte-exact continuation)
                from htslib_tpu.codecs.rans4x8 import _read_freqs
                f, p0 = _read_freqs(data, 9)
                cum = np.zeros(257, np.int64)
                np.cumsum(f, out=cum[1:])
                D = np.repeat(np.arange(256, dtype=np.uint8), f)
                if len(D) < TOTFREQ:
                    D = np.concatenate(
                        [D, np.zeros(TOTFREQ - len(D), np.uint8)])
                arr = np.frombuffer(data, np.uint8)
                ptr = p0 + 16 + int(cur_fin[gi])
                xs = x_fin[gi::BLOCKS4].copy()
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
