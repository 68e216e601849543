"""Pallas TPU rANS Nx16 ORDER-1 decode — the context-modelled mode real
CRAM encoders pick for quality series (VERDICT r4 missing #1; reference
call site cram/cram_io.c:1699, order bit 0x01).

Order-1 needs a per-lane table select (context = the lane's previously
decoded byte), which is a gather — and Mosaic's dynamic_gather lowers
only for 8-row tables at ~7 us/round (measured, probe in round 5).
Instead the context FUSES into the O0 telescoping sum by widening the
key: stack every context's row-compressed table (sorted by context,
then cumulative frequency) and compare against

    key = ctx_idx * 4096 + (x & 4095)       (17 bits)
    e   = sum_{rows: ctx_row*4096 + cum_row <= key} delta_row

— exactly `ops/rans_pallas._resolve8` with A_ctx*A_sym rows.  The
packed word carries (f-1) | cum<<12 | dense_idx<<24 where dense_idx is
the symbol's index in the UNION alphabet (it is both the output symbol
via one small alphabet select and the next round's context index).

Feasibility gate: A_ctx * A_sym rows must fit the chunk budget — the
kernel accepts alphabets up to 64x64 (4096 rows, qualities/bases);
larger alphabets (arbitrary binary data) stay on the host codec.

Wire layout (codecs/rans4x16.py `_dec_core_o1` is the host model):
the stream splits into 32 floor(n/32)-byte contiguous segments, one
state per segment, ctx=0 at segment heads, interleaved 16-bit renorm,
and the tail beyond 32*seg continues on the LAST state (finished on
the host from the returned kernel state).
"""
from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from htslib_tpu.ops.rans_pallas import (RANS16_L, TF_SHIFT, TOTFREQ,
                                        _alpha_select,
                                        _group_cumsum_exclusive,
                                        _group_total, _resolve_stacked,
                                        _row_fold, _tree_acc, _win_fetch)

NWAY = 32
SEG1 = 1024        # rounds per kernel call
_TILE1 = 8
_WINR1 = 136       # packed-pair window rows (as the O0 kernel)
A2_MAX = 4096      # stacked-table row budget (A_ctx * A_sym)


def build_o1_tables(F: np.ndarray, a2_pad: int, a_pad: int):
    """F [256, 256] per-context frequencies (sum 4096 per used ctx) ->
    (lo2, d2 [a2_pad], alpha_d [a_pad], densemap [256], alphabet)
    for ONE stream.  Rows sorted by (ctx_idx, cum); keys are
    ctx_idx*4096 + cum.  alpha_d telescopes symbol values over dense
    indices so sym = sum_{i <= idx} alpha_d[i]."""
    used_ctx = np.nonzero(F.sum(axis=1))[0]
    syms = np.nonzero(F.sum(axis=0))[0]
    # the union index space must cover both contexts and symbols so a
    # decoded symbol's dense index can serve as the next context index
    alphabet = np.union1d(used_ctx, syms).astype(np.int64)
    A = len(alphabet)
    densemap = np.zeros(256, np.int64)
    densemap[alphabet] = np.arange(A)
    if int((F > 0).sum()) > a2_pad or A > a_pad:
        raise ValueError("alphabet too large for the device O1 kernel")
    lo2 = np.full(a2_pad, (1 << 30), np.int64)
    packed = np.zeros(a2_pad, np.int64)
    r = 0
    for ci, ctx in enumerate(alphabet):
        f = F[ctx]
        if f.sum() == 0:
            continue
        cum = 0
        for s in np.nonzero(f)[0]:
            lo2[r] = ci * TOTFREQ + cum
            packed[r] = ((int(f[s]) - 1) | (cum << 12)
                         | (int(densemap[s]) << 24))
            cum += int(f[s])
            r += 1
    d2 = packed.copy()
    d2[1:r] = packed[1:r] - packed[:r - 1]
    d2[r:] = 0
    alpha_d = np.zeros(a_pad, np.int64)
    alpha_d[:A] = alphabet
    alpha_d[1:A] = alphabet[1:] - alphabet[:-1]

    def wrap(a):
        return ((a + (1 << 31)) % (1 << 32) - (1 << 31)).astype(np.int32)

    return (lo2.clip(max=(1 << 30)).astype(np.int32), wrap(d2),
            wrap(alpha_d), densemap, alphabet)


def _make_seg1_kernel(BLOCKS1):
  def _seg1_kernel(data_ref, lo2_ref, d2_ref, ad_ref, x_ref, cur_ref,
                 ctx_ref, cnt_ref, out_ref, x_out_ref, cur_out_ref,
                 ctx_out_ref):
    L = BLOCKS1 * NWAY
    lo2 = lo2_ref[:]
    d2 = d2_ref[:]
    ad = ad_ref[:]
    A2 = lo2.shape[0]
    A = ad.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, L), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, L), 0)
    gpos = lane // BLOCKS1
    blk = lane % BLOCKS1
    cnt = cnt_ref[:]

    def one_round(x8, ctxd, woff, win, active):
        key = ctxd * TOTFREQ + (x8 & (TOTFREQ - 1))
        idx, f, c = _resolve_stacked(key, lo2, d2)
        m = x8 & (TOTFREQ - 1)
        x_new = f * (x8 >> TF_SHIFT) + m - c
        # symbol value from the dense index: telescoped alphabet
        # (row i's boundary is i itself, so sum_{i<=idx} alpha_d[i])
        sym = _alpha_select(idx, ad, row)
        x8 = jnp.where(active, x_new, x8)
        ctxd = jnp.where(active, idx, ctxd)
        # refill (identical to the O0 kernel's packed-pair window)
        need = jnp.where(active & (x8 < RANS16_L), 1, 0)
        pre = _group_cumsum_exclusive(need, gpos, NWAY, stride=BLOCKS1)
        widx = woff + pre
        words = _win_fetch(win, widx, row, 1)
        x8 = jnp.where(need > 0, (x8 << 16) | words, x8)
        woff = woff + _group_total(pre + need, gpos, NWAY,
                                   stride=BLOCKS1)
        return sym, x8, ctxd, woff

    def body(t, carry):
        x8, ctxd, par = carry[0], carry[1], carry[2]
        curs = carry[3:]
        win_c = jnp.concatenate(
            [data_ref[pl.ds(
                jax.lax.shift_right_logical(curs[b], 1), _WINR1),
                b:b + 1] for b in range(BLOCKS1)], axis=1)
        win = pltpu.repeat(win_c, NWAY, axis=1)
        woff = par
        tiles = []
        for r in range(_TILE1):
            active = (t * _TILE1 + r) < cnt
            sym, x8, ctxd, woff = one_round(x8, ctxd, woff, win, active)
            tiles.append(jnp.where(row == r, sym, 0))
        out_ref[pl.ds(t * _TILE1, _TILE1), :] = sum(tiles)
        par = woff & 1
        w_max = (data_ref.shape[0] - _WINR1) * 2
        new = tuple(jnp.minimum(
            curs[b] - (curs[b] & 1) + woff[0, b], w_max)
            for b in range(BLOCKS1))
        return (x8, ctxd, par) + new

    curs0 = tuple(cur_ref[0, b] for b in range(BLOCKS1))
    par0 = jnp.zeros((8, L), jnp.int32)
    for b in range(BLOCKS1):
        par0 = jnp.where(blk == b, cur_ref[0, b] & 1, par0)
    carry = jax.lax.fori_loop(0, SEG1 // _TILE1, body,
                              (x_ref[:], ctx_ref[:], par0) + curs0)
    x_out_ref[:] = carry[0]
    ctx_out_ref[:] = carry[1]
    cur_out_ref[:] = jnp.concatenate(
        [jnp.full((1, 1), carry[3 + b], jnp.int32)
         for b in range(BLOCKS1)], axis=1)
  return _seg1_kernel


def _make_seg1_hist_kernel(BLOCKS1, qbins):
    """Decode+HISTOGRAM variant of the O1 segment kernel: symbols
    accumulate into per-bin register tiles (no [SEG1, L] output, no
    XLA one-hot stage — the file-level lane's dominant overhead)."""
    def _seg1_hist(data_ref, lo2_ref, d2_ref, ad_ref, x_ref, cur_ref,
                   ctx_ref, cnt_ref, hist_ref, x_out_ref, cur_out_ref,
                   ctx_out_ref):
        L = BLOCKS1 * NWAY
        lo2 = lo2_ref[:]
        d2 = d2_ref[:]
        ad = ad_ref[:]
        A2 = lo2.shape[0]
        A = ad.shape[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, L), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (8, L), 0)
        gpos = lane // BLOCKS1
        blk = lane % BLOCKS1
        cnt = cnt_ref[:]

        def one_round(x8, ctxd, woff, win, active):
            key = ctxd * TOTFREQ + (x8 & (TOTFREQ - 1))
            idx, f, c = _resolve_stacked(key, lo2, d2)
            m = x8 & (TOTFREQ - 1)
            x_new = f * (x8 >> TF_SHIFT) + m - c
            sym = _alpha_select(idx, ad, row)
            x8 = jnp.where(active, x_new, x8)
            ctxd = jnp.where(active, idx, ctxd)
            need = jnp.where(active & (x8 < RANS16_L), 1, 0)
            pre = _group_cumsum_exclusive(need, gpos, NWAY,
                                          stride=BLOCKS1)
            widx = woff + pre
            words = _win_fetch(win, widx, row, 1)
            x8 = jnp.where(need > 0, (x8 << 16) | words, x8)
            woff = woff + _group_total(pre + need, gpos, NWAY,
                                       stride=BLOCKS1)
            return sym, x8, ctxd, woff

        def body(t, carry):
            x8, ctxd, par = carry[0], carry[1], carry[2]
            hists = carry[3]
            curs = carry[4:]
            win_c = jnp.concatenate(
                [data_ref[pl.ds(
                    jax.lax.shift_right_logical(curs[b], 1), _WINR1),
                    b:b + 1] for b in range(BLOCKS1)], axis=1)
            win = pltpu.repeat(win_c, NWAY, axis=1)
            woff = par
            for r in range(_TILE1):
                active = (t * _TILE1 + r) < cnt
                sym, x8, ctxd, woff = one_round(x8, ctxd, woff, win,
                                                active)
                q = jnp.clip(sym, 0, qbins - 1)
                hists = tuple(
                    hists[ch] + jnp.where(
                        active & (q == row + ch * 8), 1, 0)
                    for ch in range(qbins // 8))
            par = woff & 1
            w_max = (data_ref.shape[0] - _WINR1) * 2
            new = tuple(jnp.minimum(
                curs[b] - (curs[b] & 1) + woff[0, b], w_max)
                for b in range(BLOCKS1))
            return (x8, ctxd, par, hists) + new

        curs0 = tuple(cur_ref[0, b] for b in range(BLOCKS1))
        par0 = jnp.zeros((8, L), jnp.int32)
        for b in range(BLOCKS1):
            par0 = jnp.where(blk == b, cur_ref[0, b] & 1, par0)
        hist0 = tuple(jnp.zeros((8, L), jnp.int32)
                      for _ in range(qbins // 8))
        carry = jax.lax.fori_loop(0, SEG1 // _TILE1, body,
                                  (x_ref[:], ctx_ref[:], par0, hist0)
                                  + curs0)
        x_out_ref[:] = carry[0]
        ctx_out_ref[:] = carry[1]
        for ch in range(qbins // 8):
            hist_ref[ch * 8:(ch + 1) * 8, :] = carry[3][ch]
        cur_out_ref[:] = jnp.concatenate(
            [jnp.full((1, 1), carry[4 + b], jnp.int32)
             for b in range(BLOCKS1)], axis=1)
    return _seg1_hist


@functools.lru_cache(maxsize=None)
def _compiled_seg1_hist(a2_pad: int, a_pad: int, BLOCKS1: int,
                        qbins: int = 64, interpret: bool = False):
    L = BLOCKS1 * NWAY

    @jax.jit
    def run_seg(data, lo2, d2, ad, x, cur, ctx, cnt):
        return pl.pallas_call(
            _make_seg1_hist_kernel(BLOCKS1, qbins),
            out_shape=(
                jax.ShapeDtypeStruct((qbins, L), jnp.int32),
                jax.ShapeDtypeStruct((8, L), jnp.int32),
                jax.ShapeDtypeStruct((1, BLOCKS1), jnp.int32),
                jax.ShapeDtypeStruct((8, L), jnp.int32),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
            out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 4),
            interpret=interpret,
        )(data, lo2, d2, ad, x, cur, ctx, cnt)

    return run_seg


def pick_width(a2_pad: int) -> int:
    """Kernel width (blocks of 32 states) vs stacked-table height: the
    [a2_pad, L] tables x2 must fit VMEM next to the window and output
    tiles.  Sparse real-data tables (few symbols per context) get the
    full 1024 lanes."""
    if a2_pad <= 512:
        return 32
    if a2_pad <= 1024:
        return 16
    return 8


@functools.lru_cache(maxsize=None)
def _compiled_seg1(a2_pad: int, a_pad: int, BLOCKS1: int,
                   interpret: bool = False):
    L = BLOCKS1 * NWAY

    @jax.jit
    def run_seg(data, lo2, d2, ad, x, cur, ctx, cnt):
        return pl.pallas_call(
            _make_seg1_kernel(BLOCKS1),
            out_shape=(
                jax.ShapeDtypeStruct((SEG1, L), jnp.int32),
                jax.ShapeDtypeStruct((8, L), jnp.int32),
                jax.ShapeDtypeStruct((1, BLOCKS1), jnp.int32),
                jax.ShapeDtypeStruct((8, L), jnp.int32),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
            out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 4),
            interpret=interpret,
        )(data, lo2, d2, ad, x, cur, ctx, cnt)

    return run_seg


def _parse_o1_header(data: bytes):
    """Parse an Nx16 ORDER-1 32-way stream (flags already checked):
    returns (n_out, F [256,256], states [32], payload ndarray)."""
    from htslib_tpu.codecs.rans4x16 import (_read_alphabet,
                                            _read_freq_table, u7_get)
    flags = data[0]
    if flags & ~0x05 or not (flags & 0x04) or not (flags & 0x01):
        raise ValueError("device O1 kernel: plain 32-way O1 only")
    p = 1
    ulen, p = u7_get(data, p)
    tlen, p = u7_get(data, p)
    tab = data[p:p + tlen]
    p += tlen
    tp = 0
    ctxs, tp = _read_alphabet(tab, tp)
    F = np.zeros((256, 256), np.int64)
    for ctx in ctxs:
        F[ctx], tp = _read_freq_table(tab, tp)
    states = np.zeros(NWAY, np.int64)
    for j in range(NWAY):
        states[j] = int.from_bytes(data[p:p + 4], "little")
        p += 4
    payload = np.frombuffer(data, np.uint8, len(data) - p, p)
    return ulen, F, states, payload


def o1_pads(parsed) -> Tuple[int, int]:
    """(a2_pad, a_pad) covering a list of parsed O1 streams."""
    a2_pad = 8
    a_pad = 8
    for ulen, F, states, payload in parsed:
        used_ctx = np.nonzero(F.sum(axis=1))[0]
        syms = np.nonzero(F.sum(axis=0))[0]
        A = len(np.union1d(used_ctx, syms))
        while a_pad < A:
            a_pad <<= 1
        # stacked rows = PRESENT (ctx, sym) pairs, not A*A: real
        # context-modelled data is sparse (few symbols per context),
        # which is exactly what makes the O1 select affordable
        nrows = int((F > 0).sum())
        while a2_pad < nrows:
            a2_pad <<= 1
    if a2_pad > A2_MAX:
        raise ValueError("alphabet too large for the device O1 kernel")
    return a2_pad, a_pad


def _prepare_group_o1(group: List[bytes], BLOCKS1: int,
                      a2_pad: int, a_pad: int, parsed=None):
    L = BLOCKS1 * NWAY
    if parsed is None:
        parsed = [_parse_o1_header(d) for d in group]
    lo2 = np.zeros((a2_pad, BLOCKS1), np.int32)
    d2 = np.zeros((a2_pad, BLOCKS1), np.int32)
    ad = np.zeros((a_pad, BLOCKS1), np.int32)
    states_all = np.zeros((BLOCKS1, NWAY), np.int64)
    payloads = []
    out_szs = [0] * BLOCKS1
    maps = []
    for gi in range(BLOCKS1):
        if gi < len(parsed):
            ulen, F, states, payload = parsed[gi]
            l2, dd2, add, densemap, alphabet = build_o1_tables(
                F, a2_pad, a_pad)
            lo2[:, gi] = l2
            d2[:, gi] = dd2
            ad[:, gi] = add
            out_szs[gi] = ulen
            states_all[gi] = states
            payloads.append(payload)
            maps.append((densemap, alphabet))
        else:
            lo2[0, gi] = 0
            d2[0, gi] = (TOTFREQ - 1)      # degenerate: f=4096, idx 0
            lo2[1:, gi] = 1 << 30
            states_all[gi] = RANS16_L
            payloads.append(np.zeros(0, np.uint8))
            maps.append((np.zeros(256, np.int64),
                         np.zeros(1, np.int64)))
    lo2_t = np.tile(lo2, (1, NWAY))
    d2_t = np.tile(d2, (1, NWAY))
    ad_t = np.tile(ad, (1, NWAY))
    x = np.broadcast_to(states_all.T.reshape(1, L), (8, L)) \
        .astype(np.uint32).view(np.int32).copy()
    max_rows = max((len(p) + 3) // 4 for p in payloads)
    W = max_rows + 2 * _WINR1
    data_w = np.zeros((W, BLOCKS1), np.int32)
    for gi, p_ in enumerate(payloads):
        pad = np.zeros(((len(p_) + 3) // 4) * 4, np.uint8)
        pad[:len(p_)] = p_
        data_w[:len(pad) // 4, gi] = pad.view("<u4").view(np.int32)
    return (data_w, lo2_t, d2_t, ad_t, x, out_szs, W, maps, parsed)


def decode_nx16_o1_batch(blocks: List[bytes],
                         interpret: bool = False) -> List[bytes]:
    """Wire-exact rANS Nx16 ORDER-1 32-way decode on device (host
    model: codecs/rans4x16._dec_core_o1).  Segments run on chip; the
    <=31-byte tail continues on the host from the returned state."""
    out: List[bytes] = [b""] * len(blocks)
    all_parsed = [_parse_o1_header(d) for d in blocks]
    a2_pad, a_pad = o1_pads(all_parsed)
    BLOCKS1 = pick_width(a2_pad)
    L = BLOCKS1 * NWAY
    for base in range(0, len(blocks), BLOCKS1):
        group = blocks[base:base + BLOCKS1]
        (data_w, lo2, d2, ad, x, out_szs, W, maps,
         parsed) = _prepare_group_o1(
            group, BLOCKS1, a2_pad, a_pad,
            all_parsed[base:base + BLOCKS1])
        segs_rounds = [n // NWAY for n in out_szs]
        rounds_needed = max(1, max(segs_rounds))
        n_segs = (rounds_needed + SEG1 - 1) // SEG1
        run = _compiled_seg1(a2_pad, a_pad, BLOCKS1, interpret)
        data_j = jnp.asarray(data_w)
        lo2_j = jnp.asarray(lo2)
        d2_j = jnp.asarray(d2)
        ad_j = jnp.asarray(ad)
        x_j = jnp.asarray(x)
        cur_j = jnp.asarray(np.zeros((1, BLOCKS1), np.int32))
        ctx_j = jnp.asarray(np.zeros((8, L), np.int32))
        cnt_lane = np.zeros(L, np.int32)
        for b in range(BLOCKS1):
            cnt_lane[b::BLOCKS1] = segs_rounds[b]
        segs = []
        for si in range(n_segs):
            cnt_seg = np.broadcast_to(
                np.maximum(cnt_lane - si * SEG1, 0)[None, :],
                (8, L)).astype(np.int32).copy()
            syms, x_j, cur_j, ctx_j = run(
                data_j, lo2_j, d2_j, ad_j, x_j, cur_j, ctx_j,
                jnp.asarray(cnt_seg))
            segs.append(np.asarray(syms))
        allsym = np.concatenate(segs, axis=0)
        x_fin = np.asarray(x_j)[0].astype(np.int64) & 0xFFFFFFFF
        cur_fin = np.asarray(cur_j)[0]
        for gi in range(len(group)):
            n = out_szs[gi]
            seg = n // NWAY
            cols = allsym[:seg, gi::BLOCKS1]     # [seg, 32] states
            stream = np.empty(n, np.uint8)
            # O1 layout: state j owns contiguous positions j*seg+r
            stream[:NWAY * seg] = cols.T.reshape(-1).astype(np.uint8)
            if n - NWAY * seg:
                # tail on the LAST state, ctx = its last symbol
                ulen, F, states, payload = parsed[gi]
                C = np.zeros((256, 256), np.int64)
                for ctx in range(256):
                    C[ctx, 1:] = np.cumsum(F[ctx][:-1])
                sym_of = {}
                xs = int(x_fin[(NWAY - 1) * BLOCKS1 + gi])
                ptr = int(cur_fin[gi]) * 2
                ctx = int(stream[NWAY * seg - 1]) if seg else 0
                for i in range(NWAY * seg, n):
                    m = xs & (TOTFREQ - 1)
                    if ctx not in sym_of:
                        so = np.zeros(TOTFREQ, np.uint8)
                        for s in np.nonzero(F[ctx])[0]:
                            so[C[ctx, s]:C[ctx, s] + F[ctx, s]] = s
                        sym_of[ctx] = so
                    s = int(sym_of[ctx][m])
                    stream[i] = s
                    xs = (int(F[ctx, s]) * (xs >> TF_SHIFT)
                          + m - int(C[ctx, s]))
                    while xs < RANS16_L and ptr + 2 <= len(payload):
                        xs = ((xs << 16) | int(payload[ptr])
                              | (int(payload[ptr + 1]) << 8))
                        ptr += 2
                    ctx = s
            out[base + gi] = stream.tobytes()
    return out
