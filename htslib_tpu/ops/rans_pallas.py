"""Pallas TPU rANS decode kernels: VMEM-table symbol resolution without
gathers (VERDICT r2 task #1 — break the XLA gather-lowering wall).

The measured wall: chained `take_along_axis` lookups run at
~0.03-0.085 G elem/s on this chip because of the XLA gather lowering
(docs/DEVICE_LIMITS.md).  These kernels replace every gather with a
broadcast compare against the cumulative-frequency boundaries held in
VMEM plus ONE masked delta-table reduction:

    slot m;  e = sum_{s: cum[s] <= m} dfc[s]        (telescoping sum)
           = packed[sym]  where packed = (f-1) | c<<12 | sym<<24

The sum runs as a manual binary tree over the sublane axis (jnp.sum
along sublanes lowers sequentially in Mosaic — the tree is ~30 vector
adds).  Measured on the attached v5e (scripts/bench_device.py, recorded
in BENCH's device section / DEVICE_BENCH.json): ~0.35 G lookups/s on
the dependent resolve chain, ~5.7x the XLA gather lowering on the same
shape.  (An earlier draft quoted 6.8 G/s from a mis-scaled element
count; the DEVICE_BENCH numbers are the authoritative measurement.)

Layout (round-5 form; the measured rationale is the round-5 section of
docs/DEVICE_LIMITS.md and scripts/probe_rans_ablate.py): tables on
sublanes [A, lanes]; rANS states on STATE-MAJOR lanes — state j of
block b at lane j*BLOCKS + b — 32 blocks x 32 states = 1024 lanes,
because the per-round dependent-op chain is LATENCY-bound and width is
the throughput lever.  Refill windows pack two LE u16 words per i32
row, reload per 8-round tile as a compact [WINR, BLOCKS] slice
expanded with one pltpu.repeat, and resolve with one-hot selects and
tree-shaped accumulations — no gather anywhere.  Measured 989 MB/s
wire-exact on the v5e (~66% of the op-issue bound at the VMEM-limited
width); the in-kernel-histogram variant (_seg_hist_kernel) feeds the
file-level stats lanes without materialising symbols in HBM.

Wire format: rANS Nx16 order-0, 32-way (CRAM 3.1, cram/cram_io.c:1699
call site; codecs/rans4x16.py is the validated host model).
"""
from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TOTFREQ = 4096
TF_SHIFT = 12
RANS16_L = 1 << 15
NWAY = 32
BLOCKS = 32         # streams decoded per kernel call (32 x 32 = 1024 lanes: the dependent-op chain is LATENCY-bound, so wide interleaving is the main throughput lever — see PROBE_RANS_ABLATE.json)
SEG = 2048          # rounds per kernel call


def pack_tables(freqs: np.ndarray,
                a_pad: int = 256) -> Tuple[np.ndarray, np.ndarray]:
    """freqs [B,256] (sum==TOTFREQ) -> (lo [a_pad,B], dfc [a_pad,B])
    int32 over the PRESENT symbols only: lo[i] = cum at the i-th
    present symbol; dfc telescopes so the masked sum recovers
    (f-1) | c<<12 | sym<<24 at the resolved symbol (int32 wraparound
    keeps the telescoping exact).  Row-compressing to the alphabet is
    the main throughput lever: the per-round table pass is VMEM-traffic
    bound, so cost scales with a_pad (4 bases ~ 16x cheaper than a full
    256-symbol table)."""
    B = freqs.shape[0]
    lo = np.zeros((a_pad, B), np.int64)
    dfc = np.zeros((a_pad, B), np.int64)
    for b in range(B):
        present = np.nonzero(freqs[b])[0]
        if len(present) > a_pad:
            raise ValueError("alphabet exceeds a_pad")
        f = freqs[b][present]
        cum = np.zeros(len(present) + 1, np.int64)
        np.cumsum(f, out=cum[1:])
        fc = ((f - 1) | (cum[:-1] << 12) | (present.astype(np.int64) << 24))
        fc = fc.astype(np.uint32).astype(np.int64)
        d = fc.copy()
        d[1:] = fc[1:] - fc[:-1]
        lo[:len(present), b] = cum[:-1]
        dfc[:len(present), b] = d
        # padding rows: boundaries above any slot, zero delta
        lo[len(present):, b] = TOTFREQ
    dfc = ((dfc + (1 << 31)) % (1 << 32) - (1 << 31)).astype(np.int32)
    return lo.astype(np.int32), dfc.astype(np.int32)


def _tree_sum0(a):
    """Binary-tree reduction over the sublane axis (axis 0)."""
    n = a.shape[0]
    while n > 1:
        h = n // 2
        a = a[:h] + a[h:n]
        n = h
    return a


def _tree_acc(parts):
    """Sum a list of [8, L] tiles as a binary tree: the kernel round is
    LATENCY-bound on its dependent-op chain (probe_rans_ablate), so a
    log2-depth reduction beats the linear accumulate chain."""
    parts = list(parts)
    while len(parts) > 1:
        nxt = [parts[i] + parts[i + 1]
               for i in range(0, len(parts) - 1, 2)]
        if len(parts) % 2:
            nxt.append(parts[-1])
        parts = nxt
    return parts[0]


def _lane_cumsum_exclusive(v):
    """Exclusive cumsum along the lane axis via log2 masked rolls."""
    lanes = v.shape[1]
    idx = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    acc = v
    s = 1
    while s < lanes:
        acc = acc + jnp.where(idx >= s, pltpu.roll(acc, s, axis=1), 0)
        s <<= 1
    return acc - v


def _row_fold(a):
    """Fold the 8 sublane rows of a full-tile [8, L] array so every row
    holds the total (3 circular sublane rolls — full-tile ops only)."""
    a = a + pltpu.roll(a, 4, axis=0)
    a = a + pltpu.roll(a, 2, axis=0)
    return a + pltpu.roll(a, 1, axis=0)


def _resolve8(x8, lo, dfc):
    """One resolve+advance for all lanes on the replicated-row [8, L]
    representation (every op is a full (8,128)-tile op — sub-tile [1,L]
    ops cost ~170 ns each on v5e, ~17x a tile op, so nothing here may
    drop to [1, L]).  lo/dfc are [A, L] with A a multiple of 8; the
    telescoping sum accumulates in 8-row chunks then row-folds."""
    m = x8 & (TOTFREQ - 1)
    A = lo.shape[0]
    e8 = _tree_acc([jnp.where(m >= lo[ch * 8:ch * 8 + 8],
                              dfc[ch * 8:ch * 8 + 8], 0)
                    for ch in range(A // 8)])
    e = _row_fold(e8)                      # rows all equal packed value
    eu = pltpu.bitcast(e, jnp.uint32)
    sym = pltpu.bitcast(eu >> 24, jnp.int32)
    f = pltpu.bitcast(eu & 0xFFF, jnp.int32) + 1
    c = pltpu.bitcast((eu >> 12) & 0xFFF, jnp.int32)
    return sym, f * (x8 >> TF_SHIFT) + m - c


_TILE = 8     # rounds per window reload
_WIN = 256    # window WORDS per block (>= _TILE * NWAY consumption)
_WINR = 136   # window i32 rows: 2 u16 words packed per row (>= 129 =
              # ceil((_WIN+1)/2) for an odd word cursor), 17 8-row chunks
_OTILE = 8    # rounds per aligned output store.  Batching 8 window
              # tiles into one [64, L] store was tried (dynamic-offset
              # stores cost ~1 us, probe_rans_ablate.py) and MEASURED
              # SLOWER at 1024 lanes: holding 64 live [8, L] tiles
              # spills registers, costing more than the saved stores —
              # so _OTILE == _TILE and the tt-loop has one iteration.


def _win_fetch(win, idx, row, log2_per):
    """Fetch one packed sub-item per lane from the window: win rows
    pack 2**log2_per items of (32 >> log2_per) bits each (LE order),
    idx is the per-lane ITEM offset.  One-hot row select with tree
    accumulation + fold, then the intra-row shift — the shared refill
    primitive of every rANS kernel in this family."""
    item_bits = 32 >> log2_per
    rowi = pltpu.bitcast(
        pltpu.bitcast(idx, jnp.uint32) >> log2_per, jnp.int32)
    w8 = _tree_acc([jnp.where(rowi == row + ch * 8,
                              win[ch * 8:ch * 8 + 8], 0)
                    for ch in range(win.shape[0] // 8)])
    packed = pltpu.bitcast(_row_fold(w8), jnp.uint32)
    sh = pltpu.bitcast(
        (idx & ((1 << log2_per) - 1)) * item_bits, jnp.uint32)
    return pltpu.bitcast((packed >> sh) & ((1 << item_bits) - 1),
                         jnp.int32)


def _resolve_stacked(key, lo2, d2):
    """Telescoping resolve over stacked sorted rows: returns (top-byte
    field, f, c) of the packed word (f-1) | c<<12 | top<<24 at the last
    row whose boundary is <= key.  The O0 kernels key by slot with
    top = symbol; the O1 kernels key by ctx_idx*4096 + slot with
    top = dense symbol index."""
    e8 = _tree_acc([jnp.where(key >= lo2[ch * 8:ch * 8 + 8],
                              d2[ch * 8:ch * 8 + 8], 0)
                    for ch in range(lo2.shape[0] // 8)])
    e = pltpu.bitcast(_row_fold(e8), jnp.uint32)
    return (pltpu.bitcast(e >> 24, jnp.int32),
            pltpu.bitcast(e & 0xFFF, jnp.int32) + 1,
            pltpu.bitcast((e >> 12) & 0xFFF, jnp.int32))


def _alpha_select(idx, ad, row):
    """Dense index -> symbol value via the telescoped union alphabet
    (row i's boundary is i itself)."""
    s8 = _tree_acc([jnp.where(idx >= row + ch * 8,
                              ad[ch * 8:ch * 8 + 8], 0)
                    for ch in range(ad.shape[0] // 8)])
    return _row_fold(s8)


def _group_cumsum_exclusive(v, gpos, nway=NWAY, stride=1):
    """Exclusive cumsum along lanes over each group's members,
    restarting at every group boundary (inputs are zero outside their
    group).  Lane layout is STATE-MAJOR: group member j of block b sits
    at lane j*stride + b, so member steps roll by `stride` lanes (the
    layout that makes window expansion a single pltpu.repeat)."""
    acc = v
    s = 1
    while s < nway:
        acc = acc + jnp.where(gpos >= s,
                              pltpu.roll(acc, s * stride, axis=1), 0)
        s <<= 1
    return acc - v


def _group_total(incl, gpos, nway=NWAY, stride=1):
    """Broadcast each group's last-member value (nondecreasing within
    the group) to the whole group via backward max-fill (state-major
    lane layout, stride lanes between members)."""
    v = incl
    s = 1
    while s < nway:
        cand = pltpu.roll(v, v.shape[1] - s * stride, axis=1)
        v = jnp.where(gpos + s < nway, jnp.maximum(v, cand), v)
        s <<= 1
    return v


def _seg_kernel(data_ref, lo_ref, dfc_ref, x_ref, cur_ref,
                out_ref, x_out_ref, cur_out_ref):
    """One SEG-round decode segment.  data [Wp, BLOCKS] i32 rows each
    packing TWO little-endian u16 refill words (word 2k in bits 0-15,
    word 2k+1 in bits 16-31); lo/dfc [A, L]; x [8, L] replicated rows;
    cur [1, BLOCKS] in WORD units.

    Perf notes (measured on v5e; scripts/probe_rans_ablate.py is the
    per-stage breakdown): any op on a sub-tile [1, L] array costs
    ~170 ns (vs ~10-35 ns for a full (8,128)-tile op), a dynamic-offset
    store ~1 us, and the one-hot window select dominates the round
    (55% of it at one word per row), so (a) everything lives on
    replicated-row [8, L] tiles, (b) the window packs two words per
    i32 row to halve the select chunk count, and (c) output rounds
    batch into one aligned [_OTILE, L] store per 8 window tiles."""
    L = BLOCKS * NWAY
    lo = lo_ref[:]
    dfc = dfc_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, L), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, L), 0)
    # STATE-MAJOR lane layout: state j of block b sits at lane
    # j*BLOCKS + b, so pltpu.repeat(win_c, NWAY) lines each block's
    # compact window column up with all of its lanes
    gpos = lane // BLOCKS
    masks = [(lane % BLOCKS) == b for b in range(BLOCKS)]

    def one_round(x8, woff, win):
        """woff here includes each block's cursor parity: it is the
        word offset relative to the window's first PACKED row."""
        sym, x8 = _resolve8(x8, lo, dfc)
        need = (x8 < RANS16_L).astype(jnp.int32)         # [8, L]
        pre = _group_cumsum_exclusive(need, gpos, stride=BLOCKS)
        idx = woff + pre                                 # word offset
        words = _win_fetch(win, idx, row, 1)
        x8 = jnp.where(need > 0, (x8 << 16) | words, x8)
        woff = woff + _group_total(pre + need, gpos, stride=BLOCKS)
        return sym, x8, woff

    def body(t, carry):
        x8 = carry[0]
        par = carry[1]          # [8, L] per-lane cursor parity vector
        curs = carry[2:]
        tiles = []
        new = curs
        for tt in range(_OTILE // _TILE):
            curs_t = new
            # reload each block's window at its packed-row cursor into
            # a COMPACT [_WINR, BLOCKS] tile, then one lane-repeat
            # expansion to [_WINR, L] (the per-block one-hot distribute
            # loop cost O(BLOCKS * _WINR) vector ops — the dominant
            # term at 32 blocks)
            win_c = jnp.concatenate(
                [data_ref[pl.ds(
                    jax.lax.shift_right_logical(curs_t[b], 1), _WINR),
                    b:b + 1] for b in range(BLOCKS)], axis=1)
            win = pltpu.repeat(win_c, NWAY, axis=1)
            woff = par
            for r in range(_TILE):
                sym, x8, woff = one_round(x8, woff, win)
                tiles.append(jnp.where(row == r, sym, 0))
            # woff = parity + consumed words: its low bit is the next
            # tile's parity, and its per-block total advances the
            # scalar row cursors (clamped so corrupt headers cannot
            # push the window slice past the padded data end).  With
            # state-major lanes, block b's group total sits in lane b
            # directly — a scalar extract, not a masked reduction.
            par = woff & 1
            w_max = (data_ref.shape[0] - _WINR) * 2
            new = tuple(jnp.minimum(
                curs_t[b] - (curs_t[b] & 1) + woff[0, b], w_max)
                for b in range(BLOCKS))
        out = jnp.concatenate(
            [sum(tiles[k * 8:(k + 1) * 8][r] for r in range(8))
             for k in range(_OTILE // _TILE)], axis=0)
        out_ref[pl.ds(t * _OTILE, _OTILE), :] = out
        return (x8, par) + new

    curs0 = tuple(cur_ref[0, b] for b in range(BLOCKS))
    par0 = jnp.zeros((8, L), jnp.int32)
    for b in range(BLOCKS):
        par0 = jnp.where(masks[b], cur_ref[0, b] & 1, par0)
    carry = jax.lax.fori_loop(0, SEG // _OTILE, body,
                              (x_ref[:], par0) + curs0)
    x_out_ref[:] = carry[0]
    cur_out_ref[:] = jnp.concatenate(
        [jnp.full((1, 1), carry[2 + b], jnp.int32)
         for b in range(BLOCKS)], axis=1)


def _seg_hist_kernel(qbins, data_ref, lo_ref, dfc_ref, x_ref, cur_ref,
                     ulen_ref, off_ref, base_ref,
                     hist_ref, x_out_ref, cur_out_ref):
    """Decode+HISTOGRAM segment: identical round pipeline to
    _seg_kernel, but symbols accumulate into per-bin register tiles
    instead of a [SEG, L] output — the decoded bytes never exist in
    HBM at all (the XLA one-hot stage they previously fed materialised
    qbins*SEG*L elements per segment and dominated the file-level
    lane's device time).  ulen [8, L] = per-lane stream byte count;
    off [8, L] subtracted before binning; base [1, 1] = absolute round
    index of this segment's first round."""
    L = BLOCKS * NWAY
    lo = lo_ref[:]
    dfc = dfc_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, L), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, L), 0)
    gpos = lane // BLOCKS
    blk = lane % BLOCKS
    ulen8 = ulen_ref[:]
    off8 = off_ref[:]
    base = base_ref[0, 0]

    def one_round(x8, woff, win):
        sym, x8 = _resolve8(x8, lo, dfc)
        need = (x8 < RANS16_L).astype(jnp.int32)
        pre = _group_cumsum_exclusive(need, gpos, stride=BLOCKS)
        idx = woff + pre
        words = _win_fetch(win, idx, row, 1)
        x8 = jnp.where(need > 0, (x8 << 16) | words, x8)
        woff = woff + _group_total(pre + need, gpos, stride=BLOCKS)
        return sym, x8, woff

    def body(t, carry):
        x8 = carry[0]
        par = carry[1]
        hists = carry[2]
        curs = carry[3:]
        win_c = jnp.concatenate(
            [data_ref[pl.ds(
                jax.lax.shift_right_logical(curs[b], 1), _WINR),
                b:b + 1] for b in range(BLOCKS)], axis=1)
        win = pltpu.repeat(win_c, NWAY, axis=1)
        woff = par
        for r in range(_TILE):
            sym, x8, woff = one_round(x8, woff, win)
            pos = (base + t * _TILE + r) * NWAY + gpos
            valid = pos < ulen8
            q = jnp.clip(sym - off8, 0, qbins - 1)
            hists = tuple(
                hists[ch] + jnp.where(valid & (q == row + ch * 8), 1, 0)
                for ch in range(qbins // 8))
        par = woff & 1
        w_max = (data_ref.shape[0] - _WINR) * 2
        new = tuple(jnp.minimum(
            curs[b] - (curs[b] & 1) + woff[0, b], w_max)
            for b in range(BLOCKS))
        return (x8, par, hists) + new

    curs0 = tuple(cur_ref[0, b] for b in range(BLOCKS))
    par0 = jnp.zeros((8, L), jnp.int32)
    for b in range(BLOCKS):
        par0 = jnp.where(blk == b, cur_ref[0, b] & 1, par0)
    hist0 = tuple(jnp.zeros((8, L), jnp.int32)
                  for _ in range(qbins // 8))
    carry = jax.lax.fori_loop(0, SEG // _TILE, body,
                              (x_ref[:], par0, hist0) + curs0)
    x_out_ref[:] = carry[0]
    for ch in range(qbins // 8):
        hist_ref[ch * 8:(ch + 1) * 8, :] = carry[2][ch]
    cur_out_ref[:] = jnp.concatenate(
        [jnp.full((1, 1), carry[3 + b], jnp.int32)
         for b in range(BLOCKS)], axis=1)


@functools.lru_cache(maxsize=None)
def _compiled_seg_hist(a_pad: int, qbins: int = 64,
                       interpret: bool = False):
    L = BLOCKS * NWAY

    @jax.jit
    def run_seg(data, lo, dfc, x, cur, ulen8, off8, base):
        return pl.pallas_call(
            functools.partial(_seg_hist_kernel, qbins),
            out_shape=(
                jax.ShapeDtypeStruct((qbins, L), jnp.int32),
                jax.ShapeDtypeStruct((8, L), jnp.int32),
                jax.ShapeDtypeStruct((1, BLOCKS), jnp.int32),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
            out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 3),
            interpret=interpret,
        )(data, lo, dfc, x, cur, ulen8, off8, base)

    return run_seg


@functools.lru_cache(maxsize=None)
def _compiled_seg(W: int, a_pad: int = 256, interpret: bool = False):
    L = BLOCKS * NWAY

    @jax.jit
    def run_seg(data, lo, dfc, x, cur):
        return pl.pallas_call(
            _seg_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((SEG, L), jnp.int32),
                jax.ShapeDtypeStruct((8, L), jnp.int32),
                jax.ShapeDtypeStruct((1, BLOCKS), jnp.int32),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 3),
            interpret=interpret,
        )(data, lo, dfc, x, cur)

    return run_seg


def decode_nx16_o0_batch(blocks: List[bytes],
                         interpret: bool = False) -> List[bytes]:
    """Wire-exact rANS Nx16 order-0 32-way decode, BLOCKS streams per
    kernel pass, all symbol resolution and byte refill on device.
    `blocks` are full streams including the flag byte (format per
    codecs/rans4x16.py)."""
    from htslib_tpu.codecs.rans4x16 import _read_freq_table, u7_get

    out: List[bytes] = [b""] * len(blocks)
    for base in range(0, len(blocks), BLOCKS):
        group = blocks[base:base + BLOCKS]
        G = len(group)
        freqs = np.zeros((BLOCKS, 256), np.int64)
        states = np.zeros((BLOCKS, NWAY), np.int64)
        payloads: List[np.ndarray] = []
        out_szs = [0] * BLOCKS
        for gi, data in enumerate(group):
            flags = data[0]
            if flags & ~0x04:
                raise ValueError("device Nx16 kernel: plain O0 only")
            if not (flags & 0x04):
                raise ValueError("device Nx16 kernel: 32-way only")
            p = 1
            ulen, p = u7_get(data, p)
            out_szs[gi] = ulen
            f, p = _read_freq_table(data, p)
            if f.sum() != TOTFREQ:
                raise ValueError("unnormalised frequency table")
            freqs[gi] = f
            for j in range(NWAY):
                states[gi, j] = int.from_bytes(data[p:p + 4], "little")
                p += 4
            payloads.append(np.frombuffer(data, np.uint8, len(data) - p, p))
        for gi in range(G, BLOCKS):
            freqs[gi, 0] = TOTFREQ     # degenerate valid table
            states[gi, :] = RANS16_L
            payloads.append(np.zeros(0, np.uint8))

        # row-compress the tables to the group's widest alphabet
        a_max = max(int((freqs[gi] > 0).sum()) for gi in range(BLOCKS))
        a_pad = 8
        while a_pad < a_max:
            a_pad <<= 1                 # power of two for the tree sum
        lo_b, dfc_b = pack_tables(freqs, a_pad)  # [a_pad, BLOCKS]
        L = BLOCKS * NWAY
        # state-major lanes: lane j*BLOCKS + b belongs to (block b,
        # state j) — tables tile, states transpose
        lo = np.tile(lo_b, (1, NWAY))            # [a_pad, L]
        dfc = np.tile(dfc_b, (1, NWAY))
        x = np.broadcast_to(states.T.reshape(1, L), (8, L))\
            .astype(np.uint32).view(np.int32).copy()

        rounds_needed = max(1, (max(out_szs) + NWAY - 1) // NWAY)
        n_segs = (rounds_needed + SEG - 1) // SEG
        max_rows = max((len(p) + 3) // 4 for p in payloads)
        W = max_rows + 2 * _WINR    # window-slice slack past stream end
        # two LE u16 words per i32 row (halves the kernel's select)
        data_w = np.zeros((W, BLOCKS), np.int32)
        for gi, p in enumerate(payloads):
            pad = np.zeros(((len(p) + 3) // 4) * 4, np.uint8)
            pad[:len(p)] = p
            data_w[:len(pad) // 4, gi] = pad.view("<u4").view(np.int32)
        cur = np.zeros((1, BLOCKS), np.int32)

        run = _compiled_seg(W, a_pad, interpret)
        data_j = jnp.asarray(data_w)
        lo_j = jnp.asarray(lo)
        dfc_j = jnp.asarray(dfc)
        x_j = jnp.asarray(x)
        cur_j = jnp.asarray(cur)
        segs = []
        for _ in range(n_segs):
            syms, x_j, cur_j = run(data_j, lo_j, dfc_j, x_j, cur_j)
            segs.append(np.asarray(syms))
        allsym = np.concatenate(segs, axis=0)    # [rounds, L]
        for gi in range(G):
            cols = allsym[:, gi::BLOCKS]         # states 0..NWAY-1
            stream = cols.reshape(-1).astype(np.uint8)
            out[base + gi] = stream[:out_szs[gi]].tobytes()
    return out


# ---------------------------------------------------------------------------
# resolve-rate benchmark kernel (symbol resolution only, the dependent
# chain shape): scripts/bench_device.py records its G-lookups/s
# ---------------------------------------------------------------------------

def make_resolve_bench(G: int = 128, ns: int = 32, rounds: int = 4096,
                       unroll: int = 4, seed: int = 7):
    """Returns (fn, args, ref_chain) where fn runs `rounds` dependent
    resolve+update rounds over [ns, G] states against per-lane VMEM
    tables; ref_chain computes the same chain in numpy for a
    correctness check."""
    rng = np.random.RandomState(seed)
    freqs = rng.randint(1, 64, (G, 256)).astype(np.int64)
    freqs = np.maximum(1, freqs * TOTFREQ // freqs.sum(1, keepdims=True))
    for g in range(G):
        freqs[g, 0] += TOTFREQ - freqs[g].sum()
    lo_T, dfc_T = pack_tables(freqs)             # [256, G]
    x0 = np.broadcast_to(
        rng.randint(1 << 23, 1 << 30, (1, G)), (8, G)).astype(np.int32)

    def kernel(lo_ref, dfc_ref, x_ref, o_ref):
        lo = lo_ref[:]
        dfc = dfc_ref[:]

        def body(r, x):
            for _ in range(unroll):
                _, x = _resolve8(x, lo, dfc)
                x = jnp.where(x < RANS16_L, (x << 16) | 1, x)
            return x

        o_ref[:] = jax.lax.fori_loop(0, rounds // unroll, body, x_ref[:])

    @jax.jit
    def fn(lo, dfc, x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, G), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(lo, dfc, x)

    def ref_chain(nrounds=None):
        cum = np.zeros((G, 257), np.int64)
        np.cumsum(freqs, axis=1, out=cum[:, 1:])
        x = x0.astype(np.int64).copy()
        gi = np.arange(G)
        for _ in range(nrounds or rounds):
            m = x & (TOTFREQ - 1)
            for j in range(ns):
                s = np.array([np.searchsorted(cum[g], m[j, g], "right") - 1
                              for g in range(G)])
                x[j] = (freqs[gi, s] * (x[j] >> TF_SHIFT)
                        + m[j] - cum[gi, s])
        return (x & 0xFFFFFFFF).astype(np.uint32)

    return fn, (jnp.asarray(lo_T), jnp.asarray(dfc_T),
                jnp.asarray(x0)), ref_chain
