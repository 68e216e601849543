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

Layout: symbols on sublanes [256, lanes]; rANS states on lanes.  The
full Nx16 order-0 decoder packs BLOCKS=4 independent streams x 32
interleaved states into the 128 lanes; byte refill reads a 32-word
window per block at its scalar cursor (one dynamic slice each) and
distributes words to renormalising states with a 32-way one-hot select
— no gather anywhere.

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
BLOCKS = 4          # streams decoded per kernel call (4 x 32 = 128 lanes)
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
    e8 = None
    for ch in range(A // 8):
        sl = slice(ch * 8, ch * 8 + 8)
        w = jnp.where(m >= lo[sl], dfc[sl], 0)
        e8 = w if e8 is None else e8 + w
    e = _row_fold(e8)                      # rows all equal packed value
    eu = pltpu.bitcast(e, jnp.uint32)
    sym = pltpu.bitcast(eu >> 24, jnp.int32)
    f = pltpu.bitcast(eu & 0xFFF, jnp.int32) + 1
    c = pltpu.bitcast((eu >> 12) & 0xFFF, jnp.int32)
    return sym, f * (x8 >> TF_SHIFT) + m - c


_TILE = 8     # rounds per aligned output-tile store / window reload
_WIN = 256    # window words per block (>= _TILE * NWAY consumption)


def _group_cumsum_exclusive(v, gpos, nway=NWAY):
    """Exclusive cumsum along lanes, restarting at every nway-lane
    group boundary (inputs are zero outside their group)."""
    acc = v
    s = 1
    while s < nway:
        acc = acc + jnp.where(gpos >= s, pltpu.roll(acc, s, axis=1), 0)
        s <<= 1
    return acc - v


def _group_total(incl, gpos, nway=NWAY):
    """Broadcast each nway-lane group's last-lane value (nondecreasing
    within the group) to the whole group via backward max-fill."""
    v = incl
    s = 1
    while s < nway:
        cand = pltpu.roll(v, v.shape[1] - s, axis=1)   # circular -s
        v = jnp.where(gpos + s < nway, jnp.maximum(v, cand), v)
        s <<= 1
    return v


def _seg_kernel(data_ref, lo_ref, dfc_ref, x_ref, cur_ref,
                out_ref, x_out_ref, cur_out_ref):
    """One SEG-round decode segment.  data [W, BLOCKS] i32 u16-words;
    lo/dfc [A, L]; x [8, L] replicated rows; cur [1, BLOCKS].

    Perf notes (measured on v5e): any op on a sub-tile [1, L] array
    costs ~170 ns (vs ~10 ns for a full (8,128)-tile op) and a dynamic
    sub-tile store ~8 us, so the whole round pipeline lives on
    replicated-row [8, L] tiles, output rounds accumulate into one
    aligned [8, L] tile store, and the refill window reloads once per
    tile with all bookkeeping vectorised."""
    L = BLOCKS * NWAY
    lo = lo_ref[:]
    dfc = dfc_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, L), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, L), 0)
    gpos = lane % NWAY
    masks = [(lane >= b * NWAY) & (lane < (b + 1) * NWAY)
             for b in range(BLOCKS)]

    def one_round(x8, woff, win):
        sym, x8 = _resolve8(x8, lo, dfc)
        need = (x8 < RANS16_L).astype(jnp.int32)         # [8, L]
        pre = _group_cumsum_exclusive(need, gpos)
        idx = woff + pre                                 # in [0, _WIN)
        w8 = None
        for ch in range(_WIN // 8):
            sl = slice(ch * 8, ch * 8 + 8)
            hit = jnp.where(idx == row + ch * 8, win[sl], 0)
            w8 = hit if w8 is None else w8 + hit
        words = _row_fold(w8)
        x8 = jnp.where(need > 0, (x8 << 16) | words, x8)
        woff = woff + _group_total(pre + need, gpos)
        return sym, x8, woff

    def body(t, carry):
        x8 = carry[0]
        curs = carry[1:]
        # reload each block's window at its cursor (1 slice per block
        # per tile; consumption <= _TILE * NWAY = _WIN)
        win = jnp.zeros((_WIN, L), jnp.int32)
        for b in range(BLOCKS):
            win_b = data_ref[pl.ds(curs[b], _WIN), b:b + 1]   # [_WIN, 1]
            win = jnp.where((jax.lax.broadcasted_iota(
                jnp.int32, (_WIN, L), 1) // NWAY) == b, win_b, win)
        woff = jnp.zeros((8, L), jnp.int32)
        tile = jnp.zeros((8, L), jnp.int32)
        for r in range(_TILE):
            sym, x8, woff = one_round(x8, woff, win)
            tile = jnp.where(row == r, sym, tile)
        out_ref[pl.ds(t * _TILE, _TILE), :] = tile
        # advance cursors (clamped so corrupt headers cannot push the
        # window slice past the padded data end)
        w_max = data_ref.shape[0] - _WIN
        new = tuple(jnp.minimum(
            curs[b] + jnp.sum(jnp.where(masks[b], woff, 0)) // (8 * NWAY),
            w_max) for b in range(BLOCKS))
        return (x8,) + new

    curs0 = tuple(cur_ref[0, b] for b in range(BLOCKS))
    carry = jax.lax.fori_loop(0, SEG // _TILE, body,
                              (x_ref[:],) + curs0)
    x_out_ref[:] = carry[0]
    cur_out_ref[:] = jnp.concatenate(
        [jnp.full((1, 1), carry[1 + b], jnp.int32)
         for b in range(BLOCKS)], axis=1)


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
        lo = np.repeat(lo_b, NWAY, axis=1)       # [256, L]
        dfc = np.repeat(dfc_b, NWAY, axis=1)
        x = np.broadcast_to(states.reshape(1, L), (8, L))\
            .astype(np.uint32).view(np.int32).copy()

        rounds_needed = max(1, (max(out_szs) + NWAY - 1) // NWAY)
        n_segs = (rounds_needed + SEG - 1) // SEG
        max_words = max((len(p) + 1) // 2 for p in payloads)
        W = max_words + 2 * _WIN    # window-slice slack past stream end
        data_w = np.zeros((W, BLOCKS), np.int32)
        for gi, p in enumerate(payloads):
            pad = np.zeros(((len(p) + 1) // 2) * 2, np.uint8)
            pad[:len(p)] = p
            data_w[:len(pad) // 2, gi] = pad.view("<u2").astype(np.int32)
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
            cols = allsym[:, gi * NWAY:(gi + 1) * NWAY]
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
