"""Pallas canonical-Huffman symbol resolution without gathers — the
DEFLATE half of breaking the XLA gather wall (VERDICT r2 task #1;
reference hot path bgzf.c:730/1004 -> inflate Huffman decode).

Canonical decode over a 15-bit window v (MSB-justified code prefix):

    l*   = 1 + #{ l : v >= limit[l] },  limit[l] = (first[l]+count[l])
                                                    << (15-l)   (monotone)
    off  = (v >> (15-l*)) - first[l*]
    idx  = sym_base[l*] + off
    sym  = order[idx]

Every step is gatherless on TPU: l* is a sum of 15 broadcast compares,
first/sym_base resolve through 15-row one-hots, the per-lane variable
shift is a native VPU op, and the order[] permutation lookup uses the
same telescoping delta-table sum as ops/rans_pallas.py (value[idx] =
prefix-sum of diffs, exact under int32 wraparound).  All state lives on
replicated-row (8,128) tiles (sub-tile ops cost ~17x — see
docs/DEVICE_LIMITS.md round-3 findings).

This module ships the measured *resolve primitive* (the per-symbol
inner loop); full wire inflate stays on the validated XLA path
(ops/inflate.py) / native host path.
"""
from __future__ import annotations

import numpy as np

MAXBITS = 15
NSYM_PAD = 320     # >= 288 litlen symbols, multiple of 8


def build_tables(code_lens: np.ndarray):
    """code_lens [L_streams, nsym] -> per-stream canonical tables:
    limits [16, L] int32 (monotone, limit[15] forced to 2^15),
    first/sym_base one-hot tables [16, L], and the order permutation
    delta table dord [NSYM_PAD, L] for the telescoping lookup."""
    Ls, nsym = code_lens.shape
    limits = np.full((16, Ls), 1 << MAXBITS, np.int64)
    firsts = np.zeros((16, Ls), np.int64)
    bases = np.zeros((16, Ls), np.int64)
    dord = np.zeros((NSYM_PAD, Ls), np.int64)
    for s in range(Ls):
        lens = code_lens[s]
        cnt = np.bincount(lens, minlength=MAXBITS + 1)
        cnt[0] = 0
        code = 0
        first = np.zeros(MAXBITS + 1, np.int64)
        for l in range(1, MAXBITS + 1):
            code = (code + cnt[l - 1]) << 1
            first[l] = code
        sym_base = np.cumsum(cnt) - cnt
        order = np.argsort(np.where(lens > 0, lens * 1024
                                    + np.arange(nsym), 1 << 30),
                           kind="stable")
        for l in range(1, MAXBITS + 1):
            limits[l - 1, s] = min((first[l] + cnt[l]) << (MAXBITS - l),
                                   1 << MAXBITS)
            firsts[l - 1, s] = first[l]
            bases[l - 1, s] = sym_base[l]
        ordv = np.zeros(NSYM_PAD, np.int64)
        ordv[:nsym] = order
        d = ordv.copy()
        d[1:] = ordv[1:] - ordv[:-1]
        dord[:, s] = d
    dord = ((dord + (1 << 31)) % (1 << 32) - (1 << 31))
    return (limits.astype(np.int32), firsts.astype(np.int32),
            bases.astype(np.int32), dord.astype(np.int32))


def resolve_ref(v: np.ndarray, limits, firsts, bases, dord) -> np.ndarray:
    """Numpy model of the kernel's resolve (per-lane)."""
    Ls = v.shape[0]
    out = np.zeros(Ls, np.int64)
    ord_tbl = np.cumsum(dord.astype(np.int64), axis=0) & 0xFFFFFFFF
    for s in range(Ls):
        l = 1 + int((v[s] >= limits[:MAXBITS, s]).sum())
        off = (v[s] >> (MAXBITS - l)) - firsts[l - 1, s]
        idx = bases[l - 1, s] + off
        out[s] = ord_tbl[idx, s]
    return out


def make_huffman_resolve_bench(L: int = 128, rounds: int = 4096,
                               unroll: int = 4, seed: int = 3):
    """(fn, args, ref_step): fn runs `rounds` dependent resolve rounds
    over L parallel streams with per-stream VMEM tables; ref_step is
    one numpy round for correctness checks."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from htslib_tpu.ops.rans_pallas import _row_fold

    rng = np.random.RandomState(seed)
    # random complete-ish code length sets (fixed-Huffman-like mix)
    lens = np.zeros((L, 288), np.int64)
    lens[:, :144] = 8
    lens[:, 144:256] = 9
    lens[:, 256:280] = 7
    lens[:, 280:288] = 8
    # shuffle some symbols per stream for per-stream tables
    for s in range(L):
        p = rng.permutation(288)
        lens[s] = lens[s][p]
    limits, firsts, bases, dord = build_tables(lens)

    v0 = rng.randint(0, 1 << MAXBITS, (1, L)).astype(np.int32)
    v0 = np.broadcast_to(v0, (8, L)).copy()

    def step_math(v, sym):
        # synthetic dependency: next window mixes the symbol back in
        return ((v * 5 + sym * 40503) >> 7) & ((1 << MAXBITS) - 1)

    def kernel(lim_ref, first_ref, base_ref, dord_ref, v_ref, o_ref):
        lim = lim_ref[:]
        first = first_ref[:]
        base = base_ref[:]
        dord = dord_ref[:]
        l_iota = jax.lax.broadcasted_iota(jnp.int32, (16, L), 0)
        row = jax.lax.broadcasted_iota(jnp.int32, (8, L), 0)

        def resolve(v):
            # l* = 1 + #(v >= limit_l): 2 tile-compares (16 rows)
            ge = jnp.where(v[0:8] >= lim[0:8], 1, 0) \
                + jnp.where(v[0:8] >= lim[8:16], 1, 0)
            nl = _row_fold(ge)                       # [8,L] all rows = sum
            lstar = 1 + nl
            # one-hot select of first/sym_base at l*
            oh_lo = jnp.where(l_iota[0:8] == lstar - 1, 1, 0)
            oh_hi = jnp.where(l_iota[8:16] == lstar - 1, 1, 0)
            fsel = _row_fold(oh_lo * first[0:8] + oh_hi * first[8:16])
            bsel = _row_fold(oh_lo * base[0:8] + oh_hi * base[8:16])
            code = jax.lax.shift_right_logical(v, MAXBITS - lstar)
            idx = bsel + code - fsel                 # [8,L] in [0,NSYM_PAD)
            # telescoping permutation lookup in 8-row chunks
            acc = None
            for ch in range(NSYM_PAD // 8):
                sl = slice(ch * 8, ch * 8 + 8)
                w = jnp.where(idx >= row + ch * 8, dord[sl], 0)
                acc = w if acc is None else acc + w
            sym = _row_fold(acc)
            return sym, lstar

        def body(r, v):
            for _ in range(unroll):
                sym, lstar = resolve(v)
                v = step_math(v, sym)
            return v

        o_ref[:] = jax.lax.fori_loop(0, rounds // unroll, body, v_ref[:])

    @jax.jit
    def fn(lim, first, base, dord, v):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, L), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(lim, first, base, dord, v)

    def ref_step(v):
        sym = resolve_ref(v.astype(np.int64), limits, firsts, bases, dord)
        return (((v.astype(np.int64) * 5 + sym * 40503) >> 7)
                & ((1 << MAXBITS) - 1)).astype(np.int32), sym

    import jax.numpy as jnp2
    args = (jnp2.asarray(limits), jnp2.asarray(firsts),
            jnp2.asarray(bases), jnp2.asarray(dord), jnp2.asarray(v0))
    return fn, args, ref_step, v0
