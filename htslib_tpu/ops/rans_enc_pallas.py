"""Pallas TPU rANS Nx16 order-0 ENCODE — the device-side compression
half (VERDICT r3 missing #2, r4 task #3: decode-class rate).

Round-5 form, mirroring the decode kernel's measured lessons
(`ops/rans_pallas.py`, scripts/probe_rans_ablate.py): STATE-MAJOR
1024 lanes (32 blocks x 32 states — the dependent chain is
latency-bound, wide interleaving is the throughput lever), symbol
input packed 4 bytes per i32 row, emissions packed 2 u16 words per
i32 row plus 32 mask bits per i32 row, everything accumulated in
aligned tiles (no sub-tile ops, no dynamic scalar slices — encode
needs no window machinery at all: states EMIT rather than consume).

The whole stream runs inside ONE jit (lax.while_loop over segment
kernels, buffers device-resident); the host downloads the packed
word/mask planes once at the end, compacts the per-round emissions
(rounds ascending, lanes in the scalar's descending rotation within
each 32-state group = the scalar processing order), byte-reverses,
and frames the stream: byte-exact vs codecs/rans4x16.py
compress(flags=0x04).

Division is the reciprocal-multiply construction proven in the host
AVX2 tier (rANS_static32x16pr_avx2.c): q = mulhi32(x, rcp) >> shift,
built from 16-bit partial products with explicit carry (Mosaic has no
64-bit multiply).
"""
from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from htslib_tpu.ops.rans_pallas import (NWAY, RANS16_L, TOTFREQ,
                                        _row_fold, _tree_acc)

BLOCKS_E = 32     # 32 x 32 = 1024 lanes
SEG_E = 2048      # rounds per kernel call (multiple of 32)


def _enc_tables(freqs: np.ndarray, a_pad: int):
    """freqs [BLOCKS_E, 256] -> symbol-keyed telescoping tables
    (lo [A, B] = present symbol values; d1/d2 [A, B] = deltas of the two
    packed per-symbol words).  pk1 = rcp32; pk2 = shift | cmpl<<4 |
    bias<<17 (bias = cum, or cum+4095 for f==1 where rcp=2^32-1)."""
    B = freqs.shape[0]
    lo = np.zeros((a_pad, B), np.int64)
    d1 = np.zeros((a_pad, B), np.int64)
    d2 = np.zeros((a_pad, B), np.int64)
    for b in range(B):
        present = np.nonzero(freqs[b])[0]
        if len(present) > a_pad:
            raise ValueError("alphabet exceeds a_pad")
        f = freqs[b][present].astype(np.int64)
        cum = np.zeros(len(present) + 1, np.int64)
        np.cumsum(f, out=cum[1:])
        pk1 = np.zeros(len(present), np.uint64)
        pk2 = np.zeros(len(present), np.uint64)
        for i, (fr, cm) in enumerate(zip(f, cum[:-1])):
            if fr < 2:
                rcp = 0xFFFFFFFF
                shift = 0
                bias = cm + TOTFREQ - 1
            else:
                shift = 0
                while fr > (1 << shift):
                    shift += 1
                rcp = ((1 << (shift + 31)) + fr - 1) // fr
                shift -= 1
                bias = cm
            pk1[i] = rcp
            pk2[i] = shift | ((TOTFREQ - fr) << 4) | (bias << 17)
        dd1 = pk1.copy()
        dd1[1:] = pk1[1:] - pk1[:-1]
        dd2 = pk2.copy()
        dd2[1:] = pk2[1:] - pk2[:-1]
        lo[:len(present), b] = present
        d1[:len(present), b] = dd1.astype(np.int64)
        d2[:len(present), b] = dd2.astype(np.int64)
        lo[len(present):, b] = 256          # above any symbol
    def wrap(a):
        return ((a + (1 << 31)) % (1 << 32) - (1 << 31)).astype(np.int32)
    return lo.astype(np.int32), wrap(d1), wrap(d2)


def _enc_kernel(syms_ref, lo_ref, d1_ref, d2_ref, x_ref, cnt_ref,
                words_ref, mask_ref, x_out_ref):
    """One SEG_E-round encode segment.  syms [SEG_E/4, L] i32 rows
    packing 4 round-symbols per lane (round 4k+i in bits 8i); cnt
    [8, L] remaining symbol count per state; outputs words
    [SEG_E/2, L] (round 2k in bits 0-15) and mask [SEG_E/32, L]
    (bit r of supertile t's 32 rounds in row t)."""
    L = BLOCKS_E * NWAY
    lo = lo_ref[:]
    d1 = d1_ref[:]
    d2 = d2_ref[:]
    A = lo.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (8, L), 0)
    cnt = cnt_ref[:]

    def mulhi32(x, r):
        xu = pltpu.bitcast(x, jnp.uint32)
        ru = pltpu.bitcast(r, jnp.uint32)
        xl = xu & 0xFFFF
        xh = xu >> 16
        rl = ru & 0xFFFF
        rh = ru >> 16
        lo_p = xl * rl
        mid1 = xh * rl
        mid2 = xl * rh
        t = mid1 + (lo_p >> 16)
        t2 = t + mid2
        carry = jnp.where(t2 < mid2, jnp.uint32(1), jnp.uint32(0))
        hi = xh * rh + (t2 >> 16) + (carry << 16)
        return pltpu.bitcast(hi, jnp.int32)

    def one_round(x8, s8):
        # shared-compare double lookup over the symbol-keyed tables
        cmps = [s8 >= lo[ch * 8:ch * 8 + 8] for ch in range(A // 8)]
        pk1 = _row_fold(_tree_acc(
            [jnp.where(cmps[ch], d1[ch * 8:ch * 8 + 8], 0)
             for ch in range(A // 8)]))
        pk2 = _row_fold(_tree_acc(
            [jnp.where(cmps[ch], d2[ch * 8:ch * 8 + 8], 0)
             for ch in range(A // 8)]))
        pk2u = pltpu.bitcast(pk2, jnp.uint32)
        shift = pltpu.bitcast(pk2u & 0xF, jnp.int32)
        cmpl = pltpu.bitcast((pk2u >> 4) & 0x1FFF, jnp.int32)
        bias = pltpu.bitcast(pk2u >> 17, jnp.int32)
        f = TOTFREQ - cmpl
        # x_max = ((L>>12)<<16)*f = f<<19 can hit 2^31: stay unsigned
        x_maxu = pltpu.bitcast(f, jnp.uint32) << 19
        xu = pltpu.bitcast(x8, jnp.uint32)
        need = jnp.where(xu >= x_maxu, jnp.int32(1), jnp.int32(0))
        # emitted word: bytes appended (x>>8)&FF then x&FF -> LE u16
        word = pltpu.bitcast(((xu >> 8) & 0xFF) | ((xu & 0xFF) << 8),
                             jnp.int32)
        x8 = jnp.where(need > 0,
                       pltpu.bitcast(xu >> 16, jnp.int32), x8)
        q = mulhi32(x8, pk1)
        qs = pltpu.bitcast(
            pltpu.bitcast(q, jnp.uint32) >> shift.astype(jnp.uint32),
            jnp.int32)
        x8 = x8 + bias + qs * cmpl
        return x8, word, need

    def body(t, x8):
        # one 32-round supertile: one syms row-tile in, two 8-row
        # word tiles and one mask row out
        stile = pltpu.bitcast(syms_ref[pl.ds(t * 8, 8), :], jnp.uint32)
        mbits = jnp.zeros((8, L), jnp.int32)
        for half in range(2):            # 16 rounds per word-tile store
            wparts = []
            for rr in range(16):
                r = half * 16 + rr
                s8 = _row_fold(jnp.where(
                    row == (r >> 2),
                    pltpu.bitcast((stile >> ((r & 3) * 8)) & 0xFF,
                                  jnp.int32), 0))
                active = (t * 32 + r) < cnt
                x_new, word, need = one_round(x8, s8)
                x8 = jnp.where(active, x_new, x8)
                need = jnp.where(active, need, 0)
                word = jnp.where(need > 0, word, 0)
                # 2 rounds per i32 row: row rr>>1, half-word rr&1
                wparts.append(jnp.where(row == (rr >> 1),
                                        word << ((rr & 1) * 16), 0))
                mbits = mbits + (need << r)
            words_ref[pl.ds(t * 16 + half * 8, 8), :] = sum(wparts)
        # mask: all 32 bits live in every row of mbits (replicated-row
        # values); accumulate one row per supertile, store each 8
        mask_ref[pl.ds(t, 1), :] = jnp.sum(
            jnp.where(row == 0, mbits, 0), axis=0, keepdims=True)
        return x8

    x_out_ref[:] = jax.lax.fori_loop(0, SEG_E // 32, body, x_ref[:])


@functools.lru_cache(maxsize=None)
def _compiled_enc(a_pad: int, interpret: bool = False):
    L = BLOCKS_E * NWAY

    @jax.jit
    def run(syms, lo, d1, d2, x, cnt):
        return pl.pallas_call(
            _enc_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((SEG_E // 2, L), jnp.int32),
                jax.ShapeDtypeStruct((SEG_E // 32, L), jnp.int32),
                jax.ShapeDtypeStruct((8, L), jnp.int32),
            ),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 3),
            interpret=interpret,
        )(syms, lo, d1, d2, x, cnt)

    return run


@functools.lru_cache(maxsize=None)
def _whole_enc(a_pad: int, n_segs: int, interpret: bool = False):
    """Whole-stream encode in ONE jit: fori over segment kernels with
    device-resident symbol input and packed output planes."""
    L = BLOCKS_E * NWAY
    run_seg = _compiled_enc(a_pad, interpret)

    @jax.jit
    def run(syms_all, lo, d1, d2, x, cnt_lane):
        W = jnp.zeros((n_segs * (SEG_E // 2), L), jnp.int32)
        M = jnp.zeros((n_segs * (SEG_E // 32), L), jnp.int32)

        def body(si, carry):
            x_c, W, M = carry
            stile = jax.lax.dynamic_slice(
                syms_all, (si * (SEG_E // 4), 0), (SEG_E // 4, L))
            cnt_seg = jnp.maximum(cnt_lane - si * SEG_E, 0)
            cnt8 = jnp.broadcast_to(cnt_seg[None, :], (8, L))
            w, m, x2 = run_seg(stile, lo, d1, d2, x_c, cnt8)
            W = jax.lax.dynamic_update_slice(W, w, (si * (SEG_E // 2), 0))
            M = jax.lax.dynamic_update_slice(M, m, (si * (SEG_E // 32), 0))
            return x2, W, M

        x_f, W, M = jax.lax.fori_loop(0, n_segs, body, (x, W, M))
        return W, M, x_f

    return run


def encode_nx16_o0_batch(datas: List[bytes],
                         interpret: bool = False,
                         timing: dict = None) -> List[bytes]:
    """Wire-exact rANS Nx16 order-0 32-way ENCODE on device, BLOCKS_E
    streams per pass.  Produces byte-identical streams to
    codecs/rans4x16.py compress(data, 0x04).  `timing` (optional dict)
    receives both the tunnel-inclusive e2e time and the device-resident
    steady-state time (`enc_s`; `enc_resident_s`)."""
    import time

    from htslib_tpu.codecs.rans4x16 import (_norm_freqs,
                                            _write_freq_table, u7_put)

    out: List[bytes] = [b""] * len(datas)
    L = BLOCKS_E * NWAY
    for base in range(0, len(datas), BLOCKS_E):
        group = datas[base:base + BLOCKS_E]
        G = len(group)
        t_all0 = time.time()
        freqs = np.zeros((BLOCKS_E, 256), np.int64)
        for gi, d in enumerate(group):
            if len(d) == 0:
                raise ValueError("empty stream")
            c = np.bincount(np.frombuffer(d, np.uint8), minlength=256)
            freqs[gi] = _norm_freqs(c.astype(np.int64))
        for gi in range(G, BLOCKS_E):
            freqs[gi, 0] = TOTFREQ
        a_max = max(int((freqs[gi] > 0).sum()) for gi in range(BLOCKS_E))
        a_pad = 8
        while a_pad < a_max:
            a_pad <<= 1
        lo_b, d1_b, d2_b = _enc_tables(freqs, a_pad)
        # state-major lanes: tables tile
        lo = np.tile(lo_b, (1, NWAY))
        d1 = np.tile(d1_b, (1, NWAY))
        d2 = np.tile(d2_b, (1, NWAY))

        # symbols in processing order: round t, lane j*BLOCKS_E+gi =
        # the symbol of stream gi, state j, t steps from its end
        lens = [len(d) for d in group] + [0] * (BLOCKS_E - G)
        R = max(1, max((l + NWAY - 1) // NWAY for l in lens))
        n_segs = (R + SEG_E - 1) // SEG_E
        rounds = n_segs * SEG_E
        syms = np.zeros((rounds, L), np.uint8)
        for gi, d in enumerate(group):
            a = np.frombuffer(d, np.uint8)
            for j in range(NWAY):
                col = a[j::NWAY][::-1]       # state j's syms, reversed
                syms[:len(col), j * BLOCKS_E + gi] = col
        # pack 4 rounds per i32 row
        sp = syms.reshape(rounds // 4, 4, L).astype(np.uint32)
        syms_packed = (sp[:, 0] | (sp[:, 1] << 8) | (sp[:, 2] << 16)
                       | (sp[:, 3] << 24)).view(np.int32)
        x = np.full((8, L), RANS16_L, np.uint32).view(np.int32).copy()
        cnt_lane = np.zeros(L, np.int32)
        jj = np.arange(NWAY)
        for gi in range(BLOCKS_E):
            cnt_lane[jj * BLOCKS_E + gi] = np.maximum(
                (lens[gi] - jj + NWAY - 1) // NWAY, 0)

        run = _whole_enc(a_pad, n_segs, interpret)
        args = (jnp.asarray(syms_packed), jnp.asarray(lo),
                jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(x),
                jnp.asarray(cnt_lane))
        Wp, Mp, x_f = run(*args)
        # device-resident steady state (inputs and outputs on device),
        # best-of-3 — instrumentation only, skipped unless the caller
        # asked for timing: single-shot timings swing with host load
        t_res = 0.0
        if timing is not None:
            t_res = None
            for _ in range(3):
                t0 = time.time()
                Wp, Mp, x_f = run(*args)
                int(jnp.sum(x_f[:1, :8]).block_until_ready())
                dt = time.time() - t0
                t_res = dt if t_res is None else min(t_res, dt)
        Wn = np.asarray(Wp).view(np.uint32)
        Mn = np.asarray(Mp).view(np.uint32)
        x_fin = np.asarray(x_f)[0].astype(np.int64) & 0xFFFFFFFF
        if timing is not None:
            timing["enc_resident_s"] = (
                timing.get("enc_resident_s", 0.0) + t_res)
            timing.setdefault("bytes", 0)
            timing["bytes"] += sum(lens)

        # unpack planes PER STREAM (32 lanes at a time — materialising
        # the full [rounds, L] word/mask planes cost more host time
        # than the kernel itself)
        T = rounds // 32
        Wv = Wn.reshape(T, 16, L)
        Mv = Mn.reshape(T, L)
        bits32 = np.arange(32, dtype=np.uint32)

        for gi, d in enumerate(group):
            n = len(d)
            n_rounds = (n + NWAY - 1) // NWAY
            cols = jj * BLOCKS_E + gi            # state-major lanes
            Tn = (n_rounds + 31) // 32
            wv = Wv[:Tn][:, :, cols]             # [Tn, 16, 32]
            w16 = np.empty((Tn, 32, NWAY), np.uint16)
            w16[:, 0::2] = (wv & 0xFFFF).astype(np.uint16)
            w16[:, 1::2] = (wv >> 16).astype(np.uint16)
            w = w16.reshape(Tn * 32, NWAY)[:n_rounds]
            m = (((Mv[:Tn][:, None, cols]
                   >> bits32.reshape(1, 32, 1)) & 1)
                 .astype(bool).reshape(Tn * 32, NWAY)[:n_rounds])
            per_state = np.maximum((n - jj + NWAY - 1) // NWAY, 0)
            rr = np.arange(n_rounds)[:, None]
            m = m & (rr < per_state[None, :])
            # processing order: rounds ascending, lanes in the scalar's
            # i-descending rotation r0, r0-1, ..., 0, 31, ..., r0+1
            # where r0 = (n-1) % 32 (the state of the last symbol)
            r0 = (n - 1) % NWAY
            order = [(r0 - k) % NWAY for k in range(NWAY)]
            w_ord = w[:, order]
            m_ord = m[:, order]
            emitted = w_ord[m_ord].astype(np.uint16)
            body_b = emitted.view(np.uint8).reshape(-1)  # LE: hi, lo
            body_b = body_b[::-1].copy()                 # scalar reverse
            head = bytearray([0x04])
            u7_put(head, n)
            _write_freq_table(head, freqs[gi])
            for j in range(NWAY):
                head += int(x_fin[j * BLOCKS_E + gi]).to_bytes(4, "little")
            out[base + gi] = bytes(head) + body_b.tobytes()
        if timing is not None:
            # 4 device passes ran (1 real + 3 best-of-3 reps): charge
            # e2e for exactly one (the instrumentation is not work)
            timing["enc_s"] = (timing.get("enc_s", 0.0)
                               + (time.time() - t_all0) - 3 * t_res)
    return out
