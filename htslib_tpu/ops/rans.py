"""Device rANS decode over block batches: 4x8 order-0/1 and Nx16
order-0/1 cores.

The CRAM entropy coder's serial dependency is per-state; with N states
per block and B blocks decoded together the device sees N*B independent
lanes (the BASELINE.json formulation: "32 parallel states = vector
lanes" scaled across block batches).  XLA/jnp with static shapes:
tables, states and byte cursors live in [B, ...] tensors and every
round is a batched gather + multiply + masked renormalisation under
lax.fori_loop.

Per-slot table entries are packed into one uint32
(sym | (freq-1)<<8 | cum<<20) so each symbol costs a single table
gather — the measured gather rate (docs/DEVICE_LIMITS.md) is the
throughput wall on this rig.

Interleave tails decode on device: in the final partial round the
inactive states read past the payload end (zero padding) after every
valid byte has been consumed, so the live outputs are unaffected —
there is no host fallback.  Semantics match htslib_tpu.codecs.rans4x8 /
rans4x16 exactly (validated in tests/test_ops.py).

Reference: rANS call sites cram/cram_io.c:1668-1699; order-1 quarters
with a state-3 tail mirror htscodecs rANS_static.c, Nx16 contiguous
segments mirror the CRAM 3.1 spec.
"""
from __future__ import annotations

import functools
import struct
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from htslib_tpu.codecs.rans4x8 import (RANS_L, TF_SHIFT, TOTFREQ,
                                       _read_freqs, _read_freqs_o1)

_MASK = TOTFREQ - 1
RANS16_L = 1 << 15


def _pack_table(freqs: np.ndarray, cum: np.ndarray) -> np.ndarray:
    """[256] freqs (sum<=4096) -> packed uint32[TOTFREQ]:
    sym | (f-1)<<8 | c<<20."""
    D = np.repeat(np.arange(256, dtype=np.int64), freqs)
    tbl = np.zeros(TOTFREQ, np.uint32)
    if len(D):
        f = freqs[D]
        c = cum[D]
        tbl[:len(D)] = (D | ((f - 1) << 8) | (c << 20)).astype(np.uint32)
    return tbl


def _unpack(e):
    sym = e & 0xFF
    f = ((e >> 8) & 0xFFF) + 1
    c = e >> 20
    return sym, f, c


# ---------------------------------------------------------------------------
# 4x8 (CRAM 3.0): 8-bit renormalisation, lower bound 2^23
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(4,))
def _dec4x8_o0(tbl, x0, data, cur0, rounds):
    B = tbl.shape[0]

    def body(r, carry):
        x, cur, out = carry
        syms = []
        for j in range(4):
            m = (x[:, j] & _MASK).astype(jnp.int32)
            e = jnp.take_along_axis(tbl, m[:, None], axis=1)[:, 0]
            sym, f, c = _unpack(e)
            xj = f * (x[:, j] >> TF_SHIFT) + m.astype(jnp.uint32) - c
            for _ in range(2):
                need = xj < RANS_L
                b = jnp.take_along_axis(data, cur[:, None], axis=1)[:, 0]
                xj = jnp.where(need, (xj << 8) | b.astype(jnp.uint32), xj)
                cur = cur + need.astype(jnp.int32)
            x = x.at[:, j].set(xj)
            syms.append(sym)
        quad = jnp.stack(syms, axis=1).astype(jnp.uint8)
        out = jax.lax.dynamic_update_slice(out, quad, (0, r * 4))
        return x, cur, out

    out = jnp.zeros((B, rounds * 4), jnp.uint8)
    x, cur, out = jax.lax.fori_loop(
        0, rounds, body, (x0.astype(jnp.uint32), cur0, out))
    return out


def _dec4x8_o1_impl(tbl, x0, data, cur0, isz4, tail_len, rounds, out_cap):
    """Order-1 4x8 decode (see _read_freqs_o1 layout): 4 quarter states +
    a masked state-3 tail."""
    B = tbl.shape[0]
    rows = jnp.arange(B)

    def body(r, carry):
        x, cur, ctx, out = carry
        for j in range(4):
            m = (x[:, j] & _MASK).astype(jnp.int32)
            idx = ctx[:, j] * TOTFREQ + m
            e = jnp.take_along_axis(tbl, idx[:, None], axis=1)[:, 0]
            sym = (e & 0xFF).astype(jnp.int32)
            f = ((e >> 8) & 0xFFF) + 1
            c = e >> 20
            xj = f * (x[:, j] >> TF_SHIFT) + m.astype(jnp.uint32) - c
            if j == 3:
                active = r < isz4 + tail_len
                pos = jnp.where(r < isz4, 3 * isz4 + r, 4 * isz4 + r - isz4)
            else:
                active = r < isz4
                pos = j * isz4 + r
            pos = jnp.where(active, pos, out_cap - 1)
            out = out.at[rows, pos].set(
                jnp.where(active, sym.astype(jnp.uint8), out[rows, pos]),
                mode="drop")
            for _ in range(2):
                need = (xj < RANS_L) & active
                b = jnp.take_along_axis(data, cur[:, None], axis=1)[:, 0]
                xj = jnp.where(need, (xj << 8) | b.astype(jnp.uint32), xj)
                cur = cur + need.astype(jnp.int32)
            x = x.at[:, j].set(jnp.where(active, xj, x[:, j]))
            ctx = ctx.at[:, j].set(jnp.where(active, sym, ctx[:, j]))
        return x, cur, ctx, out

    out = jnp.zeros((B, out_cap), jnp.uint8)
    ctx = jnp.zeros((B, 4), jnp.int32)
    carry = (x0.astype(jnp.uint32), cur0, ctx, out)
    x, cur, ctx, out = jax.lax.fori_loop(0, rounds, body, carry)
    return out


_dec4x8_o1_jit = jax.jit(_dec4x8_o1_impl, static_argnums=(6, 7))


def uncompress_batch(blocks: List[bytes]) -> List[bytes]:
    """Decode a batch of rANS 4x8 streams (order 0 or 1, mixed) on the
    default device — tails included, no host fallback."""
    o0 = [(i, b) for i, b in enumerate(blocks) if b[0] == 0]
    o1 = [(i, b) for i, b in enumerate(blocks) if b[0] == 1]
    res: List[bytes] = [b""] * len(blocks)
    if o0:
        for i, data in zip((i for i, _ in o0),
                           _uncompress_o0_batch([b for _, b in o0])):
            res[i] = data
    if o1:
        for i, data in zip((i for i, _ in o1),
                           _uncompress_o1_batch([b for _, b in o1])):
            res[i] = data
    return res


def _uncompress_o0_batch(blocks: List[bytes]) -> List[bytes]:
    B = len(blocks)
    out_szs = []
    tbls = np.zeros((B, TOTFREQ), np.uint32)
    states = np.zeros((B, 4), np.uint32)
    payloads = []
    for i, data in enumerate(blocks):
        comp_sz, out_sz = struct.unpack_from("<II", data, 1)
        out_szs.append(out_sz)
        freqs, p = _read_freqs(data, 9)
        cum = np.zeros(257, np.int64)
        np.cumsum(freqs, out=cum[1:])
        if cum[256] > TOTFREQ:
            raise ValueError("rANS0: frequencies exceed 4096")
        tbls[i] = _pack_table(freqs, cum)
        states[i] = np.frombuffer(data[p:p + 16], "<u4")
        payloads.append(np.frombuffer(data, np.uint8,
                                      len(data) - (p + 16), p + 16))
    max_data = max((len(p) for p in payloads), default=0)
    data_arr = np.zeros((B, max_data + 8), np.uint8)
    for i, pl in enumerate(payloads):
        data_arr[i, :len(pl)] = pl
    max_out = max(out_szs) if out_szs else 0
    rounds = (max_out + 3) // 4
    out = _dec4x8_o0(jnp.asarray(tbls), jnp.asarray(states),
                     jnp.asarray(data_arr),
                     jnp.zeros((B,), jnp.int32), rounds)
    arr = np.asarray(out)
    return [arr[i, :sz].tobytes() for i, sz in enumerate(out_szs)]


def _uncompress_o1_batch(blocks: List[bytes]) -> List[bytes]:
    B = len(blocks)
    out_szs = []
    tbls = np.zeros((B, 256 * TOTFREQ), np.uint32)
    states = np.zeros((B, 4), np.uint32)
    payloads = []
    for i, data in enumerate(blocks):
        comp_sz, out_sz = struct.unpack_from("<II", data, 1)
        out_szs.append(out_sz)
        freqs, p = _read_freqs_o1(data, 9)
        cum = np.zeros((256, 257), np.int64)
        np.cumsum(freqs, axis=1, out=cum[:, 1:])
        if (cum[:, 256] > TOTFREQ).any():
            raise ValueError("rANS1: context frequencies exceed 4096")
        for ctxv in np.nonzero(freqs.sum(axis=1))[0]:
            tbls[i, ctxv * TOTFREQ:(ctxv + 1) * TOTFREQ] = \
                _pack_table(freqs[ctxv], cum[ctxv])
        states[i] = np.frombuffer(data[p:p + 16], "<u4")
        payloads.append(np.frombuffer(data, np.uint8,
                                      len(data) - (p + 16), p + 16))
    max_data = max((len(p) for p in payloads), default=0)
    data_arr = np.zeros((B, max_data + 8), np.uint8)
    for i, pl in enumerate(payloads):
        data_arr[i, :len(pl)] = pl
    isz4 = np.array([sz >> 2 for sz in out_szs], np.int32)
    tails = np.array([sz - 4 * (sz >> 2) for sz in out_szs], np.int32)
    max_rounds = int((isz4 + tails).max()) if B else 0
    out_cap = max(max(out_szs) + 1, 2) if out_szs else 2
    out = _dec4x8_o1_jit(jnp.asarray(tbls), jnp.asarray(states),
                         jnp.asarray(data_arr),
                         jnp.zeros((B,), jnp.int32),
                         jnp.asarray(isz4), jnp.asarray(tails),
                         max_rounds, out_cap)
    arr = np.asarray(out)
    return [arr[i, :sz].tobytes() for i, sz in enumerate(out_szs)]


# ---------------------------------------------------------------------------
# Nx16 (CRAM 3.1): 16-bit renormalisation, lower bound 2^15
# ---------------------------------------------------------------------------

def _dec_nx16_impl(tbl, x0, data16, cur0, seg, slen, order1, nway, rounds,
                   out_cap):
    """Nx16 core: order-0 interleaves symbol i on state i%nway; order-1
    gives state j the contiguous segment [j*seg, (j+1)*seg) with
    context = previous byte (0 at segment heads); the last state absorbs
    the remainder.  data16 holds the payload as little-endian u16 words
    (16-bit renormalisation reads exactly one word)."""
    B = tbl.shape[0]
    rows = jnp.arange(B)

    def body(r, carry):
        x, cur, ctx, out = carry
        for j in range(nway):
            m = (x[:, j] & _MASK).astype(jnp.int32)
            if order1:
                idx = ctx[:, j] * TOTFREQ + m
            else:
                idx = m
            e = jnp.take_along_axis(tbl, idx[:, None], axis=1)[:, 0]
            sym = (e & 0xFF).astype(jnp.int32)
            f = ((e >> 8) & 0xFFF) + 1
            c = e >> 20
            xj = f * (x[:, j] >> TF_SHIFT) + m.astype(jnp.uint32) - c
            if order1:
                active = r < slen[:, j]
                pos = j * seg + r
            else:
                pos = r * nway + j
                active = pos < out_cap - 1
            pos = jnp.where(active, pos, out_cap - 1)
            out = out.at[rows, pos].set(
                jnp.where(active, sym.astype(jnp.uint8), out[rows, pos]),
                mode="drop")
            need = (xj < RANS16_L) & active
            w = jnp.take_along_axis(data16, cur[:, None], axis=1)[:, 0]
            xj = jnp.where(need, (xj << 16) | w.astype(jnp.uint32), xj)
            cur = cur + need.astype(jnp.int32)
            x = x.at[:, j].set(jnp.where(active, xj, x[:, j]))
            if order1:
                ctx = ctx.at[:, j].set(jnp.where(active, sym, ctx[:, j]))
        return x, cur, ctx, out

    out = jnp.zeros((B, out_cap), jnp.uint8)
    ctx = jnp.zeros((B, x0.shape[1]), jnp.int32)
    x, cur, ctx, out = jax.lax.fori_loop(
        0, rounds, body, (x0.astype(jnp.uint32), cur0, ctx, out))
    return out


_dec_nx16_jit = jax.jit(_dec_nx16_impl, static_argnums=(6, 7, 8, 9))


def uncompress_nx16_batch(blocks: List[bytes]) -> List[bytes]:
    """Decode plain rANS Nx16 order-0/1 streams (no PACK/RLE/STRIPE/CAT
    transforms — those belong to the block layer) on device.  Accepts
    mixed 4-way and 32-way batches; raises ValueError on transform
    flags."""
    from htslib_tpu.codecs.rans4x16 import (_read_alphabet,
                                            _read_freq_table, u7_get)
    groups: dict = {}
    for i, data in enumerate(blocks):
        flags = data[0]
        if flags & ~0x05:
            raise ValueError("device Nx16 core handles plain O0/O1 "
                             "streams; transforms are host-side")
        nway = 32 if flags & 0x04 else 4
        order1 = bool(flags & 0x01)
        groups.setdefault((nway, order1), []).append(i)
    res: List[bytes] = [b""] * len(blocks)
    for (nway, order1), idxs in groups.items():
        B = len(idxs)
        out_szs = []
        tblsz = 256 * TOTFREQ if order1 else TOTFREQ
        tbls = np.zeros((B, tblsz), np.uint32)
        states = np.zeros((B, nway), np.uint32)
        payloads = []
        for bi, i in enumerate(idxs):
            data = blocks[i]
            p = 1
            ulen, p = u7_get(data, p)
            out_szs.append(ulen)
            if ulen == 0:
                payloads.append(np.zeros(0, np.uint8))
                continue
            if order1:
                tlen, p = u7_get(data, p)
                tab = data[p:p + tlen]
                p += tlen
                tp = 0
                ctxs, tp = _read_alphabet(tab, tp)
                F = np.zeros((256, 256), np.int64)
                for ctxv in ctxs:
                    F[ctxv], tp = _read_freq_table(tab, tp)
                C = np.zeros((256, 257), np.int64)
                np.cumsum(F, axis=1, out=C[:, 1:])
                for ctxv in ctxs:
                    tbls[bi, ctxv * TOTFREQ:(ctxv + 1) * TOTFREQ] = \
                        _pack_table(F[ctxv], C[ctxv])
            else:
                f, p = _read_freq_table(data, p)
                cum = np.zeros(257, np.int64)
                np.cumsum(f, out=cum[1:])
                tbls[bi] = _pack_table(f, cum)
            for j in range(nway):
                states[bi, j] = struct.unpack_from("<I", data, p)[0]
                p += 4
            payloads.append(np.frombuffer(data, np.uint8,
                                          len(data) - p, p))
        max_data = max((len(pl) for pl in payloads), default=0)
        w16 = (max_data + 1) // 2 + 4
        data16 = np.zeros((B, w16), np.uint16)
        for bi, pl in enumerate(payloads):
            pad = np.zeros((len(pl) + 1) // 2 * 2, np.uint8)
            pad[:len(pl)] = pl
            data16[bi, :len(pad) // 2] = pad.view("<u2")
        segs = np.array([sz // nway for sz in out_szs], np.int32)
        # per-state lengths: floor segments, the last state absorbs the
        # remainder after the main rounds (codecs/rans4x16 layout); its
        # positions continue contiguously past (nway-1)*seg + seg
        slen = np.zeros((B, nway), np.int32)
        for bi, (sz, sg) in enumerate(zip(out_szs, segs)):
            for j in range(nway):
                slen[bi, j] = int(sg)
            slen[bi, nway - 1] = int(sg) + (sz - nway * int(sg))
        max_out = max(out_szs) if out_szs else 0
        out_cap = max(max_out + 1, 2)
        if order1:
            rounds = int(slen.max()) if B else 0
        else:
            rounds = (max_out + nway - 1) // nway
        out = _dec_nx16_jit(jnp.asarray(tbls), jnp.asarray(states),
                            jnp.asarray(data16),
                            jnp.zeros((B,), jnp.int32),
                            jnp.asarray(segs), jnp.asarray(slen),
                            order1, nway, rounds, out_cap)
        arr = np.asarray(out)
        for bi, i in enumerate(idxs):
            res[i] = arr[bi, :out_szs[bi]].tobytes()
    return res
