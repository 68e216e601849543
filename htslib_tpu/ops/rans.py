"""Device rANS 4x8 order-0 decode over block batches.

The CRAM entropy coder's serial dependency is per-state; with 4 states
per block and B blocks decoded together the device sees 4B independent
lanes (the BASELINE.json formulation: "32 parallel states = vector
lanes" scaled across block batches).  This is the XLA/jnp implementation
with static shapes — tables, states and byte cursors live in [B, ...]
tensors and every decode round is a batched gather + multiply + masked
renormalisation step under lax.fori_loop.

Semantics match htslib_tpu.codecs.rans4x8 exactly (validated in tests);
the renormalisation consumes at most 2 bytes per state per round, which
is always sufficient because one 12-bit step can shrink the 23-bit-bound
state by at most 12 bits.
"""
from __future__ import annotations

import functools
import struct
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from htslib_tpu.codecs.rans4x8 import TF_SHIFT, TOTFREQ, RANS_L, _read_freqs

_MASK = TOTFREQ - 1


def prepare_batch(blocks: List[bytes]) -> Tuple[dict, List[int]]:
    """Host-side framing: parse headers + frequency tables of a batch of
    rANS-order-0 streams into fixed-shape arrays."""
    B = len(blocks)
    out_szs = []
    tables_D = np.zeros((B, TOTFREQ), np.uint8)
    tables_F = np.zeros((B, TOTFREQ), np.int32)
    tables_C = np.zeros((B, TOTFREQ), np.int32)
    states = np.zeros((B, 4), np.uint32)
    max_data = 0
    payloads = []
    for i, data in enumerate(blocks):
        order = data[0]
        if order != 0:
            raise ValueError("device decoder handles order-0 streams")
        comp_sz, out_sz = struct.unpack_from("<II", data, 1)
        out_szs.append(out_sz)
        freqs, p = _read_freqs(data, 9)
        cum = np.zeros(257, np.int64)
        np.cumsum(freqs, out=cum[1:])
        D = np.repeat(np.arange(256, dtype=np.uint8), freqs)
        tables_D[i, :len(D)] = D
        tables_F[i] = freqs[tables_D[i].astype(np.int64)]
        tables_C[i] = cum[tables_D[i].astype(np.int64)]
        states[i] = np.frombuffer(data[p:p + 16], "<u4")
        payload = np.frombuffer(data, np.uint8, len(data) - (p + 16), p + 16)
        payloads.append(payload)
        max_data = max(max_data, len(payload))
    data_arr = np.zeros((B, max_data + 8), np.uint8)
    for i, pl in enumerate(payloads):
        data_arr[i, :len(pl)] = pl
    batch = {
        "D": jnp.asarray(tables_D),
        "F": jnp.asarray(tables_F),
        "C": jnp.asarray(tables_C),
        "x0": jnp.asarray(states),
        "data": jnp.asarray(data_arr),
        "out_sz": jnp.asarray(np.array(out_szs, np.int32)),
    }
    return batch, out_szs


@functools.partial(jax.jit, static_argnames=("max_out",))
def decode_batch(D, F, C, x0, data, out_sz, max_out: int):
    """Decode B blocks to [B, max_out] bytes (padded).

    Each round emits 4 symbols per block (one per state) and renormalises
    with up to 2 masked byte reads per state."""
    B = D.shape[0]
    x = x0.astype(jnp.uint32)
    # Byte consumption is interleaved across states in a fixed round-robin
    # order (state 0..3 per round), so a single per-block cursor suffices.
    cur = jnp.zeros((B,), jnp.int32)
    rounds = (max_out + 3) // 4

    def body(r, carry):
        x, cur, out = carry
        new_syms = []
        for j in range(4):
            m = (x[:, j] & _MASK).astype(jnp.int32)
            sym = jnp.take_along_axis(D, m[:, None], axis=1)[:, 0]
            f = jnp.take_along_axis(F, m[:, None], axis=1)[:, 0].astype(jnp.uint32)
            c = jnp.take_along_axis(C, m[:, None], axis=1)[:, 0].astype(jnp.uint32)
            xj = f * (x[:, j] >> TF_SHIFT) + m.astype(jnp.uint32) - c
            # renormalise: up to 2 bytes
            for _ in range(2):
                need = xj < RANS_L
                b = jnp.take_along_axis(data, cur[:, None], axis=1)[:, 0]
                xj = jnp.where(need, (xj << 8) | b.astype(jnp.uint32), xj)
                cur = cur + need.astype(jnp.int32)
            x = x.at[:, j].set(xj)
            new_syms.append(sym)
        quad = jnp.stack(new_syms, axis=1).astype(jnp.uint8)  # [B, 4]
        out = jax.lax.dynamic_update_slice(out, quad, (0, r * 4))
        return x, cur, out

    out = jnp.zeros((B, rounds * 4), jnp.uint8)
    x, cur, out = jax.lax.fori_loop(0, rounds, body, (x, cur, out))
    return out[:, :max_out]


def uncompress_batch(blocks: List[bytes]) -> List[bytes]:
    """Decode a batch of order-0 rANS streams on the default device."""
    usable = [b for b in blocks]
    batch, out_szs = prepare_batch(usable)
    max_out = max(out_szs) if out_szs else 0
    # only blocks whose length is a multiple of 4 decode exactly via the
    # round-robin quad loop; handle remainders via the host decoder
    out = decode_batch(batch["D"], batch["F"], batch["C"], batch["x0"],
                       batch["data"], batch["out_sz"], max_out)
    arr = np.asarray(out)
    res = []
    from htslib_tpu.codecs import rans4x8
    for i, sz in enumerate(out_szs):
        if sz % 4 == 0:
            res.append(arr[i, :sz].tobytes())
        else:
            res.append(rans4x8.uncompress(usable[i]))
    return res
