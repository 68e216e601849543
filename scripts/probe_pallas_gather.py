#!/usr/bin/env python
"""Probe: can a Pallas kernel beat the XLA gather lowering on the
table-lookup-per-symbol chase that caps device entropy decode?

docs/DEVICE_LIMITS.md measured 0.085 G elem/s for chained
`take_along_axis` gathers (the XLA lowering wall).  Every strategy here
runs the *same dependent chain* shaped like the rANS slot-resolution
inner loop (cram/cram_io.c:1668 call sites): per round, per state,
  m   = x & 0xFFF                  (12-bit slot)
  sym, f, c = table[m]             (the lookup under test)
  x   = f * (x >> 12) + m - c      (state update -> next round depends)

Strategies:
  xla_gather   — `take_along_axis` into per-block packed tables
                 (what ops/rans.py ships today)
  pallas_take  — the same gather inside a Pallas kernel (Mosaic
                 dynamic-gather lowering, if supported)
  pallas_cmp   — gatherless: broadcast compare against the per-block
                 cumulative-frequency boundaries held in VMEM, masked
                 int32 row-sums recover (sym, f, c).  No gather op at
                 all: pure VPU compare/multiply/reduce.

Each reports G-lookups/s; pallas_cmp >= 5x xla_gather is the round-3
"break the wall" criterion (VERDICT.md task 1).
"""
import functools
import json
import time

import numpy as np

G = 256          # blocks (sublane axis)
NSTATES = 4      # rANS 4x8 interleave
TOTFREQ = 4096
ROUNDS = 512     # dependent rounds per kernel call


def make_tables(rng):
    """Random valid frequency tables: [G,257] cum, [G,256] freq,
    [G,TOTFREQ] packed slot entries (sym | (f-1)<<8 | c<<20)."""
    freqs = rng.randint(1, 64, (G, 256)).astype(np.int64)
    scale = (freqs.sum(1, keepdims=True))
    freqs = np.maximum(1, freqs * TOTFREQ // scale)
    # fix up to sum exactly TOTFREQ
    for g in range(G):
        d = TOTFREQ - freqs[g].sum()
        freqs[g, 0] += d
        assert freqs[g, 0] > 0
    cum = np.zeros((G, 257), np.int64)
    np.cumsum(freqs, axis=1, out=cum[:, 1:])
    packed = np.zeros((G, TOTFREQ), np.uint32)
    for g in range(G):
        D = np.repeat(np.arange(256), freqs[g])
        packed[g] = (D | ((freqs[g][D] - 1) << 8) | (cum[g][D] << 20)
                     ).astype(np.uint32)
    return (cum.astype(np.int32), freqs.astype(np.int32), packed)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.RandomState(7)
    cum, freqs, packed = make_tables(rng)
    x0 = rng.randint(1 << 23, 1 << 30, (G, NSTATES)).astype(np.int32)

    def sync(v):
        return int(jnp.sum(v.reshape(-1)[:8] & 0xFF).block_until_ready())

    out = {"G": G, "nstates": NSTATES, "rounds": ROUNDS,
           "lookups_per_call": G * NSTATES * ROUNDS}

    def bench(fn, args, name, reps=6):
        r = fn(*args)
        sync(r)
        t0 = time.time()
        for _ in range(reps):
            r = fn(*args)
        sync(r)
        dt = (time.time() - t0) / reps
        rate = G * NSTATES * ROUNDS / dt / 1e9
        out[name + "_Glookups_s"] = round(rate, 4)
        out[name + "_ms"] = round(dt * 1e3, 3)
        return np.asarray(r)

    # ---- xla_gather ----------------------------------------------------
    @jax.jit
    def xla_chain(tbl, x):
        def body(r, x):
            for j in range(NSTATES):
                m = (x[:, j] & (TOTFREQ - 1)).astype(jnp.int32)
                e = jnp.take_along_axis(tbl, m[:, None], axis=1)[:, 0]
                f = ((e >> 8) & 0xFFF).astype(jnp.int32) + 1
                c = (e >> 20).astype(jnp.int32)
                x = x.at[:, j].set(f * (x[:, j] >> 12) + m - c)
            return x
        return jax.lax.fori_loop(0, ROUNDS, body, x)

    ref = bench(xla_chain, (jnp.asarray(packed), jnp.asarray(x0)),
                "xla_gather")

    # ---- pallas_cmp ----------------------------------------------------
    # gatherless: onehot = (m >= cum_lo) & (m < cum_hi), one fused
    # multiply-reduce against packed (f-1) | c<<12 entries.
    cum_lo = cum[:, :256].astype(np.int32)
    cum_hi = cum[:, 1:257].astype(np.int32)
    packed_fc = ((freqs - 1) | (cum[:, :256] << 12)).astype(np.int32)

    def cmp_kernel(lo_ref, hi_ref, fc_ref, x_ref, out_ref):
        lo = lo_ref[:]
        hi = hi_ref[:]
        fc = fc_ref[:]

        def body(r, xs):
            new = []
            for j in range(NSTATES):
                xj = xs[j]
                m = xj & (TOTFREQ - 1)                  # [G,1]
                onehot = ((m >= lo) & (m < hi)).astype(jnp.int32)
                e = jnp.sum(onehot * fc, axis=1, keepdims=True)
                f = (e & 0xFFF) + 1
                c = e >> 12
                new.append(f * (xj >> 12) + m - c)
            return tuple(new)

        xs0 = tuple(x_ref[:, j:j + 1] for j in range(NSTATES))
        xs = jax.lax.fori_loop(0, ROUNDS, body, xs0)
        for j in range(NSTATES):
            out_ref[:, j:j + 1] = xs[j]

    @jax.jit
    def pallas_cmp(lo, hi, fc, x):
        return pl.pallas_call(
            cmp_kernel,
            out_shape=jax.ShapeDtypeStruct((G, NSTATES), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(lo, hi, fc, x)

    got = bench(pallas_cmp, (jnp.asarray(cum_lo), jnp.asarray(cum_hi),
                             jnp.asarray(packed_fc), jnp.asarray(x0)),
                "pallas_cmp")
    out["pallas_cmp_matches_xla"] = bool((got == ref).all())

    if "pallas_cmp_Glookups_s" in out and "xla_gather_Glookups_s" in out:
        out["cmp_vs_xla"] = round(out["pallas_cmp_Glookups_s"]
                                  / out["xla_gather_Glookups_s"], 2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
