#!/usr/bin/env python
"""Ablation probe for the Pallas rANS Nx16 O0 decode kernel
(ops/rans_pallas._seg_kernel): measures the per-round cost of each
pipeline stage by compiling kernel variants with stages removed, so the
op model in docs/DEVICE_LIMITS.md carries measured numbers (VERDICT r4
item #2).

Stages ablated (cumulative pipeline: resolve -> cumsum -> win-select ->
group-total -> bookkeeping):
  full        the production round structure (win reload per 8-round tile)
  no_select   window select loop replaced by words=1 (keeps resolve+scan)
  no_resolve  resolve replaced by sym=m (keeps select+scan)
  no_scan     group cumsum/total replaced by constants
  only_loop   empty fori_loop body (floor)
  slice_cost  per-tile [WIN,1] dynamic slices only

Every step has an internal wall-clock budget (axon tunnel fragility:
a killed client wedges the TPU ~1 h) — the script always exits on its
own.
"""
import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

T0 = time.time()
BUDGET = float(os.environ.get("HTS_TPU_DEVICE_BUDGET", 420))


def left():
    return BUDGET - (time.time() - T0)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from htslib_tpu.ops.rans_pallas import (BLOCKS, NWAY, RANS16_L, SEG,
                                            TOTFREQ, _WIN, _TILE,
                                            _group_cumsum_exclusive,
                                            _group_total, _resolve8,
                                            _row_fold, pack_tables)

    dev = jax.devices()[0]
    out = {"device": str(dev),
           "measured_at": time.strftime("%Y-%m-%d %H:%M"),
           "seg_rounds": SEG, "lanes": BLOCKS * NWAY}
    if dev.platform == "cpu":
        print(json.dumps({"error": "no TPU attached"}))
        return 1

    L = BLOCKS * NWAY
    A = 64
    rng = np.random.RandomState(7)
    freqs = rng.randint(1, 64, (BLOCKS, 256)).astype(np.int64)
    freqs[:, A:] = 0
    freqs = np.maximum(freqs * TOTFREQ // freqs.sum(1, keepdims=True), 1)
    freqs[:, A:] = 0
    for b in range(BLOCKS):
        freqs[b, 0] += TOTFREQ - freqs[b].sum()
    lo_b, dfc_b = pack_tables(freqs, A)
    lo_t = np.repeat(lo_b, NWAY, axis=1)
    dfc_t = np.repeat(dfc_b, NWAY, axis=1)
    W = SEG * NWAY + SEG * 8 + 2 * _WIN
    data_w = rng.randint(0, 1 << 15, (W, BLOCKS)).astype(np.int32)
    x0 = np.broadcast_to(
        rng.randint(1 << 16, 1 << 30, (1, L)), (8, L)).astype(np.int32)
    cur0 = np.zeros((1, BLOCKS), np.int32)

    def make_kernel(mode):
        def kern(data_ref, lo_ref, dfc_ref, x_ref, cur_ref,
                 out_ref, x_out_ref, cur_out_ref):
            lo = lo_ref[:]
            dfc = dfc_ref[:]
            lane = jax.lax.broadcasted_iota(jnp.int32, (8, L), 1)
            row = jax.lax.broadcasted_iota(jnp.int32, (8, L), 0)
            gpos = lane % NWAY
            masks = [(lane >= b * NWAY) & (lane < (b + 1) * NWAY)
                     for b in range(BLOCKS)]

            def one_round(x8, woff, win):
                if mode == "no_resolve":
                    sym = x8 & (TOTFREQ - 1)
                    x8 = (x8 * 5 + 7) & 0x7FFFFFFF
                else:
                    sym, x8 = _resolve8(x8, lo, dfc)
                need = (x8 < RANS16_L).astype(jnp.int32)
                if mode == "no_scan":
                    pre = need
                    idx = woff + pre
                else:
                    pre = _group_cumsum_exclusive(need, gpos)
                    idx = woff + pre
                if mode == "no_select":
                    words = jnp.ones((8, L), jnp.int32)
                else:
                    w8 = None
                    for ch in range(_WIN // 8):
                        sl = slice(ch * 8, ch * 8 + 8)
                        hit = jnp.where(idx == row + ch * 8, win[sl], 0)
                        w8 = hit if w8 is None else w8 + hit
                    words = _row_fold(w8)
                x8 = jnp.where(need > 0, (x8 << 16) | words, x8)
                if mode == "no_scan":
                    woff = woff + need
                else:
                    woff = woff + _group_total(pre + need, gpos)
                return sym, x8, woff

            def body(t, carry):
                x8 = carry[0]
                curs = carry[1:]
                if mode == "only_loop":
                    out_ref[pl.ds(t * _TILE, _TILE), :] = x8
                    return (x8 + 1,) + curs
                win = jnp.zeros((_WIN, L), jnp.int32)
                for b in range(BLOCKS):
                    win_b = data_ref[pl.ds(curs[b], _WIN), b:b + 1]
                    win = jnp.where((jax.lax.broadcasted_iota(
                        jnp.int32, (_WIN, L), 1) // NWAY) == b, win_b, win)
                if mode == "slice_cost":
                    out_ref[pl.ds(t * _TILE, _TILE), :] = \
                        jnp.broadcast_to(win[:8, :1], (8, L))
                    new = tuple(jnp.minimum(c + 8, W - _WIN)
                                for c in curs)
                    return (x8,) + new
                woff = jnp.zeros((8, L), jnp.int32)
                tile = jnp.zeros((8, L), jnp.int32)
                for r in range(_TILE):
                    sym, x8, woff = one_round(x8, woff, win)
                    tile = jnp.where(row == r, sym, tile)
                out_ref[pl.ds(t * _TILE, _TILE), :] = tile
                w_max = data_ref.shape[0] - _WIN
                new = tuple(jnp.minimum(
                    curs[b] + jnp.sum(
                        jnp.where(masks[b], woff, 0)) // (8 * NWAY),
                    w_max) for b in range(BLOCKS))
                return (x8,) + new

            curs0 = tuple(cur_ref[0, b] for b in range(BLOCKS))
            carry = jax.lax.fori_loop(0, SEG // _TILE, body,
                                      (x_ref[:],) + curs0)
            x_out_ref[:] = carry[0]
            cur_out_ref[:] = jnp.concatenate(
                [jnp.full((1, 1), carry[1 + b], jnp.int32)
                 for b in range(BLOCKS)], axis=1)
        return kern

    CHAIN = 16   # kernel calls per dispatch: amortise the ~6 ms tunnel
                 # dispatch floor out of the per-round numbers

    @functools.lru_cache(maxsize=None)
    def compiled(mode):
        def one(data, lo, dfc, x, cur):
            return pl.pallas_call(
                make_kernel(mode),
                out_shape=(
                    jax.ShapeDtypeStruct((SEG, L), jnp.int32),
                    jax.ShapeDtypeStruct((8, L), jnp.int32),
                    jax.ShapeDtypeStruct((1, BLOCKS), jnp.int32),
                ),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
                out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 3),
            )(data, lo, dfc, x, cur)

        @jax.jit
        def run(data, lo, dfc, x, cur):
            def body(carry):
                i, x_c, cur_c, acc = carry
                syms, x2, cur2 = one(data, lo, dfc, x_c, cur_c)
                # reset the cursor each chain step so the window slices
                # stay inside the padded stream for all CHAIN iterations
                return i + 1, x2, cur, acc + syms[:2, :2]
            def cond(carry):
                return carry[0] < CHAIN
            _, x2, cur2, acc = jax.lax.while_loop(
                cond, body,
                (jnp.int32(0), x, cur, jnp.zeros((2, 2), jnp.int32)))
            return acc, x2, cur2
        return run

    args = (jnp.asarray(data_w), jnp.asarray(lo_t), jnp.asarray(dfc_t),
            jnp.asarray(x0), jnp.asarray(cur0))

    def sync(r):
        return int(jnp.sum(r[0][:2, :2]).block_until_ready())

    reps = 8
    for mode in ("full", "no_select", "no_resolve", "no_scan",
                 "only_loop", "slice_cost"):
        if left() < 60:
            out[mode + "_skipped"] = True
            continue
        run = compiled(mode)
        r = run(*args)
        sync(r)
        t0 = time.time()
        for _ in range(reps):
            r = run(*args)
        sync(r)
        dt = (time.time() - t0) / reps
        ns_round = dt / (SEG * CHAIN) * 1e9
        out[mode + "_ns_per_round"] = round(ns_round, 1)
        out[mode + "_MBps"] = round(L / (ns_round * 1e-9) / 1e6, 1)

    path = os.path.join(REPO, "PROBE_RANS_ABLATE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
