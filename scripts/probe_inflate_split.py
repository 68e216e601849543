#!/usr/bin/env python
"""The ONE unmeasured device-inflate variant (VERDICT r4 item #4):
heterogeneous split — device pass-A (entropy/Huffman token decode),
host pass-B (LZ77 copy resolution) — measured on a 16-block batch so
docs/DEVICE_INFLATE_DESIGN.md can carry a final, numbers-backed
conclusion.

Measures, separately:
  passA_s       device token decode (ops/inflate.py pass_a alone)
  d2h_tok_s     token array download (the split's tunnel cost)
  passB_host_s  host LZ copy resolution over the downloaded tokens
                (numpy-assisted Python; a C implementation would be
                10-20x faster — reported as passB_est_c_s with that
                factor so the conclusion doesn't hinge on Python)
  split_MBps    pipelined rate 1 / max(passA, d2h, passB) and the
                serial rate 1 / sum(...)
vs host_zlib_MBps (one core) on the same blocks.

Internal wall-clock budget throughout (axon tunnel fragility)."""
import json
import os
import sys
import time
import zlib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

T0 = time.time()
BUDGET = float(os.environ.get("HTS_TPU_DEVICE_BUDGET", 420))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from htslib_tpu.ops.inflate import (MAX_TOK, PH_DONE, PH_HDR,
                                        NCODE_MAX, TBL, _make_pass_a)

    dev = jax.devices()[0]
    out = {"device": str(dev),
           "measured_at": time.strftime("%Y-%m-%d %H:%M")}
    if dev.platform == "cpu":
        print(json.dumps({"error": "no TPU attached"}))
        return 1

    rng = np.random.RandomState(7)
    B = 16
    blocks = []
    raws = []
    for i in range(B):
        # quality-like bytes: representative BGZF payload entropy
        raw = np.clip(np.cumsum(rng.randint(-2, 3, 60000)) + 33, 2,
                      70).astype(np.uint8).tobytes()
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        blocks.append(co.compress(raw) + co.flush())
        raws.append(raw)
    tot_u = sum(len(r) for r in raws)

    in_max = (max(len(p) for p in blocks) + 8 + 3) & ~3
    buf = np.zeros((B, in_max), np.uint8)
    bits = np.zeros((B,), np.int32)
    for i, pl in enumerate(blocks):
        buf[i, :len(pl)] = np.frombuffer(pl, np.uint8)
        bits[i] = 8 * len(pl)
    words = buf.view(np.uint32)

    _, build_tables, step = _make_pass_a(jnp, lax)

    def pass_a(words_j, end_bits):
        B_ = words_j.shape[0]
        st = (jnp.zeros((B_,), jnp.int32),
              jnp.full((B_,), PH_HDR, jnp.int32),
              jnp.zeros((B_,), jnp.int32),
              jnp.zeros((B_,), jnp.int32),
              jnp.zeros((B_,), jnp.int32),
              jnp.zeros((B_, NCODE_MAX), jnp.int32),
              jnp.zeros((B_, NCODE_MAX), jnp.int32),
              jnp.zeros((B_,), jnp.int32),
              jnp.zeros((B_,), jnp.int32),
              jnp.zeros((B_,), jnp.int32),
              jnp.zeros((B_,), jnp.int32),
              jnp.zeros((B_, MAX_TOK), jnp.int32),
              jnp.zeros((B_, TBL), jnp.int32),
              jnp.zeros((B_, TBL), jnp.int32),
              jnp.zeros((B_,), jnp.bool_),
              words_j, end_bits)

        def cond(carry):
            st, rounds = carry
            return jnp.any(st[1] != PH_DONE) & (rounds < 512)

        def body(carry):
            st, rounds = carry
            st = build_tables(st)
            st, _ = lax.scan(step, st, None, length=512)
            return st, rounds + 1

        st, _ = lax.while_loop(cond, body, (st, jnp.int32(0)))
        return st[11], st[10], st[14] | (st[1] != PH_DONE)

    run_a = jax.jit(pass_a)
    wj = jnp.asarray(words)
    bj = jnp.asarray(bits)
    toks, cnts, err = run_a(wj, bj)                  # warm/compile
    assert not bool(np.asarray(err).any()), "pass A error"
    t0 = time.time()
    toks, cnts, err = run_a(wj, bj)
    int(jnp.sum(cnts).block_until_ready())
    passA_s = time.time() - t0
    out["passA_s"] = round(passA_s, 4)
    out["passA_MBps"] = round(tot_u / passA_s / 1e6, 2)

    t0 = time.time()
    tok_np = np.asarray(toks)
    cnt_np = np.asarray(cnts)
    d2h_s = time.time() - t0
    # only the first cnt tokens are meaningful; count real payload
    tok_bytes = int(cnt_np.sum()) * 4
    out["d2h_tok_s"] = round(d2h_s, 4)
    out["d2h_tok_bytes"] = tok_bytes
    out["d2h_full_bytes"] = int(tok_np.nbytes)

    # host pass B: LZ copies over the token arrays (numpy for literal
    # runs, python loop for matches)
    def pass_b_host(tokens, cnt, src):
        o = np.empty(1 << 16, np.uint8)
        n = 0
        i = 0
        tk = tokens[:cnt]
        tt = (tk >> 30) & 3
        while i < cnt:
            t = tk[i]
            ty = tt[i]
            if ty == 0:
                # literal run: batch consecutive literals
                j = i
                while j < cnt and tt[j] == 0:
                    j += 1
                o[n:n + j - i] = tk[i:j] & 0xFF
                n += j - i
                i = j
            elif ty == 1:
                ln = ((t >> 15) & 0xFF) + 3
                dist = (t & 0x7FFF) + 1
                if dist >= ln:
                    o[n:n + ln] = o[n - dist:n - dist + ln]
                else:
                    for k in range(ln):
                        o[n + k] = o[n - dist + k]
                n += ln
                i += 1
            else:
                ln = t & 0x1FFF
                soff = (t >> 13) & 0x1FFFF
                o[n:n + ln] = src[soff:soff + ln]
                n += ln
                i += 1
        return o[:n]

    t0 = time.time()
    outs = [pass_b_host(tok_np[i], int(cnt_np[i]), buf[i])
            for i in range(B)]
    passB_s = time.time() - t0
    ok = all(bytes(o) == r for o, r in zip(outs, raws))
    out["passB_host_s"] = round(passB_s, 4)
    out["split_exact"] = bool(ok)
    passB_c_est = passB_s / 15.0     # C impl estimate (memcpy-bound)
    out["passB_est_c_s"] = round(passB_c_est, 4)

    serial = passA_s + d2h_s + passB_s
    out["split_serial_MBps"] = round(tot_u / serial / 1e6, 2)
    out["split_pipelined_MBps"] = round(
        tot_u / max(passA_s, d2h_s, passB_s) / 1e6, 2)
    out["split_pipelined_cB_MBps"] = round(
        tot_u / max(passA_s, d2h_s, passB_c_est) / 1e6, 2)

    # host baseline, one core
    t0 = time.time()
    for pl, r in zip(blocks, raws):
        assert zlib.decompress(pl, -15) == r
    host_s = time.time() - t0
    out["host_zlib_1core_s"] = round(host_s, 4)
    out["host_zlib_1core_MBps"] = round(tot_u / host_s / 1e6, 2)
    out["blocks"] = B
    out["uncompressed_bytes"] = tot_u

    path = os.path.join(REPO, "PROBE_INFLATE_SPLIT.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
