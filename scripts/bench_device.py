#!/usr/bin/env python
"""Device-path benchmark (VERDICT r2 tasks #1/#2): measures on the
attached TPU and writes DEVICE_BENCH.json at the repo root, which
bench.py folds into its `device` section.

Measurements:
  lookup rate   — the Pallas gatherless resolve kernel
                  (ops/rans_pallas.py) vs an XLA take_along_axis chain
                  of the same shape: the "break the gather wall" figure
  rans decode   — wire-exact Pallas Nx16 O0 decode, end-to-end (incl.
                  the host<->device tunnel) and kernel-only; the XLA
                  lowering (ops/rans.py) on the same blocks
  inflate       — device DEFLATE (ops/inflate.py) GB/s over BGZF blocks
  rooflines     — fractions of the measured streaming rate (the
                  elementwise ceiling) and the tunnel d2h wall

Every step has an internal wall-clock budget: a killed client wedges
the axon tunnel for ~an hour (memory: axon-tunnel-fragility), so this
script must always exit cleanly on its own.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

T0 = time.time()
BUDGET = float(os.environ.get("HTS_TPU_DEVICE_BUDGET", 480))


def left():
    return BUDGET - (time.time() - T0)


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    out = {"device": str(dev), "measured_at": time.strftime("%Y-%m-%d %H:%M")}
    if dev.platform == "cpu":
        print(json.dumps({"error": "no TPU attached"}))
        return 1

    def sync(v):
        return int(jnp.sum(v.reshape(-1)[:8] & 0xFF).block_until_ready())

    # ---- 1. lookup rate: pallas resolve vs XLA gather chain ----------
    from htslib_tpu.ops.rans_pallas import TOTFREQ, make_resolve_bench
    R = 32768     # amortise the ~8 ms tunnel dispatch floor
    fn, args, _ = make_resolve_bench(G=128, rounds=R, unroll=4)
    r = fn(*args)
    sync(r)
    reps = 5
    t0 = time.time()
    for _ in range(reps):
        r = fn(*args)
    sync(r)
    dt = (time.time() - t0) / reps
    pallas_rate = 128 * R / dt / 1e9
    out["pallas_resolve_Glookups_s"] = round(pallas_rate, 4)

    rng = np.random.RandomState(7)
    packed = jnp.asarray(
        rng.randint(0, 2 ** 31, (128, TOTFREQ)).astype(np.int32))
    x0 = jnp.asarray(rng.randint(1 << 23, 1 << 30, (128,)).astype(np.int32))

    @jax.jit
    def xla_chain(tbl, x):
        def body(_, x):
            m = (x & (TOTFREQ - 1)).astype(jnp.int32)
            e = jnp.take_along_axis(tbl, m[:, None], axis=1)[:, 0]
            f = ((e >> 8) & 0xFFF) + 1
            c = (e >> 20) & 0xFFF
            return f * (x >> 12) + m - c
        return jax.lax.fori_loop(0, R, body, x)

    r = xla_chain(packed, x0)
    sync(r)
    t0 = time.time()
    for _ in range(reps):
        r = xla_chain(packed, x0)
    sync(r)
    dt2 = (time.time() - t0) / reps
    xla_rate = 128 * R / dt2 / 1e9
    out["xla_gather_Glookups_s"] = round(xla_rate, 4)
    out["pallas_vs_xla_lookups"] = round(pallas_rate / xla_rate, 1)

    # ---- 1b. DEFLATE canonical-Huffman resolve ----------------------
    if left() > 300:
        from htslib_tpu.ops.huffman_pallas import (MAXBITS,
                                                   make_huffman_resolve_bench)
        fnh, argsh, _, v0h = make_huffman_resolve_bench(L=128, rounds=R,
                                                        unroll=4)
        r = fnh(*argsh)
        sync(r)
        t0 = time.time()
        for _ in range(reps):
            r = fnh(*argsh)
        sync(r)
        dth = (time.time() - t0) / reps
        hp = 128 * R / dth / 1e9
        out["pallas_huffman_Gresolves_s"] = round(hp, 4)

        flat = jnp.asarray(rng.randint(0, 1 << 24,
                                       (128, 1 << MAXBITS)).astype(np.int32))
        vx = jnp.asarray(v0h[0])

        @jax.jit
        def xla_huff(tbl, v):
            def body(_, v):
                e = jnp.take_along_axis(tbl, v[:, None] & 0x7FFF,
                                        axis=1)[:, 0]
                return ((v * 5 + (e & 0x1FF) * 40503) >> 7) & 0x7FFF
            return jax.lax.fori_loop(0, R, body, v)

        r2 = xla_huff(flat, vx)
        sync(r2)
        t0 = time.time()
        for _ in range(reps):
            r2 = xla_huff(flat, vx)
        sync(r2)
        hx = 128 * R / ((time.time() - t0) / reps) / 1e9
        out["xla_huffman_Gresolves_s"] = round(hx, 4)
        out["pallas_vs_xla_huffman"] = round(hp / hx, 1)

    # ---- 2. rANS Nx16 O0 decode: pallas vs the XLA lowering ----------
    if left() > 240:
        from htslib_tpu.codecs.rans4x16 import compress
        from htslib_tpu.ops.rans_pallas import BLOCKS, decode_nx16_o0_batch
        datas = [rng.randint(0, 40, 128 * 1024).astype(np.uint8).tobytes()
                 for _ in range(BLOCKS)]
        encs = [compress(d, 0x04) for d in datas]
        tot = sum(len(d) for d in datas)
        got = decode_nx16_o0_batch(encs)
        out["pallas_rans_exact"] = bool(
            all(o == d for o, d in zip(got, datas)))
        t0 = time.time()
        for _ in range(3):
            decode_nx16_o0_batch(encs)
        dt = (time.time() - t0) / 3
        out["pallas_rans_nx16_MBps_e2e"] = round(tot / dt / 1e6, 2)

        if left() > 120:
            from htslib_tpu.ops.rans import uncompress_nx16_batch
            got2 = uncompress_nx16_batch(encs)
            t0 = time.time()
            uncompress_nx16_batch(encs)
            dtx = time.time() - t0
            out["xla_rans_nx16_MBps_e2e"] = round(tot / dtx / 1e6, 2)
            out["pallas_vs_xla_rans"] = round(dtx / dt, 2)

    # ---- 2b. end-to-end on-chip workload: decode -> reduce ----------
    # (VERDICT r3 task #2: a real workload through the chip whose
    # output is small — compressed qual streams up once, decoded and
    # histogram-reduced on device, ~1 KB of counts back)
    if left() > 240:
        from htslib_tpu.codecs.rans4x16 import compress
        from htslib_tpu.ops.device_stats import (qualstats_device,
                                                 qualstats_host)
        qdatas = [rng.randint(0, 45, 4 * 1024 * 1024).astype(np.uint8)
                  .tobytes() for _ in range(4)]
        qencs = [compress(d, 0x04) for d in qdatas]
        hist, t = qualstats_device(qencs, reps=3)
        want = qualstats_host(qdatas)
        out["e2e_qualstats_exact"] = bool((hist == want).all())
        out["e2e_qualstats_MBps_uncompressed_onchip"] = \
            t["MBps_uncompressed_resident"]
        out["e2e_qualstats_MBps_input_bytes_onchip"] = round(
            t["compressed_bytes"] / t["decode_s"] / 1e6, 2)
        out["e2e_qualstats_GBps_onchip"] = round(
            t["uncompressed_bytes"] / t["decode_s"] / 1e9, 4)
        # the vanilla CRAM 3.0 wire (rANS 4x8 O0, 32 blocks x 4 states)
        from htslib_tpu.codecs import rans4x8 as _r8
        from htslib_tpu.ops.device_stats import qualstats_device_4x8
        q8 = [rng.randint(0, 45, 1 << 20).astype(np.uint8).tobytes()
              for _ in range(32)]
        e8 = [_r8.compress(d, 0) for d in q8]
        h8, t8 = qualstats_device_4x8(e8, reps=3)
        out["e2e_qualstats_4x8_exact"] = bool(
            (h8 == qualstats_host(q8)).all())
        out["e2e_qualstats_4x8_MBps_onchip"] = \
            t8["MBps_uncompressed_resident"]

    # ---- 2b1. whole-CRAM-file qual stats through the chip -----------
    # (CramWriter(device_profile=True) pins the QS series to the
    # device-decodable 32-way O0 wire; QS blocks stream from the
    # containers straight into the on-chip decode->reduce pipeline)
    if left() > 200:
        try:
            import tempfile

            from htslib_tpu.cram.batch import bam_to_cram_file
            from htslib_tpu.ops.device_stats import cram_qual_hist
            from bench import build_test_bam
            tdir = tempfile.mkdtemp(prefix="htstpu_devcram_")
            dbam = os.path.join(tdir, "d.bam")
            build_test_bam(dbam, n_records=100000)
            dcram = os.path.join(tdir, "d.cram")
            bam_to_cram_file(dbam, dcram, version=(3, 1),
                             device_profile=True)
            st = {}
            cram_qual_hist(dcram, stats=st)        # warm/compile
            t0 = time.time()
            hist = cram_qual_hist(dcram, stats=st)
            dt = time.time() - t0
            out["cram_qualstats_file_MBps"] = round(
                int(hist.sum()) / dt / 1e6, 2)
            out["cram_qualstats_device_blocks"] = st.get("device_blocks")
            # vanilla CRAM 3.0 (no write profile): the 4x8 kernel route
            pcram = os.path.join(tdir, "p30.cram")
            bam_to_cram_file(dbam, pcram)
            st2 = {}
            cram_qual_hist(pcram, stats=st2)       # warm/compile
            t0 = time.time()
            h2 = cram_qual_hist(pcram, stats=st2)
            dt2 = time.time() - t0
            out["cram30_qualstats_file_MBps"] = round(
                int(h2.sum()) / dt2 / 1e6, 2)
            out["cram30_qualstats_device_blocks"] = \
                st2.get("device_blocks")
        except Exception as e:
            out["cram_qualstats_error"] = f"{type(e).__name__}: {e}"[:120]

    # ---- 2b2. device rANS encode (the compression half) -------------
    if left() > 200:
        from htslib_tpu.codecs.rans4x16 import compress as r16c
        from htslib_tpu.ops.rans_enc_pallas import encode_nx16_o0_batch
        edatas = [rng.randint(0, 45, 256 * 1024).astype(np.uint8)
                  .tobytes() for _ in range(4)]
        egot = encode_nx16_o0_batch(edatas)
        out["rans_enc_exact"] = bool(
            all(g == r16c(d, 0x04) for g, d in zip(egot, edatas)))
        te = {}
        encode_nx16_o0_batch(edatas, timing=te)
        out["rans_enc_MBps_e2e"] = round(
            te["bytes"] / te["enc_s"] / 1e6, 2)

    # ---- 2c. device BGZF stored-block write (CRC32 on chip) ----------
    # (VERDICT r3 task #6: the reference's level-0 fast path,
    # bgzf.c:1345; output validated by the reference's bgzip -t)
    if left() > 180:
        from htslib_tpu.ops.bgzf_device import crc_device_rate
        try:
            r = crc_device_rate(n_blocks=128, reps=3)
            out["bgzf_stored_crc_exact"] = r["exact"]
            out["bgzf_stored_blocks_per_s"] = r["blocks_per_s"]
            out["bgzf_stored_MBps"] = r["MBps"]
        except Exception as e:
            out["bgzf_stored_error"] = f"{type(e).__name__}: {e}"[:120]

    # ---- 2c2. entropy-coded device deflate (uniform-L dyn Huffman) ---
    if left() > 150:
        try:
            import gzip as _gz

            from htslib_tpu.ops.bgzf_device import deflate_uniform_device
            qd = (rng.randint(33, 74, 512 * 1024).astype(np.uint8)
                  .tobytes())
            blob = deflate_uniform_device(qd)          # warm/compile
            ok = _gz.decompress(blob) == qd
            t0 = time.time()
            blob = deflate_uniform_device(qd)
            dt = time.time() - t0
            out["bgzf_huffman_valid"] = bool(ok)
            out["bgzf_huffman_ratio"] = round(len(blob) / len(qd), 3)
            out["bgzf_huffman_MBps_e2e"] = round(len(qd) / dt / 1e6, 2)
        except Exception as e:
            out["bgzf_huffman_error"] = f"{type(e).__name__}: {e}"[:120]

    # ---- 3. device inflate ------------------------------------------
    # Round-4 retest: the program that crashed the round-3 worker now
    # runs byte-exact on the chip (16 x 60 KB) — but at ~0.04 MB/s: the
    # XLA gather/scatter lowering wall, quantified.  Production inflate
    # stays on the host; the lane is measured here (small batch) so the
    # artifact carries the real number.  HTS_TPU_SKIP_INFLATE=1 skips.
    if left() > 180 and os.environ.get("HTS_TPU_SKIP_INFLATE") != "1":
        try:
            import zlib

            from htslib_tpu.ops.inflate import inflate_batch
            blocks = []
            sizes = []
            for i in range(8):
                raw = rng.randint(0, 45, 60000).astype(np.uint8).tobytes()
                co = zlib.compressobj(6, zlib.DEFLATED, -15)
                blocks.append(co.compress(raw) + co.flush())
                sizes.append(len(raw))
            res = inflate_batch(blocks, sizes)     # warm/compile
            t0 = time.time()
            res = inflate_batch(blocks, sizes)
            dt = time.time() - t0
            out["device_inflate_MBps"] = round(sum(sizes) / dt / 1e6, 3)
            want_ok = all(
                r == zlib.decompress(b, -15)
                for r, b in zip(res, blocks))
            out["device_inflate_exact"] = bool(want_ok)
        except Exception as e:  # keep the artifact even if this leg dies
            out["device_inflate_error"] = f"{type(e).__name__}: {e}"[:120]

    # ---- rooflines ---------------------------------------------------
    # measured ceilings from docs/DEVICE_LIMITS.md's probes
    out["roofline"] = {
        "streaming_elementwise_GBps": 251.0,
        "tunnel_d2h_MBps": 33.0,
        "resolve_vs_streaming": round(
            pallas_rate * 4 / 251.0, 4),     # 4B loads per lookup
        "e2e_qualstats_vs_tunnel": round(
            out.get("e2e_qualstats_MBps_uncompressed_onchip", 0) / 33.0,
            1),
        "note": "bulk-byte outputs are capped by the 25-33 MB/s axon "
                "tunnel; the e2e_qualstats lane avoids it by reducing "
                "on device (counts out, not bytes)",
    }

    path = os.path.join(REPO, "DEVICE_BENCH.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
