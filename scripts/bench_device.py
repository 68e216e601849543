#!/usr/bin/env python
"""Device-path benchmark: measures on the attached TPU and writes
DEVICE_BENCH.json at the repo root, which bench.py folds into its
`device` section.

Round-5 form: the rANS kernel family (O0/O1, Nx16/4x8, decode+encode)
after the width/latency redesign (docs/DEVICE_LIMITS.md round-5
section), whole-CRAM-file lanes over BOTH a realistic
(correlated-quality) and a uniform-random file, with the same-minute
tunnel rates recorded next to them (the file lanes are h2d-bound and
the tunnel drifts 2-3x within a session).

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
BUDGET = float(os.environ.get("HTS_TPU_DEVICE_BUDGET", 900))


def left():
    return BUDGET - (time.time() - T0)


def build_realistic_bam(path, n_records=100000, read_len=100, seed=11):
    """build_test_bam records with Illumina-like correlated qualities
    (per-read random walk) — real quality strings are strongly
    serially correlated, which is what makes O1/compression real."""
    from bench import build_test_bam

    from htslib_tpu.sam import BamReader, BamWriter
    rng = np.random.default_rng(seed)
    build_test_bam(path + ".tmp", n_records, read_len, seed)
    with BamReader(path + ".tmp") as r:
        hdr = r.header
        recs = list(r)
    steps = rng.integers(-2, 3, (n_records, read_len))
    quals = np.clip(np.cumsum(steps, axis=1) + 32, 2, 40).astype(np.uint8)
    with BamWriter(path, hdr, level=6) as w:
        for i, rec in enumerate(recs):
            rec.qual = quals[i].tobytes()
            w.write(rec)
    os.unlink(path + ".tmp")
    return n_records


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

    def tunnel_rates():
        x = np.random.randint(0, 255, 4 << 20, dtype=np.uint8)
        jnp.asarray(x[:1024]).block_until_ready()
        t0 = time.time()
        xj = jnp.asarray(x)
        xj.block_until_ready()
        h2d = len(x) / (time.time() - t0) / 1e6
        t0 = time.time()
        np.asarray(xj)
        d2h = len(x) / (time.time() - t0) / 1e6
        return round(h2d, 1), round(d2h, 1)

    rng = np.random.RandomState(7)

    def walk(n, lo=2, hi=41, start=32):
        return np.clip(np.cumsum(rng.randint(-2, 3, n)) + start, lo,
                       hi - 1).astype(np.uint8).tobytes()

    # ---- 1. resolve primitive (the gather-wall figure) ---------------
    from htslib_tpu.ops.rans_pallas import TOTFREQ, make_resolve_bench
    R = 32768
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
    xla_rate = 128 * R / ((time.time() - t0) / reps) / 1e9
    out["xla_gather_Glookups_s"] = round(xla_rate, 4)
    out["pallas_vs_xla_lookups"] = round(pallas_rate / xla_rate, 1)

    # ---- 2. the rANS kernel family, device-resident rates ------------
    from htslib_tpu.codecs import rans4x8 as r8
    from htslib_tpu.codecs.rans4x16 import compress as r16c
    from htslib_tpu.ops.device_stats import (qualstats_device,
                                             qualstats_device_4x8,
                                             qualstats_device_o1,
                                             qualstats_host)
    import htslib_tpu.ops.rans_pallas as rp

    if left() > 500:
        # O0 Nx16 decode (wire-exact bytes out) + stats lane
        datas = [rng.randint(0, 45, 1 << 20).astype(np.uint8).tobytes()
                 for _ in range(rp.BLOCKS)]
        encs = [r16c(d, 0x04) for d in datas]
        got = rp.decode_nx16_o0_batch(encs[:4])
        out["pallas_rans_exact"] = bool(
            all(o == d for o, d in zip(got, datas[:4])))
        hist, t = qualstats_device(encs, reps=3)
        out["rans_nx16_o0_exact"] = bool(
            (hist == qualstats_host(datas)).all())
        out["rans_nx16_o0_MBps_resident"] = \
            t["MBps_uncompressed_resident"]
        # back-compat keys for older tooling
        out["e2e_qualstats_exact"] = out["rans_nx16_o0_exact"]
        out["e2e_qualstats_MBps_uncompressed_onchip"] = \
            out["rans_nx16_o0_MBps_resident"]

    if left() > 420:
        # O1 Nx16 decode (sparse real-data tables)
        datas = [walk(1 << 20) for _ in range(32)]
        encs = [r16c(d, 0x05) for d in datas]
        h, t = qualstats_device_o1(encs, reps=3)
        out["rans_nx16_o1_exact"] = bool(
            (h == qualstats_host(datas)).all())
        out["rans_nx16_o1_MBps_resident"] = \
            t["MBps_uncompressed_resident"]

    if left() > 360:
        # 4x8 both orders (the CRAM 3.0 wire)
        datas = [rng.randint(0, 45, 1 << 19).astype(np.uint8).tobytes()
                 for _ in range(64)]
        e0 = [r8.compress(d, 0) for d in datas]
        h0, t0_ = qualstats_device_4x8(e0, reps=3)
        out["rans_4x8_o0_exact"] = bool(
            (h0 == qualstats_host(datas)).all())
        out["rans_4x8_o0_MBps_resident"] = \
            t0_["MBps_uncompressed_resident"]
        out["e2e_qualstats_4x8_exact"] = out["rans_4x8_o0_exact"]
        out["e2e_qualstats_4x8_MBps_onchip"] = \
            out["rans_4x8_o0_MBps_resident"]
        w1 = [walk(1 << 19) for _ in range(64)]
        e1 = [r8.compress(d, 1) for d in w1]
        h1, t1_ = qualstats_device_4x8(e1, o1=True, reps=3)
        out["rans_4x8_o1_exact"] = bool(
            (h1 == qualstats_host(w1)).all())
        out["rans_4x8_o1_MBps_resident"] = \
            t1_["MBps_uncompressed_resident"]

    # ---- 2b. device rANS ENCODE --------------------------------------
    if left() > 300:
        from htslib_tpu.ops.rans_enc_pallas import (BLOCKS_E,
                                                    encode_nx16_o0_batch)
        edatas = [rng.randint(0, 45, 1 << 20).astype(np.uint8)
                  .tobytes() for _ in range(BLOCKS_E)]
        te = {}
        egot = encode_nx16_o0_batch(edatas, timing=te)
        out["rans_enc_exact"] = bool(
            all(g == r16c(d, 0x04) for g, d in zip(egot, edatas)))
        out["rans_enc_MBps_resident"] = round(
            te["bytes"] / te["enc_resident_s"] / 1e6, 2)
        out["rans_enc_MBps_e2e"] = round(
            te["bytes"] / te["enc_s"] / 1e6, 2)
        out["rans_enc_e2e_note"] = (
            "e2e ships 1 B/B of symbols up and ~2 B/B of word/mask "
            "planes down through the 16-54 MB/s axon tunnel plus host "
            "numpy compaction — arithmetically capped far below the "
            "kernel rate on this rig; the resident number is the "
            "hardware rate (PCIe/ICI hosts see it at file level)")

    # ---- 3. whole-CRAM-file qual stats through the chip --------------
    if left() > 240:
        try:
            import tempfile

            from htslib_tpu.cram.batch import bam_to_cram_file
            from htslib_tpu.ops.device_stats import cram_qual_hist
            from bench import build_test_bam
            tdir = tempfile.mkdtemp(prefix="htstpu_devcram_")
            rbam = os.path.join(tdir, "real.bam")
            build_realistic_bam(rbam)
            ubam = os.path.join(tdir, "uni.bam")
            build_test_bam(ubam, n_records=100000)
            cases = [
                ("cram31_real", rbam, dict(version=(3, 1),
                                           device_profile=True)),
                ("cram30_real", rbam, dict()),
                ("cram31_uniform", ubam, dict(version=(3, 1),
                                              device_profile=True)),
                ("cram30_uniform", ubam, dict()),
            ]
            for name, bam, kw in cases:
                if left() < 120:
                    break
                cram = os.path.join(tdir, name + ".cram")
                bam_to_cram_file(bam, cram, **kw)
                st = {}
                cram_qual_hist(cram, stats=st)        # warm/compile
                h2d, d2h = tunnel_rates()
                best = None
                for _ in range(3):
                    t0 = time.time()
                    h = cram_qual_hist(cram, stats=st)
                    dt = time.time() - t0
                    best = dt if best is None else min(best, dt)
                out[name + "_qualstats_file_MBps"] = round(
                    int(h.sum()) / best / 1e6, 2)
                out[name + "_device_blocks"] = st.get("device_blocks")
                out[name + "_host_blocks"] = st.get("host_blocks")
                out[name + "_h2d_MBps_same_minute"] = h2d
            # back-compat keys
            out["cram_qualstats_file_MBps"] = out.get(
                "cram31_real_qualstats_file_MBps")
            out["cram_qualstats_device_blocks"] = out.get(
                "cram31_real_device_blocks")
            out["cram30_qualstats_file_MBps"] = out.get(
                "cram30_real_qualstats_file_MBps")
            out["cram30_qualstats_device_blocks"] = out.get(
                "cram30_real_device_blocks")
        except Exception as e:
            out["cram_qualstats_error"] = f"{type(e).__name__}: {e}"[:160]

    # ---- 4. device BGZF stored-block write (CRC32 on chip) -----------
    if left() > 150:
        from htslib_tpu.ops.bgzf_device import crc_device_rate
        try:
            r = crc_device_rate(n_blocks=128, reps=3)
            out["bgzf_stored_crc_exact"] = r["exact"]
            out["bgzf_stored_blocks_per_s"] = r["blocks_per_s"]
            out["bgzf_stored_MBps"] = r["MBps"]
        except Exception as e:
            out["bgzf_stored_error"] = f"{type(e).__name__}: {e}"[:120]

    # ---- 5. entropy-coded device deflate (uniform-L dyn Huffman) -----
    if left() > 120:
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

    # ---- 6. device inflate: settled — see the split probe ------------
    try:
        with open(os.path.join(REPO, "PROBE_INFLATE_SPLIT.json")) as f:
            sp = json.load(f)
        out["inflate_split"] = {
            "passA_MBps": sp.get("passA_MBps"),
            "split_pipelined_MBps": sp.get("split_pipelined_MBps"),
            "host_zlib_1core_MBps": sp.get("host_zlib_1core_MBps"),
            "verdict": "split dead: pass A is the wall; wire inflate "
                       "stays host-side (docs/DEVICE_LIMITS.md r5)",
        }
    except (OSError, ValueError):
        pass

    # ---- rooflines / tunnel --------------------------------------------
    h2d, d2h = tunnel_rates()
    out["tunnel_h2d_MBps_at_end"] = h2d
    out["tunnel_d2h_MBps_at_end"] = d2h
    out["roofline"] = {
        "streaming_elementwise_GBps": 251.0,
        "note": "file-level lanes are h2d-tunnel-bound (see "
                "docs/DEVICE_LIMITS.md round-5 'honest formula'); "
                "kernel-resident rates are the hardware numbers. "
                "The O0 decode kernel runs at ~66% of its op-issue "
                "bound at the VMEM-limited 1024-lane width.",
        "rans_o0_vs_issue_bound": 0.66,
    }

    path = os.path.join(REPO, "DEVICE_BENCH.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
