#!/usr/bin/env python
"""Device-path benchmarks (secondary metrics; see docs/DEVICE_LIMITS.md).

Measures the on-device kernels against the same inputs the host path
uses.  Run on the TPU attachment: `python scripts/bench_device.py`.
Prints one JSON object.
"""
import json
import os
import sys
import time
import zlib

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_inflate(n_blocks=32):
    """Device DEFLATE inflate GB/s over BAM-like 64 KiB blocks."""
    from htslib_tpu.ops.inflate import inflate_batch
    rng = np.random.RandomState(7)
    blocks = []
    for _ in range(n_blocks):
        # BAM-ish payload: binary core + names + packed seq + quals
        parts = []
        total = 0
        while total < 65000:
            rec = (rng.randint(0, 256, 32).astype(np.uint8).tobytes()
                   + b"read_%08d\x00" % rng.randint(0, 10**8)
                   + rng.randint(0, 256, 50).astype(np.uint8).tobytes()
                   + bytes(33 + q for q in rng.randint(0, 8, 100)))
            parts.append(rec)
            total += len(rec)
        blocks.append(b"".join(parts)[:65000])
    payloads = []
    for d in blocks:
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        payloads.append(co.compress(d) + co.flush())
    isizes = [len(d) for d in blocks]
    out = inflate_batch(payloads, isizes, batch=n_blocks)   # compile+check
    assert all(o == d for o, d in zip(out, blocks))
    t0 = time.time()
    inflate_batch(payloads, isizes, batch=n_blocks)
    dt = time.time() - t0
    return {
        "blocks": n_blocks,
        "uncompressed_mb": round(sum(isizes) / 1e6, 1),
        "seconds": round(dt, 2),
        "gbps": round(sum(isizes) / dt / 1e9, 4),
    }


def bench_rans(n_blocks=16, block_sz=65536):
    """Device rANS 4x8 decode MB/s vs the host codec."""
    from htslib_tpu.codecs import rans4x8
    from htslib_tpu.ops.rans import uncompress_batch
    rng = np.random.RandomState(3)
    datas = [bytes(np.clip(np.cumsum(rng.randint(-2, 3, block_sz)) + 40,
                           33, 73).astype(np.uint8))
             for _ in range(n_blocks)]
    blocks = [rans4x8.compress(d, o % 2) for o, d in enumerate(datas)]
    total = sum(len(d) for d in datas)
    out = uncompress_batch(blocks)      # compile + check
    assert out == datas
    t0 = time.time()
    uncompress_batch(blocks)
    dt = time.time() - t0
    t0 = time.time()
    host = [rans4x8.uncompress(b) for b in blocks]
    dt_host = time.time() - t0
    assert host == datas
    return {
        "blocks": n_blocks,
        "uncompressed_mb": round(total / 1e6, 1),
        "device_MBps": round(total / dt / 1e6, 2),
        "host_native_MBps": round(total / dt_host / 1e6, 2),
    }


def main():
    result = {"note": "secondary device metrics; headline is bench.py "
                      "(host pipeline) — rationale in docs/DEVICE_LIMITS.md"}
    result["device_inflate"] = bench_inflate()
    result["device_rans4x8"] = bench_rans()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
