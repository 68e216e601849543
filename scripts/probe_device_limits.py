#!/usr/bin/env python
"""Measure the device/host boundary limits that govern kernel design.

Run on the target TPU attachment (here: one v5e chip behind the axon
tunnel).  Numbers feed docs/DEVICE_LIMITS.md and explain which htslib
subsystems can profitably run on-device on this rig.

Note: through the axon tunnel, `block_until_ready` returns before
remote execution completes, so every timing below synchronises by
fetching a value derived from the result.
"""
import json
import time

import numpy as np


def sync_scalar(x):
    import jax.numpy as jnp
    return int(jnp.sum(x.reshape(-1)[:8]).block_until_ready())


def main():
    import jax
    import jax.numpy as jnp

    out = {"device": str(jax.devices()[0])}
    rng = np.random.RandomState(0)

    # --- dispatch floor -------------------------------------------------
    f = jax.jit(lambda x: x * 2 + 1)
    x = jnp.ones((256, 1024), jnp.int32)
    sync_scalar(f(x))
    t0 = time.time()
    for _ in range(20):
        r = f(x)
    sync_scalar(r)
    out["dispatch_ms"] = round((time.time() - t0) / 20 * 1e3, 3)

    # --- host->device, incompressible ----------------------------------
    big = rng.randint(0, 255, 32 << 20, dtype=np.int64).astype(np.uint8)
    t0 = time.time()
    d = jax.device_put(big)
    sync_scalar(d.astype(jnp.int32))
    out["h2d_random_MBps"] = round(32 / (time.time() - t0), 1)

    # --- device->host, incompressible ----------------------------------
    gen = jax.jit(lambda k: jax.random.randint(
        k, (32 << 20,), 0, 256, jnp.int32).astype(jnp.uint8))
    y = gen(jax.random.PRNGKey(1))
    sync_scalar(y)
    t0 = time.time()
    _ = np.asarray(y)
    out["d2h_random_MBps"] = round(32 / (time.time() - t0), 1)

    # --- random gather rate (serial chain, the pointer-chase shape) ----
    B, P = 64, 1 << 18

    def chain(g):
        for _ in range(16):
            g = jnp.take_along_axis(g, g, axis=1)
        return (g + 1) & (P - 1)

    cf = jax.jit(chain)
    g = jnp.asarray(rng.randint(0, P, (B, P)).astype(np.int32))
    g = cf(g)
    sync_scalar(g)
    t0 = time.time()
    for _ in range(3):
        g = cf(g)
    sync_scalar(g)
    dt = (time.time() - t0) / 3
    out["gather_Gelem_s"] = round(16 * B * P / dt / 1e9, 3)

    # --- streaming elementwise rate (the fusable-op shape) --------------
    big2 = jnp.asarray(rng.randint(0, 1 << 30, (64 << 20,)).astype(np.int32))

    def stream(v):
        for _ in range(8):
            v = (v ^ (v >> 13)) * jnp.int32(-1640531527) + 1
        return v

    sf = jax.jit(stream)
    v = sf(big2)
    sync_scalar(v)
    t0 = time.time()
    for _ in range(3):
        v = sf(v)
    sync_scalar(v)
    dt = (time.time() - t0) / 3
    out["elementwise_GBps"] = round(8 * big2.size * 4 * 2 / dt / 1e9, 1)

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
