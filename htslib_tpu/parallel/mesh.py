"""Device-mesh scale-out (SURVEY §2.5: the reference is single-process
pthreads; the pod-level layer is new TPU-native design).

Sharding layout:
  * "data" axis: BGZF block batches / record batches are embarrassingly
    parallel -> shard the batch dimension (P1/P4 strategies).
  * genomic-coordinate sharding: pileup tiles are disjoint (tid, beg,
    end) windows; per-tile partial counts merge with psum over the mesh
    (the only cross-device communication, plus ±max_read_len halos at
    tile edges).
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from htslib_tpu.ops.pileup_kernel import coverage_tile
from htslib_tpu.ops.seqfmt import nibble_to_base, unpack_core_fields


def make_mesh(devices: Optional[Sequence] = None, n: Optional[int] = None,
              axis: str = "data") -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    if n is not None:
        devs = devs[:n]
    import numpy as np
    return Mesh(np.array(devs), (axis,))


def make_decode_pileup_step(mesh: Mesh, tile_len: int = 1 << 14):
    """The flagship distributed step: each device decodes its shard of the
    record batch (core unpack + nibble expand) and accumulates pileup
    coverage for a shared genome tile; tile counts merge via psum over
    ICI.  Returns a jitted fn over mesh-sharded inputs."""

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("data"), P("data"), P("data"), P("data"), P("data"), P()),
        out_specs=(P(), P("data"), P("data")),
        check_vma=False,
    )
    def step(cores, seq4, starts, ends, valid, tile_start):
        fields = unpack_core_fields(cores)
        bases = nibble_to_base(seq4)
        cov_local = coverage_tile(starts, ends, valid, tile_start[0], tile_len)
        cov = jax.lax.psum(cov_local, "data")
        # per-shard summaries stay sharded (no gather needed)
        flag_hist = fields["flag"].astype(jnp.int32)
        return cov, bases, flag_hist

    return jax.jit(step)


def shard_batch(mesh: Mesh, *arrays, axis: str = "data"):
    """Place arrays with their leading dim sharded over the mesh."""
    out = []
    for a in arrays:
        spec = P(axis) if a.ndim >= 1 else P()
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out)
