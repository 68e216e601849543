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


def make_coord_sharded_pileup(mesh: Mesh, tile_len: int = 1 << 14,
                              halo: int = 1 << 10, axis: str = "data"):
    """Genomic-coordinate sharding (SURVEY §5): device d owns the tile
    [d*tile_len, (d+1)*tile_len) and receives the reads *starting* in its
    tile.  Reads extend rightward up to `halo` bases (>= max read span),
    so each device accumulates an extended tile and ships the spill-over
    tail to its right neighbour with a one-hop ppermute — the halo
    exchange that is the only neighbour communication in the system.

    Returns a jitted fn (starts, ends, valid) -> coverage, where inputs
    are per-device read shards (global genome coordinates) and the output
    is the genome coverage of all tiles, coordinate-sharded over the
    mesh.
    """
    ndev = mesh.devices.size

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    def step(starts, ends, valid):
        idx = jax.lax.axis_index(axis)
        tile_start = (idx * tile_len).astype(jnp.int32)
        cov_ext = coverage_tile(starts, ends, valid, tile_start,
                                tile_len + halo)
        own = cov_ext[:tile_len]
        spill = cov_ext[tile_len:]
        # ship the tail one hop right; the wrap-around edge (last -> 0)
        # is zero for genomes that do not wrap because no read extends
        # past the last tile's halo
        recv = jax.lax.ppermute(spill, axis,
                                [(i, (i + 1) % ndev) for i in range(ndev)])
        # device 0's inbound spill wrapped from the last tile: that
        # coverage lies beyond the genome end and is dropped (clip
        # semantics, matching hts_pos clamping)
        recv = jnp.where(idx == 0, 0, recv)
        own = own.at[:halo].add(recv)
        return own

    return jax.jit(step)


def shard_batch(mesh: Mesh, *arrays, axis: str = "data"):
    """Place arrays with their leading dim sharded over the mesh."""
    out = []
    for a in arrays:
        spec = P(axis) if a.ndim >= 1 else P()
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out)


def make_flagstat_step(mesh: Mesh, axis: str = "data"):
    """samtools flagstat as a mesh reduction: each device counts the
    flag categories of its record shard and the [11] counters merge
    with one psum over ICI (categories match
    parallel/distributed.flagstat_shard)."""

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P(axis), P(axis)),
        out_specs=P(), check_vma=False)
    def step(flags, valid):
        f = flags.astype(jnp.int32)
        v = valid
        def cnt(mask):
            return jnp.sum(jnp.where(v & mask, 1, 0))
        counts = jnp.stack([
            jnp.sum(v.astype(jnp.int32)),
            cnt((f & 0x100) != 0),                      # secondary
            cnt((f & 0x800) != 0),                      # supplementary
            cnt((f & 0x400) != 0),                      # duplicate
            cnt((f & 4) == 0),                          # mapped
            cnt((f & 1) != 0),                          # paired
            cnt((f & 0x40) != 0),                       # read1
            cnt((f & 0x80) != 0),                       # read2
            cnt((f & 2) != 0),                          # proper pair
            cnt(((f & 1) != 0) & ((f & 4) == 0) & ((f & 8) == 0)),
            cnt(((f & 1) != 0) & ((f & 4) == 0) & ((f & 8) != 0)),
        ])
        return jax.lax.psum(counts, axis)

    return jax.jit(step)
