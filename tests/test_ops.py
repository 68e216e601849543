"""Device op tests: JAX/Pallas kernels must match the numpy goldens, and
the multi-device mesh step must compile + execute on an 8-device virtual
CPU mesh.  Runs in a clean-env subprocess where the axon tunnel plugin
would otherwise break XLA:CPU."""
import pytest

from tests.conftest import clean_jax_run

_OPS_CODE = r"""
import numpy as np
import jax, jax.numpy as jnp
from htslib_tpu.ops.seqfmt import (unpack_core_fields, nibble_to_base,
                                   nibble_to_base_pallas, qual_to_ascii,
                                   dec_len_device, itoa_fixed)
from htslib_tpu.sam.record import BamRecord, SEQ_NT16_STR
from htslib_tpu.sam.batch import dec_len

rng = np.random.default_rng(0)

# core unpack matches BamRecord parsing
recs = []
for i in range(16):
    rec = BamRecord()
    rec.qname = f"r{i}".encode()
    rec.tid = int(rng.integers(-1, 3))
    rec.pos = int(rng.integers(0, 1000000))
    rec.flag = int(rng.integers(0, 4096))
    rec.mapq = int(rng.integers(0, 255))
    rec.set_seq("ACGT" * 8)
    recs.append(rec)
cores = np.stack([np.frombuffer(r.to_bam_buffer()[:32], np.uint8)
                  for r in recs])
fields = unpack_core_fields(jnp.asarray(cores))
assert list(np.asarray(fields["pos"])) == [r.pos for r in recs]
assert list(np.asarray(fields["flag"])) == [r.flag for r in recs]
assert list(np.asarray(fields["tid"])) == [r.tid for r in recs]
assert list(np.asarray(fields["l_qseq"])) == [32] * 16

# nibble expansion matches record seq
packed = np.stack([np.frombuffer(r.seq4, np.uint8) for r in recs])
bases = np.asarray(nibble_to_base(jnp.asarray(packed)))
assert bytes(bases[0]).decode() == recs[0].seq
bases_p = np.asarray(nibble_to_base_pallas(jnp.asarray(packed), interpret=True))
assert np.array_equal(bases, bases_p)

# itoa matches host dec_len/str
vals = np.array([0, 1, -1, 99, -100, 12345, 2**31 - 1, -(2**31) + 1], np.int64)
assert list(np.asarray(dec_len_device(jnp.asarray(vals)))) == list(dec_len(vals))
buf = np.asarray(itoa_fixed(jnp.asarray(vals), max_digits=12))
for i, v in enumerate(vals):
    s = bytes(buf[i]).replace(b"\x00", b"").decode()
    assert s == str(v), (s, v)

# pileup coverage matches brute force
from htslib_tpu.ops.pileup_kernel import coverage_tile
starts = rng.integers(0, 900, 50).astype(np.int32)
ends = (starts + rng.integers(1, 120, 50)).astype(np.int32)
valid = rng.random(50) > 0.2
cov = np.asarray(coverage_tile(jnp.asarray(starts), jnp.asarray(ends),
                               jnp.asarray(valid), jnp.int32(0), 1024))
brute = np.zeros(1024, np.int32)
for s, e, v in zip(starts, ends, valid):
    if v:
        brute[s:min(e, 1024)] += 1
assert np.array_equal(cov, brute)
print("OPS_OK")
"""

_MESH_CODE = r"""
from __graft_entry__ import _dryrun_impl
_dryrun_impl(8)
print("MESH_OK")
"""


@pytest.mark.slow
def test_device_ops_match_goldens():
    out = clean_jax_run(_OPS_CODE)
    assert "OPS_OK" in out


@pytest.mark.slow
def test_mesh_dryrun_8_devices():
    out = clean_jax_run(_MESH_CODE)
    assert "MESH_OK" in out


_RANS_CODE = r"""
import os
os.environ["HTS_TPU_NO_NATIVE"] = "1"   # exercise the pure-python encoders
import numpy as np
from htslib_tpu.codecs import rans4x8, rans4x16
from htslib_tpu.ops.rans import uncompress_batch, uncompress_nx16_batch
rng = np.random.default_rng(7)

# ---- 4x8: mixed order-0/order-1, tails included, no host fallback ----
blocks, wants = [], []
for i in range(8):
    n = int(rng.integers(1, 800)) * 4 + int(rng.integers(0, 4))
    data = rng.integers(30, 80, n, dtype=np.uint8).tobytes()
    order = int(i % 2)
    blocks.append(rans4x8.compress(data, order))
    wants.append(data)
qualish = np.clip(np.cumsum(rng.integers(-2, 3, 5003)) + 40, 33,
                  73).astype(np.uint8).tobytes()
blocks.append(rans4x8.compress(qualish, 1))
wants.append(qualish)
odd = rng.integers(0, 255, 1001, dtype=np.uint8).tobytes()
blocks.append(rans4x8.compress(odd, 0))
wants.append(odd)
got = uncompress_batch(blocks)
for g, w in zip(got, wants):
    assert g == w
print("RANS4x8_OK")

# ---- Nx16 core: plain order-0/1, 4- and 32-way, tails ----
blocks, wants = [], []
for i in range(8):
    n = int(rng.integers(1, 3000))
    data = np.clip(rng.integers(0, 50, n), 0, 255).astype(np.uint8).tobytes()
    fl = [0, 1, 4, 5][i % 4]
    blocks.append(rans4x16.compress(data, fl))
    wants.append(data)
got = uncompress_nx16_batch(blocks)
for g, w in zip(got, wants):
    assert g == w
print("RANSNX16_OK")
"""


@pytest.mark.slow
def test_device_rans_batch_decode():
    out = clean_jax_run(_RANS_CODE)
    assert "RANS4x8_OK" in out
    assert "RANSNX16_OK" in out


_HALO_CODE = r"""
import numpy as np
import jax
from htslib_tpu.parallel.mesh import make_mesh, make_coord_sharded_pileup, shard_batch

TILE, HALO, NDEV = 1024, 256, 8
mesh = make_mesh(n=NDEV)
step = make_coord_sharded_pileup(mesh, tile_len=TILE, halo=HALO)
rng = np.random.default_rng(3)

# reads assigned to the device owning their start tile; spans <= HALO
per_dev = 64
starts_l, ends_l, valid_l = [], [], []
for d in range(NDEV):
    s = (d * TILE + rng.integers(0, TILE, per_dev)).astype(np.int32)
    e = (s + rng.integers(1, HALO, per_dev)).astype(np.int32)
    v = rng.random(per_dev) > 0.1
    starts_l.append(s); ends_l.append(e); valid_l.append(v)
starts = np.concatenate(starts_l); ends = np.concatenate(ends_l)
valid = np.concatenate(valid_l)
sh = shard_batch(mesh, starts, ends, valid)
cov = np.asarray(step(*sh))
assert cov.shape == (NDEV * TILE,)

brute = np.zeros(NDEV * TILE, np.int32)
for s, e, v in zip(starts, ends, valid):
    if v:
        brute[s:min(e, NDEV * TILE)] += 1
assert np.array_equal(cov, brute), (np.abs(cov - brute).sum(),)
print("HALO_OK")
"""


@pytest.mark.slow
def test_coord_sharded_pileup_halo_exchange():
    # coverage across tile boundaries must match brute force exactly:
    # the ppermute halo exchange moves spill-over counts to the right
    # neighbour (SURVEY §5 genomic-coordinate sharding)
    out = clean_jax_run(_HALO_CODE)
    assert "HALO_OK" in out
