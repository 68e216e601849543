"""Device kernels for BAM record unpacking and SAM text staging.

The batch layout: records padded to a fixed per-batch max read length,
with validity masks — XLA-friendly static shapes (SURVEY §7 design
stance).  Kernels:

  * unpack_core_fields: [N,32] uint8 record cores -> int32 columns
    (the vectorised bam_read1 field extraction, sam.c:809-822)
  * nibble_to_base: packed 4-bit sequences -> ASCII bases (the
    simd.c:121 nibble2base SSSE3/NEON path, as a Pallas kernel)
  * qual_to_ascii: qual+33 with '*' masking
  * dec_len / write_ints_device: vectorised int->decimal staging
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SEQ_NT16_STR = "=ACMGRSVTWYHKDBN"
_NT16_ARR = np.frombuffer(SEQ_NT16_STR.encode(), np.uint8)


@jax.jit
def unpack_core_fields(cores: jax.Array) -> dict:
    """cores: uint8 [N, 32] -> dict of int32 columns."""
    c = cores.astype(jnp.int32)

    def u32(i):
        return c[:, i] | (c[:, i + 1] << 8) | (c[:, i + 2] << 16) | (c[:, i + 3] << 24)

    def u16(i):
        return c[:, i] | (c[:, i + 1] << 8)

    return {
        "tid": u32(0),
        "pos": u32(4),
        "l_qname": c[:, 8],
        "mapq": c[:, 9],
        "bin": u16(10),
        "n_cigar": u16(12),
        "flag": u16(14),
        "l_qseq": u32(16),
        "mtid": u32(20),
        "mpos": u32(24),
        "tlen": u32(28),
    }


def _nibble_kernel(packed_ref, lut_ref, out_ref):
    """Pallas kernel: expand packed 4-bit codes to ASCII.

    packed: uint8 [rows, W]; out: uint8 [rows, 2W].  The 16-way LUT is
    evaluated as a select chain (VPU-friendly; no gather needed)."""
    p = packed_ref[:]
    hi = (p >> 4).astype(jnp.int32)
    lo = (p & 0xF).astype(jnp.int32)

    def lut(codes):
        out = jnp.zeros_like(codes)
        for i in range(16):
            out = jnp.where(codes == i, int(_NT16_ARR[i]), out)
        return out.astype(jnp.uint8)

    rows, w = p.shape
    expanded = jnp.stack([lut(hi), lut(lo)], axis=-1).reshape(rows, 2 * w)
    out_ref[:] = expanded


def nibble_to_base_pallas(packed: jax.Array, interpret: bool = False) -> jax.Array:
    """packed uint8 [rows, W] -> ASCII uint8 [rows, 2W]."""
    rows, w = packed.shape
    lut = jnp.asarray(_NT16_ARR)
    return pl.pallas_call(
        _nibble_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, 2 * w), jnp.uint8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY if False else pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(packed, lut)


@jax.jit
def nibble_to_base(packed: jax.Array) -> jax.Array:
    """XLA reference path for the same op (fused LUT take)."""
    lut = jnp.asarray(_NT16_ARR)
    hi = lut[(packed >> 4).astype(jnp.int32)]
    lo = lut[(packed & 0xF).astype(jnp.int32)]
    rows, w = packed.shape
    return jnp.stack([hi, lo], axis=-1).reshape(rows, 2 * w)


@jax.jit
def qual_to_ascii(qual: jax.Array, mask: jax.Array) -> jax.Array:
    """qual uint8 [N, L] + validity mask -> ASCII (qual+33), 0 padding."""
    return jnp.where(mask, qual + 33, 0).astype(jnp.uint8)


_POW10_I32 = [1, 10, 100, 1000, 10 ** 4, 10 ** 5, 10 ** 6, 10 ** 7,
              10 ** 8, 10 ** 9]


@jax.jit
def dec_len_device(x: jax.Array) -> jax.Array:
    """Formatted decimal length of int32 values in (-2^31, 2^31)
    (digits + sign), int32-safe (x64 mode not required)."""
    x = x.astype(jnp.int32)
    neg = (x < 0).astype(jnp.int32)
    ax = jnp.abs(x)
    nd = jnp.ones_like(ax)
    for p in _POW10_I32[1:]:
        nd = nd + (ax >= p).astype(jnp.int32)
    return nd + neg


@functools.partial(jax.jit, static_argnames=("max_digits",))
def itoa_fixed(x: jax.Array, max_digits: int = 11) -> jax.Array:
    """Right-aligned decimal ASCII of int32 values in a fixed
    [N, max_digits] buffer, zero-padded on the left (device analogue of
    write_ints)."""
    x = x.astype(jnp.int32)
    neg = x < 0
    ax = jnp.abs(x)
    nd = dec_len_device(x) - neg.astype(jnp.int32)
    # digit for output column c (from the right): (ax // 10^(md-1-c)) % 10
    pows = jnp.asarray([_POW10_I32[min(max_digits - 1 - c, 9)]
                        for c in range(max_digits)], jnp.int32)
    digits = (ax[:, None] // pows[None, :]) % 10
    col_from_right = jnp.arange(max_digits - 1, -1, -1, dtype=jnp.int32)
    live = col_from_right[None, :] < nd[:, None]
    out = jnp.where(live, digits + 48, 0).astype(jnp.uint8)
    sign_col = max_digits - 1 - nd
    put_sign = neg[:, None] & (jnp.arange(max_digits)[None, :] == sign_col[:, None])
    return jnp.where(put_sign, ord("-"), out).astype(jnp.uint8)
