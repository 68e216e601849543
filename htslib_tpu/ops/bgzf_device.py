"""Device-side BGZF write path: batched [N, 64Ki] -> byte-valid BGZF
stored blocks, with the only real computation — CRC32 — running on the
TPU (VERDICT r3 task #6; the reference's level-0 fast path,
bgzf.c:1345 deflate_buffer_level0 / bgzf.c:561 bgzf_compress).

Stored DEFLATE is the TPU-native choice for the write side on this
hardware: Huffman bit-packing is a variable-length scatter (gather-wall
territory, docs/DEVICE_LIMITS.md), while the stored path is framing +
CRC32 — and CRC32 over GF(2) is *linear*, so it vectorises perfectly:

    crc(m) = crc0(n)  XOR  (+)_{set bits k} D_n[k]

where D_n[k] is the (precomputed) contribution of message bit k through
the remaining zero-byte LFSR steps.  The kernel is one masked-select
plus a XOR-reduction per block — regular streaming work at HBM speed,
no tables gathered per byte.

Layout per BGZF block (htslib/bgzf.h:50 BGZF_BLOCK_SIZE 0xff00):
  18-byte gzip header with BC extra field (BSIZE)
  5-byte stored-DEFLATE header (BFINAL=1, BTYPE=00, LEN, NLEN)
  the raw 65280-byte payload
  CRC32 (device) + ISIZE
"""
from __future__ import annotations

import functools
import struct
from typing import List, Tuple

import numpy as np

CHUNK = 0xff00          # uncompressed bytes per BGZF block (65280)

_CRC_POLY = 0xEDB88320


@functools.lru_cache(maxsize=None)
def _crc_table() -> np.ndarray:
    t = np.zeros(256, np.uint32)
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ (_CRC_POLY if c & 1 else 0)
        t[i] = c
    return t


@functools.lru_cache(maxsize=None)
def _crc_bit_contrib(n: int = CHUNK) -> Tuple[np.ndarray, int]:
    """(D [n, 8] uint32, crc0) such that
    crc32(m) == crc0 ^ XOR over set bits (i, b) of D[i, b].

    The CRC table is GF(2)-linear (T[a^b] == T[a]^T[b]), so a byte's
    effect decomposes per bit: injecting bit b at position i contributes
    T[1<<b] evolved through the remaining n-1-i zero-byte LFSR steps
    (r' = r>>8 ^ T[r & 0xFF])."""
    T = _crc_table()
    D = np.zeros((n, 8), np.uint32)
    cur = T[1 << np.arange(8)].copy()          # effect at the last byte
    for i in range(n - 1, -1, -1):
        D[i] = cur
        cur = (cur >> 8) ^ T[cur & 0xFF]
    # crc of n zero bytes with the standard init/final inversion
    r = np.uint32(0xFFFFFFFF)
    import zlib
    crc0 = zlib.crc32(b"\0" * n) & 0xFFFFFFFF
    del r
    return D, crc0


@functools.lru_cache(maxsize=None)
def _crc_kernel(interpret: bool = False):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def crc_blocks(data, D, crc0):
        # data [N, CHUNK] uint8; D [CHUNK, 8] uint32
        bits = (data[:, :, None].astype(jnp.uint32)
                >> jnp.arange(8, dtype=jnp.uint32)) & 1
        contrib = jnp.where(bits != 0, D[None, :, :], jnp.uint32(0))
        crc = jax.lax.reduce(contrib, jnp.uint32(0),
                             jax.lax.bitwise_xor, (1, 2))
        return crc ^ crc0

    return crc_blocks


def _bgzf_stored_frame(payload: bytes, crc: int) -> bytes:
    """One complete BGZF block around a raw payload (bgzf.c header
    layout + stored DEFLATE)."""
    n = len(payload)
    assert n <= CHUNK
    bsize = 18 + 5 + n + 8          # total block size
    hdr = struct.pack(
        "<BBBBIBBHBBHH",
        0x1f, 0x8b, 8, 4,            # gzip magic, DEFLATE, FEXTRA
        0, 0, 0xff,                  # mtime, xfl, os
        6,                           # xlen
        66, 67, 2,                   # 'B' 'C' slen
        bsize - 1)
    deflate = struct.pack("<BHH", 0x01, n, (~n) & 0xFFFF)
    foot = struct.pack("<II", crc & 0xFFFFFFFF, n)
    return hdr + deflate + payload + foot


def bgzf_stored_device(data: bytes, interpret: bool = False,
                       timing: dict = None) -> bytes:
    """Whole-buffer BGZF compress (level-0 stored blocks), CRC32 on
    device, byte-valid output inflatable by the reference (and any gzip
    reader).  Appends the standard BGZF EOF block."""
    import time

    import jax.numpy as jnp

    n = len(data)
    n_full = n // CHUNK
    out = []
    if n_full:
        D, crc0 = _crc_bit_contrib(CHUNK)
        blocks = np.frombuffer(data, np.uint8,
                               n_full * CHUNK).reshape(n_full, CHUNK)
        kern = _crc_kernel(interpret)
        t0 = time.time()
        crcs = np.asarray(kern(jnp.asarray(blocks), jnp.asarray(D),
                               jnp.uint32(crc0)))
        dt = time.time() - t0
        if timing is not None:
            timing["crc_blocks"] = n_full
            timing["crc_s"] = dt
        for i in range(n_full):
            out.append(_bgzf_stored_frame(
                blocks[i].tobytes(), int(crcs[i])))
    tail = data[n_full * CHUNK:]
    if tail:
        import zlib
        out.append(_bgzf_stored_frame(tail, zlib.crc32(tail)))
    # BGZF EOF marker block (bgzf.c:70)
    out.append(bytes.fromhex(
        "1f8b08040000000000ff0600424302001b0003000000000000000000"))
    return b"".join(out)


def crc_device_rate(n_blocks: int = 64, reps: int = 3,
                    interpret: bool = False) -> dict:
    """Steady-state device CRC32 rate with resident inputs (the compute
    half of the stored-block write path)."""
    import time

    import jax.numpy as jnp

    rng = np.random.RandomState(5)
    blocks = rng.randint(0, 256, (n_blocks, CHUNK), dtype=np.uint8)
    D, crc0 = _crc_bit_contrib(CHUNK)
    kern = _crc_kernel(interpret)
    bj, Dj = jnp.asarray(blocks), jnp.asarray(D)
    crcs = np.asarray(kern(bj, Dj, jnp.uint32(crc0)))   # warm + sync
    import zlib
    want = np.array([zlib.crc32(blocks[i].tobytes()) & 0xFFFFFFFF
                     for i in range(min(4, n_blocks))], np.uint32)
    exact = bool((crcs[:len(want)] == want).all())
    t0 = time.time()
    for _ in range(reps):
        crcs = np.asarray(kern(bj, Dj, jnp.uint32(crc0)))
    dt = (time.time() - t0) / reps
    total = n_blocks * CHUNK
    return {"exact": exact, "blocks_per_s": round(n_blocks / dt, 1),
            "MBps": round(total / dt / 1e6, 1), "seconds": round(dt, 4)}
