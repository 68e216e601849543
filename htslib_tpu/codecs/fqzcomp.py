"""FQZComp-style quality-string codec (reference call sites
cram/cram_io.c:1686,1821 fqz_compress/fqz_decompress; implementation in
the htscodecs submodule — EMPTY in this snapshot — fqzcomp_qual.c).

Context-mixing quality model: each quality byte is coded by the
adaptive range coder under a context of (previous quality, quality
delta trend, position bucket), which is the core of FQZComp's model.
Self-consistent (decode(encode(x)) == x); wire format cannot be
cross-validated without htscodecs.
"""
from __future__ import annotations

from htslib_tpu.codecs.arith import RangeDecoder, RangeEncoder, SimpleModel
from htslib_tpu.codecs.rans4x16 import u7_get, u7_put

_NCTX = 1 << 12


def _ctx(q1: int, q2: int, pos: int) -> int:
    # (prev qual 6b) | (delta sign/magnitude 2b) | (position bucket 4b)
    d = q1 - q2
    db = 0 if d == 0 else (1 if d > 0 else 2) + (1 if abs(d) > 4 else 0)
    return ((min(q1, 63) << 6) | (db << 4) | min(pos >> 5, 15)) % _NCTX


def compress(data: bytes) -> bytes:
    out = bytearray()
    u7_put(out, len(data))
    rc = RangeEncoder()
    models = {}
    q1 = q2 = 0
    pos = 0
    for b in data:
        c = _ctx(q1, q2, pos)
        m = models.get(c)
        if m is None:
            m = models[c] = SimpleModel()
        m.encode(rc, b)
        if b == 0:          # record separator resets the context chain
            q1 = q2 = 0
            pos = 0
        else:
            q2, q1 = q1, b
            pos += 1
    out += rc.finish()
    return bytes(out)


def decompress(buf: bytes) -> bytes:
    n, p = u7_get(buf, 0)
    rc = RangeDecoder(memoryview(buf), p)
    models = {}
    out = bytearray()
    q1 = q2 = 0
    pos = 0
    for _ in range(n):
        c = _ctx(q1, q2, pos)
        m = models.get(c)
        if m is None:
            m = models[c] = SimpleModel()
        b = m.decode(rc)
        out.append(b)
        if b == 0:
            q1 = q2 = 0
            pos = 0
        else:
            q2, q1 = q1, b
            pos += 1
    return bytes(out)
