"""Adaptive arithmetic (range) coder (reference call sites
cram/cram_io.c:1718,1879 arith_compress_to/arith_uncompress_to; the
implementation lives in the htscodecs submodule — EMPTY in this
snapshot — as arith_dynamic.c + c_range_coder.h + c_simple_model.h).

Carry-propagating 32-bit range coder with adaptive frequency models:
order-0 and order-1 (256 contexts), plus the shared CAT/PACK/RLE/
STRIPE/NOSZ transforms reused from the rANS Nx16 layer (htscodecs uses
the same flag-byte vocabulary across both).

INTEROP NOTE: as with rans4x16, wire-format cross-validation against
htscodecs is impossible in this snapshot; the guarantee here is
decode(encode(x)) == x for every flag combination.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

from htslib_tpu.codecs.rans4x16 import (O_CAT, O_NOSZ, O_ORDER1, O_PACK,
                                        O_RLE, O_STRIPE, _pack, _rle_decode,
                                        _rle_encode, _unpack, u7_get, u7_put)

TOP = 1 << 24
MAX_TOT = 1 << 16
STEP = 16


class RangeEncoder:
    def __init__(self):
        self.low = 0
        self.range = 0xFFFFFFFF
        self.out = bytearray()

    def _carry(self):
        i = len(self.out) - 1
        while i >= 0 and self.out[i] == 0xFF:
            self.out[i] = 0
            i -= 1
        if i >= 0:
            self.out[i] += 1

    def encode(self, cum: int, freq: int, tot: int) -> None:
        r = self.range // tot
        self.low += cum * r
        self.range = r * freq
        if self.low >> 32:
            self._carry()
            self.low &= 0xFFFFFFFF
        while self.range < TOP:
            self.out.append((self.low >> 24) & 0xFF)
            self.low = (self.low << 8) & 0xFFFFFFFF
            self.range <<= 8

    def finish(self) -> bytes:
        for _ in range(4):
            self.out.append((self.low >> 24) & 0xFF)
            self.low = (self.low << 8) & 0xFFFFFFFF
        return bytes(self.out)


class RangeDecoder:
    def __init__(self, buf, p: int = 0):
        self.buf = buf
        self.p = p
        self.range = 0xFFFFFFFF
        self.code = 0
        for _ in range(4):
            self.code = (self.code << 8) | self._byte()

    def _byte(self) -> int:
        b = self.buf[self.p] if self.p < len(self.buf) else 0
        self.p += 1
        return b

    def get_freq(self, tot: int) -> int:
        self.r = self.range // tot
        return min(self.code // self.r, tot - 1)

    def update(self, cum: int, freq: int) -> None:
        self.code -= cum * self.r
        self.range = self.r * freq
        while self.range < TOP:
            self.code = ((self.code << 8) | self._byte()) & 0xFFFFFFFF
            self.range <<= 8


class SimpleModel:
    """Adaptive frequency model (c_simple_model.h): linear counts with
    periodic halving."""

    __slots__ = ("freq", "tot")

    def __init__(self, nsym: int = 256):
        self.freq = np.ones(nsym, np.int64)
        self.tot = nsym

    def encode(self, rc: RangeEncoder, s: int) -> None:
        cum = int(self.freq[:s].sum())
        rc.encode(cum, int(self.freq[s]), self.tot)
        self._update(s)

    def decode(self, rc: RangeDecoder) -> int:
        f = rc.get_freq(self.tot)
        cumsum = np.cumsum(self.freq)
        s = int(np.searchsorted(cumsum, f, side="right"))
        cum = int(cumsum[s - 1]) if s else 0
        rc.update(cum, int(self.freq[s]))
        self._update(s)
        return s

    def _update(self, s: int) -> None:
        self.freq[s] += STEP
        self.tot += STEP
        if self.tot > MAX_TOT - STEP:
            self.freq -= self.freq >> 1
            self.tot = int(self.freq.sum())


def _enc_core(data: bytes, order1: bool) -> bytes:
    rc = RangeEncoder()
    if order1:
        models = [SimpleModel() for _ in range(256)]
        ctx = 0
        for b in data:
            models[ctx].encode(rc, b)
            ctx = b
    else:
        m = SimpleModel()
        for b in data:
            m.encode(rc, b)
    return rc.finish()


def _dec_core(buf, p: int, n_out: int, order1: bool) -> bytes:
    rc = RangeDecoder(buf, p)
    out = bytearray()
    if order1:
        models = [SimpleModel() for _ in range(256)]
        ctx = 0
        for _ in range(n_out):
            s = models[ctx].decode(rc)
            out.append(s)
            ctx = s
    else:
        m = SimpleModel()
        for _ in range(n_out):
            out.append(m.decode(rc))
    return bytes(out)


def compress(data: bytes, flags: int = 0) -> bytes:
    if flags & O_PACK and len(set(data)) > 16:
        flags &= ~O_PACK
    if flags & O_RLE and not data:
        flags &= ~O_RLE
    out = bytearray()
    out.append(flags)
    if not flags & O_NOSZ:
        u7_put(out, len(data))
    if flags & O_CAT:
        out += data
        return bytes(out)
    if flags & O_STRIPE:
        N = 4
        out.append(N)
        subs = [compress(data[j::N], (flags & O_ORDER1) | O_NOSZ)
                for j in range(N)]
        for s in subs:
            u7_put(out, len(s))
        for s in subs:
            out += s
        return bytes(out)
    payload = data
    if flags & O_PACK:
        meta, payload = _pack(payload)
        out += meta
        u7_put(out, len(payload))
    if flags & O_RLE:
        meta, payload = _rle_encode(payload)
        u7_put(out, len(meta))
        out += meta
        u7_put(out, len(payload))
    if payload:
        out += _enc_core(payload, bool(flags & O_ORDER1))
    return bytes(out)


def uncompress(buf: bytes, expected_len: int = -1) -> bytes:
    data, _ = _uncompress_at(memoryview(buf), 0, expected_len)
    return data


def _uncompress_at(buf, p: int, expected_len: int = -1) -> Tuple[bytes, int]:
    flags = buf[p]
    p += 1
    if flags & O_NOSZ:
        ulen = expected_len
        if ulen < 0:
            raise ValueError("NOSZ stream needs an expected length")
    else:
        ulen, p = u7_get(buf, p)
    if flags & O_CAT:
        return bytes(buf[p:p + ulen]), p + ulen
    if flags & O_STRIPE:
        N = buf[p]
        p += 1
        lens = []
        for _ in range(N):
            v, p = u7_get(buf, p)
            lens.append(v)
        parts = []
        for j in range(N):
            want = (ulen - j + N - 1) // N
            part, _ = _uncompress_at(buf[p:p + lens[j]], 0, want)
            parts.append(np.frombuffer(part, np.uint8))
            p += lens[j]
        out = np.empty(ulen, np.uint8)
        for j in range(N):
            out[j::N] = parts[j]
        return out.tobytes(), p
    pack_meta_at = -1
    plen = 0
    if flags & O_PACK:
        pack_meta_at = p
        P = buf[p]
        p += 1 + P
        plen, p = u7_get(buf, p)
        n_core = plen
    rle_meta = None
    if flags & O_RLE:
        mlen, p = u7_get(buf, p)
        rle_meta = bytes(buf[p:p + mlen])
        p += mlen
        llen, p = u7_get(buf, p)
        n_core = llen
    if not (flags & (O_PACK | O_RLE)):
        n_core = ulen
    payload = _dec_core(buf, p, n_core, bool(flags & O_ORDER1)) \
        if n_core else b""
    if flags & O_RLE:
        payload = _rle_decode(memoryview(rle_meta), 0, payload,
                              plen if flags & O_PACK else ulen)
    if flags & O_PACK:
        payload, _ = _unpack(buf, pack_meta_at, payload, ulen)
    return payload, p + len(buf)  # p not tracked past the coder tail
