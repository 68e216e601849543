"""CRAM record-level codecs (reference cram/cram_codecs.c).

Each codec reads either from the CORE block's MSB-first bit stream or from
an EXTERNAL byte stream identified by content id.  The decode state for a
slice is a CramSliceStreams object holding one cursor per block.
"""
from __future__ import annotations

import struct
from typing import Dict, List, Optional, Tuple

from htslib_tpu.cram.itf8 import itf8_decode
from htslib_tpu.cram.structs import (
    E_BETA, E_BYTE_ARRAY_LEN, E_BYTE_ARRAY_STOP, E_CONST_BYTE, E_CONST_INT,
    E_EXTERNAL, E_GAMMA, E_GOLOMB, E_GOLOMB_RICE, E_HUFFMAN, E_NULL,
    E_SUBEXP, E_VARINT_SIGNED, E_VARINT_UNSIGNED, E_XDELTA, E_XPACK, E_XRLE,
)


class BitReader:
    """MSB-first bit reader over the CORE block
    (cram_codecs.c:73-259 get_bit_MSB/get_bits_MSB)."""

    __slots__ = ("data", "byte", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.byte = 0
        self.bit = 7

    def get_bit(self) -> int:
        b = (self.data[self.byte] >> self.bit) & 1
        if self.bit == 0:
            self.bit = 7
            self.byte += 1
        else:
            self.bit -= 1
        return b

    def get_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get_bit()
        return v


class ExternalStream:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read_itf8(self) -> int:
        v, self.pos = itf8_decode(self.data, self.pos)
        return v

    def read_byte(self) -> int:
        b = self.data[self.pos]
        self.pos += 1
        return b

    def read(self, n: int) -> bytes:
        out = self.data[self.pos:self.pos + n]
        if len(out) < n:
            raise IOError("CRAM external block overrun")
        self.pos += n
        return out

    def read_to(self, stop: int) -> bytes:
        e = self.data.find(bytes([stop]), self.pos)
        if e < 0:
            # htslib tolerates a missing stop byte at end of block
            out = self.data[self.pos:]
            self.pos = len(self.data)
            return out
        out = self.data[self.pos:e]
        self.pos = e + 1
        return out


class SliceStreams:
    """Per-slice decode cursors: the core bit stream plus external byte
    streams keyed by content id."""

    def __init__(self, core: bytes, external: Dict[int, bytes]):
        self.core = BitReader(core)
        self.ext: Dict[int, ExternalStream] = {
            cid: ExternalStream(d) for cid, d in external.items()}

    def external(self, cid: int) -> ExternalStream:
        s = self.ext.get(cid)
        if s is None:
            raise IOError(f"CRAM: no external block with content id {cid}")
        return s


# ---------------------------------------------------------------------------
# codecs
# ---------------------------------------------------------------------------

class Codec:
    codec_id = E_NULL

    def read_int(self, st: SliceStreams) -> int:
        raise IOError(f"codec {type(self).__name__} cannot decode ints")

    def read_byte(self, st: SliceStreams) -> int:
        return self.read_int(st)

    def read_bytes(self, st: SliceStreams, n: int) -> bytes:
        """Read exactly n bytes (for seq fragments of known length)."""
        return bytes(self.read_byte(st) for _ in range(n))

    def read_array(self, st: SliceStreams) -> bytes:
        """Read a length-prefixed/terminated byte array (names, tags)."""
        raise IOError(f"codec {type(self).__name__} cannot decode arrays")


class NullCodec(Codec):
    codec_id = E_NULL

    def read_int(self, st):
        raise IOError("NULL codec used")


class ExternalCodec(Codec):
    codec_id = E_EXTERNAL

    def __init__(self, content_id: int):
        self.content_id = content_id

    def read_int(self, st: SliceStreams) -> int:
        return st.external(self.content_id).read_itf8()

    def read_byte(self, st: SliceStreams) -> int:
        return st.external(self.content_id).read_byte()

    def read_bytes(self, st: SliceStreams, n: int) -> bytes:
        return st.external(self.content_id).read(n)


class HuffmanCodec(Codec):
    """Canonical Huffman (cram_codecs.c:2814).  The ubiquitous 0-bit
    single-symbol case decodes to a constant without touching streams."""
    codec_id = E_HUFFMAN

    def __init__(self, symbols: List[int], lengths: List[int]):
        codes = sorted(zip(lengths, symbols))
        self.codes: List[Tuple[int, int, int]] = []  # (len, code, symbol)
        val, last_len = -1, 0
        for ln, sym in codes:
            val += 1
            if ln > last_len:
                val <<= (ln - last_len)
                last_len = ln
            self.codes.append((ln, val, sym))
        self.constant = codes[0][1] if len(codes) == 1 and codes[0][0] == 0 else None
        # decode table: for each length, (first_code, first_index)
        self._by_len: Dict[int, Tuple[int, int]] = {}
        for i, (ln, code, sym) in enumerate(self.codes):
            if ln not in self._by_len:
                self._by_len[ln] = (code, i)

    def read_int(self, st: SliceStreams) -> int:
        if self.constant is not None:
            return self.constant
        length = 0
        val = 0
        while True:
            val = (val << 1) | st.core.get_bit()
            length += 1
            info = self._by_len.get(length)
            if info is not None:
                first_code, first_idx = info
                idx = first_idx + (val - first_code)
                if (idx < len(self.codes) and val >= first_code
                        and self.codes[idx][0] == length):
                    return self.codes[idx][2]
            if length > 31:
                raise IOError("corrupt huffman stream")


class BetaCodec(Codec):
    codec_id = E_BETA

    def __init__(self, offset: int, nbits: int):
        self.offset = offset
        self.nbits = nbits

    def read_int(self, st: SliceStreams) -> int:
        return st.core.get_bits(self.nbits) - self.offset


class GammaCodec(Codec):
    codec_id = E_GAMMA

    def __init__(self, offset: int):
        self.offset = offset

    def read_int(self, st: SliceStreams) -> int:
        nz = 0
        while st.core.get_bit() == 0:
            nz += 1
        val = 1
        for _ in range(nz):
            val = (val << 1) | st.core.get_bit()
        return val - 1 - self.offset


class SubexpCodec(Codec):
    codec_id = E_SUBEXP

    def __init__(self, offset: int, k: int):
        self.offset = offset
        self.k = k

    def read_int(self, st: SliceStreams) -> int:
        i = 0
        while st.core.get_bit() == 1:
            i += 1
        if i == 0:
            n = st.core.get_bits(self.k)
        else:
            b = i + self.k - 1
            n = (1 << b) | st.core.get_bits(b)
        return n - self.offset


class ByteArrayLenCodec(Codec):
    codec_id = E_BYTE_ARRAY_LEN

    def __init__(self, len_codec: Codec, val_codec: Codec):
        self.len_codec = len_codec
        self.val_codec = val_codec

    def read_array(self, st: SliceStreams) -> bytes:
        n = self.len_codec.read_int(st)
        return self.val_codec.read_bytes(st, n)

    def read_bytes(self, st: SliceStreams, n: int) -> bytes:
        # fixed-length reads still honour the stored length
        return self.read_array(st)


class ByteArrayStopCodec(Codec):
    codec_id = E_BYTE_ARRAY_STOP

    def __init__(self, stop: int, content_id: int):
        self.stop = stop
        self.content_id = content_id

    def read_array(self, st: SliceStreams) -> bytes:
        return st.external(self.content_id).read_to(self.stop)

    def read_bytes(self, st: SliceStreams, n: int) -> bytes:
        return self.read_array(st)


class ConstByteCodec(Codec):
    codec_id = E_CONST_BYTE

    def __init__(self, value: int):
        self.value = value

    def read_int(self, st):
        return self.value


def parse_encoding(buf, p: int) -> Tuple[Optional[Codec], int]:
    """Parse one encoding{id, length, params} (spec section 3;
    cram_decode.c:144 walks these in the compression header)."""
    codec_id, p = itf8_decode(buf, p)
    nbytes, p = itf8_decode(buf, p)
    end = p + nbytes
    if codec_id == E_NULL:
        return NullCodec(), end
    if codec_id == E_EXTERNAL:
        cid, p = itf8_decode(buf, p)
        return ExternalCodec(cid), end
    if codec_id == E_HUFFMAN:
        nsym, p = itf8_decode(buf, p)
        syms = []
        for _ in range(nsym):
            v, p = itf8_decode(buf, p)
            syms.append(v)
        nlen, p = itf8_decode(buf, p)
        lens = []
        for _ in range(nlen):
            v, p = itf8_decode(buf, p)
            lens.append(v)
        return HuffmanCodec(syms, lens), end
    if codec_id == E_BYTE_ARRAY_LEN:
        len_codec, p = parse_encoding(buf, p)
        val_codec, p = parse_encoding(buf, p)
        return ByteArrayLenCodec(len_codec, val_codec), end
    if codec_id == E_BYTE_ARRAY_STOP:
        stop = buf[p]
        p += 1
        cid, p = itf8_decode(buf, p)
        return ByteArrayStopCodec(stop, cid), end
    if codec_id == E_BETA:
        offset, p = itf8_decode(buf, p)
        nbits, p = itf8_decode(buf, p)
        return BetaCodec(offset, nbits), end
    if codec_id == E_SUBEXP:
        offset, p = itf8_decode(buf, p)
        k, p = itf8_decode(buf, p)
        return SubexpCodec(offset, k), end
    if codec_id == E_GAMMA:
        offset, p = itf8_decode(buf, p)
        return GammaCodec(offset), end
    if codec_id == E_CONST_BYTE:
        v, p = itf8_decode(buf, p)
        return ConstByteCodec(v), end
    if codec_id == E_CONST_INT:
        v, p = itf8_decode(buf, p)
        return ConstByteCodec(v), end
    raise IOError(f"unsupported CRAM encoding id {codec_id}")
