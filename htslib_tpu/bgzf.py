"""BGZF — blocked gzip with random access (reference bgzf.c, htslib/bgzf.h).

BGZF is gzip where each member is an independent deflate block of at most
65536 uncompressed bytes, carrying its compressed size in a 'BC' extra
subfield so a reader can hop block-to-block without inflating
(htslib/bgzf.h:50 BGZF_BLOCK_SIZE 0xff00; header layout bgzf.c:70-90).
Virtual file offsets pack (compressed_block_offset << 16) | within_block
offset (bgzf.c:2175).  A ``.gzi`` index maps compressed<->uncompressed
offsets for arbitrary-offset entry (bgzidx_t, bgzf.c:162-174).

TPU-first design
----------------
The reference parallelises with a thread pool over blocks (bgzf.c:1598).
Here the native unit is a *block batch*: ``scan_blocks`` walks the BSIZE
hops once (host, sequential but trivially cheap) and returns offset/size
arrays; ``inflate_blocks``/``deflate_blocks`` then process the whole batch
through the C++ native library (htslib_tpu.native, libdeflate-backed,
multithreaded) or a zlib fallback.  Order is implicit in the batch index —
no serial-number reordering machinery is needed.  Device-side DEFLATE
kernels plug in behind the same batch interface (htslib_tpu.ops.inflate).

The streaming BGZFReader/BGZFWriter classes below provide the
record-iterator compatible view used by the SAM/VCF layers and keep exact
virtual-offset semantics for interop.
"""
from __future__ import annotations

import io
import os
import struct
import zlib
from dataclasses import dataclass
from typing import List, Optional, Tuple, Union

import numpy as np

from htslib_tpu.hfile import HFile, hopen
from htslib_tpu.util.log import log_error

BGZF_BLOCK_SIZE = 0xFF00        # htslib/bgzf.h:50
BGZF_MAX_BLOCK_SIZE = 0x10000   # htslib/bgzf.h:51
BLOCK_HEADER_LENGTH = 18
BLOCK_FOOTER_LENGTH = 8

# 28-byte empty-block EOF marker (bgzf.c:1542 checks for this)
BGZF_EOF = bytes([
    0x1F, 0x8B, 0x08, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00, 0xFF, 0x06, 0x00,
    0x42, 0x43, 0x02, 0x00, 0x1B, 0x00, 0x03, 0x00, 0x00, 0x00, 0x00, 0x00,
    0x00, 0x00, 0x00, 0x00,
])

_HEADER_STRUCT = struct.Struct("<BBBBIBBHBBHH")  # magic..bsize


def _block_header(clen: int) -> bytes:
    """18-byte BGZF member header with BC subfield (bgzf.c:70-90)."""
    return _HEADER_STRUCT.pack(
        0x1F, 0x8B, 0x08, 0x04, 0, 0, 0xFF, 6, 0x42, 0x43, 2,
        clen + BLOCK_HEADER_LENGTH + BLOCK_FOOTER_LENGTH - 1)


def compress_block(data: bytes, level: int = -1) -> bytes:
    """Compress one <=64KiB chunk into a full BGZF member
    (bgzf_compress, bgzf.c:561-720)."""
    from htslib_tpu.native import native
    if native is not None:
        out = native.deflate_blocks([data], level)
        return out[0]
    return _compress_block_py(data, level)


def _compress_block_py(data: bytes, level: int = -1) -> bytes:
    if level == -1:
        level = 6
    if level == 0:
        # stored deflate blocks (bgzf_encode_level0_func, bgzf.c:1345)
        c = zlib.compressobj(0, zlib.DEFLATED, -15)
    else:
        c = zlib.compressobj(level, zlib.DEFLATED, -15)
    comp = c.compress(data) + c.flush()
    if len(comp) + BLOCK_HEADER_LENGTH + BLOCK_FOOTER_LENGTH > BGZF_MAX_BLOCK_SIZE:
        raise ValueError("BGZF block does not fit after compression")
    crc = zlib.crc32(data) & 0xFFFFFFFF
    return (_block_header(len(comp)) + comp
            + struct.pack("<II", crc, len(data) & 0xFFFFFFFF))


def parse_block_header(hdr: bytes) -> int:
    """Return total compressed size (BSIZE+1) of the member starting at hdr,
    or raise ValueError. (bgzf_check_header + BC walk, bgzf.c:949-1002)."""
    if len(hdr) < BLOCK_HEADER_LENGTH:
        raise ValueError("truncated BGZF header")
    if hdr[0] != 0x1F or hdr[1] != 0x8B or not (hdr[3] & 4):
        raise ValueError("invalid BGZF magic")
    xlen = hdr[10] | (hdr[11] << 8)
    pos, end = 12, 12 + xlen
    while pos + 4 <= min(end, len(hdr)):
        si1, si2 = hdr[pos], hdr[pos + 1]
        slen = hdr[pos + 2] | (hdr[pos + 3] << 8)
        if si1 == 0x42 and si2 == 0x43 and slen == 2:
            if pos + 6 > len(hdr):
                raise ValueError("truncated BC subfield")
            bsize = hdr[pos + 4] | (hdr[pos + 5] << 8)
            return bsize + 1
        pos += 4 + slen
    raise ValueError("no BC subfield: not BGZF")


def decompress_block(comp: bytes) -> bytes:
    """Inflate one full BGZF member, verifying CRC32 (bgzf_uncompress,
    bgzf.c:730-806)."""
    total = parse_block_header(comp)
    xlen = comp[10] | (comp[11] << 8)
    payload = comp[12 + xlen: total - BLOCK_FOOTER_LENGTH]
    crc_want, isize = struct.unpack_from("<II", comp, total - BLOCK_FOOTER_LENGTH)
    data = zlib.decompress(payload, -15, BGZF_MAX_BLOCK_SIZE)
    if len(data) != isize:
        raise IOError("BGZF ISIZE mismatch")
    if (zlib.crc32(data) & 0xFFFFFFFF) != crc_want:
        raise IOError("BGZF CRC32 mismatch")
    return data


# ---------------------------------------------------------------------------
# Batch interface: the TPU-native unit of work
# ---------------------------------------------------------------------------

@dataclass
class BlockTable:
    """Result of scanning a BGZF byte range: per-block offsets/sizes.

    Equivalent information to what the reference's MT reader discovers
    incrementally (bgzf_mt_reader, bgzf.c:1598), materialised up front so
    block batches can be fanned out data-parallel.
    """
    coffsets: np.ndarray   # uint64 [n]  compressed offset of each member
    csizes: np.ndarray     # uint32 [n]  total member size
    usizes: np.ndarray     # uint32 [n]  ISIZE (uncompressed length)

    @property
    def n(self) -> int:
        return len(self.coffsets)

    @property
    def uoffsets(self) -> np.ndarray:
        """Cumulative uncompressed start offset of each block."""
        out = np.zeros(self.n, dtype=np.uint64)
        np.cumsum(self.usizes[:-1], dtype=np.uint64, out=out[1:])
        return out

    @property
    def total_usize(self) -> int:
        return int(self.usizes.sum(dtype=np.uint64))


def scan_blocks(data: Union[bytes, memoryview, np.ndarray], base_offset: int = 0,
                ) -> BlockTable:
    """Walk BSIZE hops over an in-memory BGZF byte range.

    Sequential but ~1 memory touch per 64KiB; uses the native library when
    available, else a small Python loop.
    """
    from htslib_tpu.native import native
    buf = np.frombuffer(data, dtype=np.uint8) if not isinstance(data, np.ndarray) else data
    if native is not None:
        co, cs, us = native.bgzf_scan(buf)
        return BlockTable(co + np.uint64(base_offset), cs, us)
    coffs: List[int] = []
    csz: List[int] = []
    usz: List[int] = []
    pos, n = 0, len(buf)
    mv = memoryview(buf)
    while pos + BLOCK_HEADER_LENGTH <= n:
        total = parse_block_header(bytes(mv[pos:pos + BLOCK_HEADER_LENGTH]))
        if pos + total > n:
            raise IOError("truncated BGZF block")
        isize = int.from_bytes(mv[pos + total - 4: pos + total], "little")
        coffs.append(base_offset + pos)
        csz.append(total)
        usz.append(isize)
        pos += total
    if pos != n:
        raise IOError("trailing garbage after BGZF blocks")
    return BlockTable(np.array(coffs, np.uint64), np.array(csz, np.uint32),
                      np.array(usz, np.uint32))


def inflate_blocks(data: Union[bytes, memoryview, np.ndarray],
                   table: Optional[BlockTable] = None,
                   base_offset: int = 0,
                   verify_crc: bool = True) -> Tuple[np.ndarray, BlockTable]:
    """Inflate a whole BGZF byte range to one contiguous uint8 array.

    The batch analogue of looping bgzf_read_block (bgzf.c:1004): every
    block is independent, so the native backend inflates them in parallel.
    Returns (uncompressed bytes, block table).
    """
    buf = np.frombuffer(data, dtype=np.uint8) if not isinstance(data, np.ndarray) else data
    if table is None:
        table = scan_blocks(buf, base_offset)
    from htslib_tpu.native import native
    if native is not None:
        out = native.inflate_batch(buf, table.coffsets - np.uint64(base_offset),
                                   table.csizes, table.usizes, verify_crc)
        return out, table
    out = np.empty(table.total_usize, dtype=np.uint8)
    upos = 0
    for i in range(table.n):
        s = int(table.coffsets[i]) - base_offset
        blk = decompress_block(bytes(buf[s:s + int(table.csizes[i])]))
        out[upos:upos + len(blk)] = np.frombuffer(blk, np.uint8)
        upos += len(blk)
    return out, table


def deflate_blocks(chunks: List[bytes], level: int = -1) -> List[bytes]:
    """Compress N independent chunks into N BGZF members (batch analogue of
    the MT write queue, bgzf.c:1852)."""
    from htslib_tpu.native import native
    if native is not None:
        return native.deflate_blocks(chunks, level)
    return [_compress_block_py(c, level) for c in chunks]


# ---------------------------------------------------------------------------
# .gzi index (bgzidx_t, bgzf.c:162-270)
# ---------------------------------------------------------------------------

class GziIndex:
    """Maps uncompressed offsets to compressed block offsets.

    On-disk: u64 count, then count x (u64 compressed_offset,
    u64 uncompressed_offset) — the first block's (0,0) entry is implicit
    (bgzf_index_dump, bgzf.c:2394-2440).
    """

    def __init__(self, coffsets: Optional[np.ndarray] = None,
                 uoffsets: Optional[np.ndarray] = None):
        self.coffsets = coffsets if coffsets is not None else np.zeros(1, np.uint64)
        self.uoffsets = uoffsets if uoffsets is not None else np.zeros(1, np.uint64)

    @classmethod
    def from_table(cls, table: BlockTable) -> "GziIndex":
        keep = table.usizes > 0
        co = table.coffsets
        uo = table.uoffsets
        # entry per block start (including implicit first)
        return cls(co.astype(np.uint64), uo.astype(np.uint64))

    @classmethod
    def load(cls, fname: str) -> "GziIndex":
        with hopen(fname, "rb") as fp:
            raw = fp.read(-1)
        (n,) = struct.unpack_from("<Q", raw, 0)
        if len(raw) < 8 + 16 * n:
            raise IOError(f"truncated .gzi index {fname}")
        arr = np.frombuffer(raw, dtype="<u8", offset=8, count=2 * n).reshape(n, 2)
        co = np.concatenate([[0], arr[:, 0]]).astype(np.uint64)
        uo = np.concatenate([[0], arr[:, 1]]).astype(np.uint64)
        return cls(co, uo)

    def save(self, fname: str) -> None:
        co, uo = self.coffsets, self.uoffsets
        if len(co) and co[0] == 0 and uo[0] == 0:
            co, uo = co[1:], uo[1:]
        with open(fname, "wb") as f:
            f.write(struct.pack("<Q", len(co)))
            arr = np.empty((len(co), 2), dtype="<u8")
            arr[:, 0] = co
            arr[:, 1] = uo
            f.write(arr.tobytes())

    def query(self, uoffset: int) -> Tuple[int, int]:
        """Return (compressed_offset, block_uncompressed_start) for the
        block containing uncompressed offset (bgzf_useek, bgzf.c:2288)."""
        i = int(np.searchsorted(self.uoffsets, uoffset, side="right")) - 1
        i = max(i, 0)
        return int(self.coffsets[i]), int(self.uoffsets[i])


# ---------------------------------------------------------------------------
# Streaming reader/writer (record-iterator compatibility layer)
# ---------------------------------------------------------------------------

def make_virtual_offset(coffset: int, uoffset: int) -> int:
    return (coffset << 16) | uoffset


def split_virtual_offset(voffset: int) -> Tuple[int, int]:
    return voffset >> 16, voffset & 0xFFFF


class BGZFReader:
    """Streaming BGZF (or plain gzip, or uncompressed) reader with
    virtual-offset seek/tell (bgzf_seek/bgzf_tell, bgzf.c:2175-2258).
    """

    def __init__(self, src: Union[str, HFile], cache_blocks: int = 8):
        if isinstance(src, str):
            self._fp = hopen(src, "rb")
            self.name = src
        else:
            self._fp = src
            self.name = getattr(src, "name", "?")
        head = self._fp.peek(BLOCK_HEADER_LENGTH)
        self.is_gzip = len(head) >= 2 and head[0] == 0x1F and head[1] == 0x8B
        self.is_bgzf = False
        if self.is_gzip:
            try:
                parse_block_header(head)
                self.is_bgzf = True
            except ValueError:
                self.is_bgzf = False
        self.is_compressed = self.is_gzip
        self._block: bytes = b""
        self._block_offset = 0          # within-block read position
        self._block_address = 0         # compressed offset of current block
        self._next_address = 0          # compressed offset after current block
        self._gz = None                 # plain-gzip streaming decompressor
        self._uncompressed_pos = 0
        self.idx: Optional[GziIndex] = None
        self._idx_build = False
        self._cache: dict = {}
        self._cache_order: List[int] = []
        self._cache_blocks = cache_blocks

    # -- core block machinery -------------------------------------------
    def _read_block_at(self, caddr: int) -> bool:
        """Load the block at compressed offset caddr; False at EOF."""
        if self.is_bgzf and caddr in self._cache:
            self._block, self._next_address = self._cache[caddr]
            self._block_address = caddr
            self._block_offset = 0
            # keep the file cursor in sync so a sequential read that
            # exhausts the cached block continues at the right offset
            # (bgzf.c block cache + bgzf_read_block interplay)
            self._fp.seek(self._next_address)
            return True
        self._fp.seek(caddr)
        return self._read_next_block()

    def _read_next_block(self) -> bool:
        caddr = self._fp.tell()
        if self.is_bgzf:
            hdr = self._fp.read(BLOCK_HEADER_LENGTH)
            if len(hdr) == 0:
                self._block = b""
                self._block_offset = 0
                self._block_address = caddr
                return False
            total = parse_block_header(hdr)
            rest = self._fp.read(total - BLOCK_HEADER_LENGTH)
            if len(rest) != total - BLOCK_HEADER_LENGTH:
                raise IOError("truncated BGZF block")
            self._block = decompress_block(hdr + rest)
            self._block_offset = 0
            self._block_address = caddr
            self._next_address = caddr + total
            if self._cache_blocks:
                self._cache[caddr] = (self._block, self._next_address)
                self._cache_order.append(caddr)
                if len(self._cache_order) > self._cache_blocks:
                    del self._cache[self._cache_order.pop(0)]
            return True
        elif self.is_gzip:
            if self._gz is None:
                self._gz = zlib.decompressobj(wbits=31)
            chunks = []
            while True:
                raw = self._gz.unconsumed_tail or self._fp.read(1 << 16)
                if not raw:
                    if self._gz.eof and self._gz.unused_data:
                        # concatenated gzip members
                        tail = self._gz.unused_data
                        self._gz = zlib.decompressobj(wbits=31)
                        raw = tail
                    else:
                        break
                chunk = self._gz.decompress(raw, BGZF_MAX_BLOCK_SIZE)
                if chunk:
                    chunks.append(chunk)
                    break
                if self._gz.eof and not self._gz.unused_data:
                    nxt = self._fp.read(1 << 16)
                    if not nxt:
                        break
                    self._gz = zlib.decompressobj(wbits=31)
                    chunk = self._gz.decompress(nxt, BGZF_MAX_BLOCK_SIZE)
                    if chunk:
                        chunks.append(chunk)
                        break
            self._block = b"".join(chunks)
            self._block_offset = 0
            self._block_address = caddr
            return len(self._block) > 0
        else:
            self._block = self._fp.read(BGZF_MAX_BLOCK_SIZE)
            self._block_offset = 0
            self._block_address = caddr
            return len(self._block) > 0

    # -- public API ------------------------------------------------------
    def read(self, n: int = -1) -> bytes:
        if n < 0:
            chunks = []
            while True:
                c = self.read(1 << 20)
                if not c:
                    break
                chunks.append(c)
            return b"".join(chunks)
        out = bytearray()
        while n > 0:
            avail = len(self._block) - self._block_offset
            if avail == 0:
                if not self._read_next_block():
                    break
                continue
            take = min(avail, n)
            out += self._block[self._block_offset:self._block_offset + take]
            self._block_offset += take
            self._uncompressed_pos += take
            n -= take
        return bytes(out)

    def peek(self, n: int) -> bytes:
        """Return up to n upcoming bytes without consuming them."""
        if len(self._block) - self._block_offset == 0:
            pos_fp = self._fp.tell()
            if not self._read_next_block():
                return b""
            # leave block loaded; reads will consume it
        return self._block[self._block_offset:self._block_offset + n]

    def readline(self, delim: bytes = b"\n") -> bytes:
        out = bytearray()
        while True:
            idx = self._block.find(delim, self._block_offset)
            if idx >= 0:
                out += self._block[self._block_offset:idx + 1]
                self._block_offset = idx + 1
                self._uncompressed_pos += len(out)
                return bytes(out)
            out += self._block[self._block_offset:]
            self._block_offset = len(self._block)
            if not self._read_next_block():
                self._uncompressed_pos += len(out)
                return bytes(out)

    def tell(self) -> int:
        """Virtual offset of the next read (bgzf_tell, htslib/bgzf.h:222)."""
        if not self.is_bgzf:
            return self._uncompressed_pos
        if self._block_offset == len(self._block) and self._block:
            return make_virtual_offset(self._next_address, 0)
        return make_virtual_offset(self._block_address, self._block_offset)

    def seek(self, voffset: int) -> None:
        """Seek to a virtual offset (bgzf_seek, bgzf.c:2175)."""
        if not self.is_bgzf:
            if self.is_gzip:
                raise IOError("cannot seek in plain gzip stream")
            self._fp.seek(voffset)
            self._block = b""
            self._block_offset = 0
            self._uncompressed_pos = voffset
            return
        caddr, uoff = split_virtual_offset(voffset)
        if not self._read_block_at(caddr):
            if uoff != 0:
                raise IOError("seek beyond EOF")
            return
        if uoff > len(self._block):
            raise IOError("invalid virtual offset (uoffset beyond block)")
        self._block_offset = uoff

    def useek(self, uoffset: int) -> None:
        """Seek to an uncompressed offset via the .gzi index
        (bgzf_useek, bgzf.c:2288)."""
        if not self.is_compressed:
            self.seek(uoffset)
            return
        if self.idx is None:
            raise IOError("bgzf_useek needs a loaded .gzi index")
        caddr, ustart = self.idx.query(uoffset)
        if not self._read_block_at(caddr):
            raise IOError("useek beyond EOF")
        skip = uoffset - ustart
        while skip > len(self._block):
            skip -= len(self._block)
            if not self._read_next_block():
                raise IOError("useek beyond EOF")
        self._block_offset = skip
        self._uncompressed_pos = uoffset

    def utell(self) -> int:
        return self._uncompressed_pos

    def load_index(self, fname: Optional[str] = None) -> None:
        fname = fname or self.name + ".gzi"
        self.idx = GziIndex.load(fname)

    def check_eof(self) -> int:
        """1 if the 28-byte EOF block terminates the file, 0 if absent,
        2 if unseekable (bgzf_check_EOF, bgzf.c:2132)."""
        if not self.is_bgzf:
            return 3
        if not self._fp.seekable():
            return 2
        pos = self._fp.tell()
        try:
            size = self._fp.size()
            if size is None or size < 28:
                return 0
            self._fp.seek(size - 28)
            tail = self._fp.read(28)
            return 1 if tail == BGZF_EOF else 0
        finally:
            self._fp.seek(pos)

    def read_all(self) -> np.ndarray:
        """Bulk path: unconsumed tail of the current block + batch-inflate
        of the remaining stream."""
        if self.is_bgzf:
            tail = self._block[self._block_offset:]
            self._block_offset = len(self._block)
            start = self._fp.tell()
            raw = self._fp.read(-1)
            out, table = inflate_blocks(raw, base_offset=start)
            self.idx = GziIndex.from_table(table)
            if tail:
                out = np.concatenate([np.frombuffer(tail, np.uint8), out])
            return out
        return np.frombuffer(self.read(-1), dtype=np.uint8)

    def close(self) -> None:
        self._fp.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class BGZFWriter:
    """Buffered BGZF writer (bgzf_write, bgzf.c:1760+): accumulates up to
    BGZF_BLOCK_SIZE bytes then emits one member per flush; appends the EOF
    marker on close.  Batch deflate happens through deflate_blocks so the
    native/device backends parallelise multi-block flushes.
    """

    def __init__(self, dst: Union[str, HFile], level: int = -1,
                 build_index: bool = False, compress: bool = True):
        if isinstance(dst, str):
            self._fp = hopen(dst, "wb")
            self.name = dst
        else:
            self._fp = dst
            self.name = getattr(dst, "name", "?")
        self.level = level
        self.compress = compress
        self._buf = bytearray()
        self._pending: List[bytes] = []
        self._block_address = 0
        self._uncompressed = 0
        self._idx_co: List[int] = [0]
        self._idx_uo: List[int] = [0]
        self.build_index = build_index
        self._closed = False

    def write(self, data: bytes) -> int:
        if not self.compress:
            self._fp.write(data)
            self._uncompressed += len(data)
            return len(data)
        self._buf += data
        while len(self._buf) >= BGZF_BLOCK_SIZE:
            self._pending.append(bytes(self._buf[:BGZF_BLOCK_SIZE]))
            del self._buf[:BGZF_BLOCK_SIZE]
            if len(self._pending) >= 64:
                self._drain()
        return len(data)

    def _drain(self) -> None:
        if not self._pending:
            return
        comp = deflate_blocks(self._pending, self.level)
        for raw, c in zip(self._pending, comp):
            self._fp.write(c)
            self._block_address += len(c)
            self._uncompressed += len(raw)
            self._idx_co.append(self._block_address)
            self._idx_uo.append(self._uncompressed)
        self._pending.clear()

    def flush(self) -> None:
        """Flush all buffered data as complete blocks (bgzf_flush)."""
        if self._buf:
            self._pending.append(bytes(self._buf))
            self._buf.clear()
        self._drain()
        self._fp.flush()

    def tell(self) -> int:
        """Virtual offset of next write (only exact at block boundaries
        unless buffer counted — mirrors bgzf_tell semantics)."""
        if not self.compress:
            return self._uncompressed
        pend = sum(len(p) for p in self._pending)
        return make_virtual_offset(self._block_address, pend + len(self._buf))

    def flush_try(self, size: int) -> None:
        """Flush if size more bytes would overflow the block
        (bgzf_flush_try, bgzf.c:1745) — keeps records unsplit when callers
        want block-aligned record starts."""
        if len(self._buf) + size > BGZF_BLOCK_SIZE:
            self.flush()

    def save_index(self, fname: Optional[str] = None) -> None:
        idx = GziIndex(np.array(self._idx_co[:-1] or [0], np.uint64),
                       np.array(self._idx_uo[:-1] or [0], np.uint64))
        idx.save(fname or self.name + ".gzi")

    def close(self, write_eof: bool = True) -> None:
        if self._closed:
            return
        self.flush()
        if self.compress and write_eof:
            self._fp.write(BGZF_EOF)
        self._fp.flush()
        self._fp.close()
        self._closed = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def bgzf_open(fname: str, mode: str = "r") -> Union[BGZFReader, BGZFWriter]:
    """Open like bgzf_open (htslib/bgzf.h:111): mode 'r' or 'w[0-9u]'."""
    if "r" in mode:
        return BGZFReader(fname)
    level = -1
    compress = True
    for ch in mode:
        if ch.isdigit():
            level = int(ch)
        if ch == "u":
            compress = False
    return BGZFWriter(fname, level=level, compress=compress)
