"""BGZF tests — modeled on reference test/test_bgzf.c: round trips, block
boundaries, EOF marker, .gzi index, virtual offsets, uncompressed mode."""
import os
import zlib

import numpy as np
import pytest

from htslib_tpu import bgzf
from tests.conftest import ref_path, has_ref


def test_compress_decompress_roundtrip():
    data = b"hello bgzf world\n" * 1000
    blk = bgzf.compress_block(data)
    assert blk[:2] == b"\x1f\x8b"
    assert bgzf.parse_block_header(blk) == len(blk)
    assert bgzf.decompress_block(blk) == data


def test_level0_stored():
    data = os.urandom(1000)
    blk = bgzf.compress_block(data, level=0)
    assert bgzf.decompress_block(blk) == data


def test_eof_block_is_valid_empty():
    assert bgzf.parse_block_header(bgzf.BGZF_EOF) == 28
    assert bgzf.decompress_block(bgzf.BGZF_EOF) == b""


def test_writer_reader_roundtrip(tmp_path):
    path = str(tmp_path / "t.gz")
    payload = b"".join(bytes([i % 251]) * 997 for i in range(300))  # ~300KB
    with bgzf.BGZFWriter(path, build_index=True) as w:
        w.write(payload)
        w.flush()
        w.save_index()
    with bgzf.BGZFReader(path) as r:
        assert r.is_bgzf
        assert r.check_eof() == 1
        got = r.read(-1)
    assert got == payload
    # batch path
    with bgzf.BGZFReader(path) as r:
        arr = r.read_all()
    assert bytes(arr) == payload
    # gzi round trip
    idx = bgzf.GziIndex.load(path + ".gzi")
    with bgzf.BGZFReader(path) as r:
        r.idx = idx
        r.useek(150000)
        assert r.read(10) == payload[150000:150010]


def test_virtual_offsets(tmp_path):
    path = str(tmp_path / "v.gz")
    with bgzf.BGZFWriter(path) as w:
        for i in range(10):
            w.write(f"chunk {i:04d} ".encode() * 100)
            w.flush()  # force block boundaries
    offsets = []
    with bgzf.BGZFReader(path) as r:
        while True:
            off = r.tell()
            data = r.read(1100)
            if not data:
                break
            offsets.append((off, data))
        for off, want in offsets:
            r.seek(off)
            assert r.read(len(want)) == want


def test_scan_and_inflate_blocks(tmp_path):
    path = str(tmp_path / "s.gz")
    payload = os.urandom(200000) + b"A" * 100000
    with bgzf.BGZFWriter(path) as w:
        w.write(payload)
    raw = open(path, "rb").read()
    out, table = bgzf.inflate_blocks(raw)
    assert bytes(out) == payload
    assert table.n >= 4  # >=300KB over 0xff00-size blocks + EOF
    assert int(table.usizes.sum()) == len(payload)


def test_uncompressed_mode(tmp_path):
    path = str(tmp_path / "u.txt")
    w = bgzf.bgzf_open(path, "wu")
    w.write(b"plain text data\n")
    w.close()
    assert open(path, "rb").read() == b"plain text data\n"
    r = bgzf.bgzf_open(path, "r")
    assert not r.is_bgzf
    assert r.read(-1) == b"plain text data\n"
    r.close()


def test_plain_gzip_stream(tmp_path):
    import gzip
    path = str(tmp_path / "p.gz")
    with gzip.open(path, "wb") as f:
        f.write(b"not bgzf but gzip\n" * 100)
    with bgzf.BGZFReader(path) as r:
        assert r.is_gzip and not r.is_bgzf
        assert r.read(-1) == b"not bgzf but gzip\n" * 100


@pytest.mark.skipif(not has_ref("bgziptest.txt.gz"), reason="no corpus")
def test_reference_bgziptest():
    want = open(ref_path("bgziptest.txt"), "rb").read()
    with bgzf.BGZFReader(ref_path("bgziptest.txt.gz")) as r:
        assert r.is_bgzf
        got = r.read(-1)
    assert got == want
    # .gzi from reference parses and points into the file
    idx = bgzf.GziIndex.load(ref_path("bgziptest.txt.gz.gzi"))
    with bgzf.BGZFReader(ref_path("bgziptest.txt.gz")) as r:
        r.idx = idx
        r.useek(len(want) // 2)
        assert r.read(16) == want[len(want) // 2:len(want) // 2 + 16]


@pytest.mark.skipif(not has_ref("range.bam"), reason="no corpus")
def test_reference_bam_is_bgzf():
    with bgzf.BGZFReader(ref_path("range.bam")) as r:
        assert r.is_bgzf
        assert r.read(4) == b"BAM\x01"
        assert r.check_eof() == 1


def test_native_matches_python_fallback(tmp_path):
    from htslib_tpu.native import native
    if native is None:
        pytest.skip("native library unavailable")
    payload = os.urandom(100000)
    blocks = bgzf.deflate_blocks([payload[:0xff00], payload[0xff00:]], 6)
    raw = np.frombuffer(b"".join(blocks), np.uint8)
    co, cs, us = native.bgzf_scan(raw)
    assert list(us) == [0xff00, len(payload) - 0xff00]
    out = native.inflate_batch(raw, co, cs, us)
    assert bytes(out) == payload
    # crc32 agrees with zlib
    assert native.crc32(np.frombuffer(payload, np.uint8)) == (zlib.crc32(payload) & 0xFFFFFFFF)
