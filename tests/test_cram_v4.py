"""CRAM 4.0 support: uint7/sint7 varints, v4 container/block framing,
VARINT/CONST codecs, XPACK/XRLE/XDELTA transform codecs, and full
encode->decode round trips at version (4,0).

The reference implements v4 behind the varint vtable (cram_fd.vv,
cram/cram_structs.h:753; selection cram_init_varint cram_io.c:5127);
there are no v4 sample files in the reference test corpus (test.pl
generates them with test_view -o version=4.0), so interop is validated
by self round-trip plus wire-level unit vectors here.
"""
import glob
import os

import pytest

from htslib_tpu.cram import CramReader, CramWriter
from htslib_tpu.cram.codecs import (ExternalStream, SliceStreams,
                                    parse_encoding)
from htslib_tpu.cram.v4 import (s7_decode, s7_encode, u7_decode, u7_encode,
                                varint_vec)
from htslib_tpu.sam import SamReader
from tests.conftest import REF_TEST, ref_path

from tests.test_cram_encode import norm

CORPUS = sorted(
    os.path.basename(p) for p in glob.glob(os.path.join(REF_TEST, "*.sam"))
) if os.path.isdir(REF_TEST) else []


# ---------------------------------------------------------------------------
# varint wire format
# ---------------------------------------------------------------------------

def test_u7_known_vectors():
    # var_put_u64: big-endian 7-bit groups, continuation in the top bit
    assert u7_encode(0) == b"\x00"
    assert u7_encode(0x7F) == b"\x7f"
    assert u7_encode(0x80) == b"\x81\x00"
    # the EOF container's "EOF" position magic (cram_io.c:5540 comment:
    # 82 95 9e 46 for 0x454f46)
    assert u7_encode(0x454F46) == b"\x82\x95\x9e\x46"


def test_u7_roundtrip_edges():
    for v in (0, 1, 127, 128, 255, 1 << 14, (1 << 14) - 1, 1 << 21,
              1 << 28, (1 << 32) - 1, 1 << 35, (1 << 63) - 1):
        enc = u7_encode(v)
        got, p = u7_decode(enc, 0)
        assert (got, p) == (v, len(enc)), v


def test_s7_zigzag():
    # zigzag: 0,-1,1,-2,2... -> 0,1,2,3,4
    assert s7_encode(0) == b"\x00"
    assert s7_encode(-1) == b"\x01"
    assert s7_encode(1) == b"\x02"
    assert s7_encode(-2) == b"\x03"
    for v in (-(1 << 40), -12345, -1, 0, 1, 300, 1 << 40):
        got, p = s7_decode(s7_encode(v), 0)
        assert got == v


def test_truncated_u7_raises():
    with pytest.raises(IOError):
        u7_decode(b"\x81", 0)  # continuation bit set, no terminator


# ---------------------------------------------------------------------------
# v4-only codecs (VARINT/CONST) and transform codecs (XPACK/XRLE/XDELTA)
# ---------------------------------------------------------------------------

def _enc(codec_id, params, vv):
    return vv.put32(codec_id) + vv.put32(len(params)) + params


def test_varint_codec_decode():
    from htslib_tpu.cram.structs import (E_VARINT_SIGNED, E_VARINT_UNSIGNED)
    vv = varint_vec(4)
    # unsigned, content id 7, offset -2
    spec = _enc(E_VARINT_UNSIGNED, vv.put32(7) + vv.put64s(-2), vv)
    codec, p = parse_encoding(spec, 0, vv)
    assert p == len(spec)
    st = SliceStreams(b"", {7: u7_encode(5) + u7_encode(0)})
    assert codec.read_int(st) == 3      # 5 + (-2)
    assert codec.read_int(st) == -2     # 0 + (-2)
    # signed, offset 0
    spec = _enc(E_VARINT_SIGNED, vv.put32(8) + vv.put64s(0), vv)
    codec, _ = parse_encoding(spec, 0, vv)
    st = SliceStreams(b"", {8: s7_encode(-123) + s7_encode(99)})
    assert codec.read_int(st) == -123
    assert codec.read_int(st) == 99


def test_const_codec_decode():
    from htslib_tpu.cram.structs import E_CONST_BYTE, E_CONST_INT
    vv = varint_vec(4)
    codec, _ = parse_encoding(_enc(E_CONST_INT, vv.put64s(-7), vv), 0, vv)
    st = SliceStreams(b"", {})
    assert codec.read_int(st) == -7       # consumes nothing
    assert codec.read_int(st) == -7
    codec, _ = parse_encoding(_enc(E_CONST_BYTE, vv.put64s(65), vv), 0, vv)
    assert codec.read_bytes(st, 3) == b"AAA"


def test_xpack_codec_decode():
    from htslib_tpu.cram.structs import E_EXTERNAL, E_XPACK
    vv = varint_vec(4)
    # 2-bit symbols mapping 0..3 -> P,A,C,K packed MSB-first into bytes
    vals = b"PACKPACK"
    rmap = {0: ord("P"), 1: ord("A"), 2: ord("C"), 3: ord("K")}
    inv = {v: k for k, v in rmap.items()}
    packed = bytearray()
    for i in range(0, len(vals), 4):
        b = 0
        for j, c in enumerate(vals[i:i + 4]):
            b |= inv[c] << ((3 - j) * 2)
        packed.append(b)
    sub = _enc(E_EXTERNAL, vv.put32(5), vv)
    params = (vv.put32(2) + vv.put32(4)
              + b"".join(vv.put32(rmap[k]) for k in range(4)) + sub)
    codec, p = parse_encoding(_enc(E_XPACK, params, vv), 0, vv)
    st = SliceStreams(b"", {5: bytes(packed)})
    assert codec.read_bytes(st, 8) == vals


def test_xrle_codec_decode():
    from htslib_tpu.cram.structs import E_EXTERNAL, E_XRLE
    vv = varint_vec(4)
    # runs of 'A' are collapsed: lits = "ABCA", lens = [out_sz, runA-1...]
    out = b"AAAABCAA"
    lits = b"ABCA"
    lens = u7_encode(len(out)) + u7_encode(3) + u7_encode(1)
    params = (vv.put32(1) + vv.put32(ord("A"))          # RLE map {A}
              + _enc(E_EXTERNAL, vv.put32(11), vv)       # len codec
              + _enc(E_EXTERNAL, vv.put32(12), vv))      # lit codec
    codec, _ = parse_encoding(_enc(E_XRLE, params, vv), 0, vv)
    st = SliceStreams(b"", {11: lens, 12: lits})
    assert codec.read_bytes(st, 8) == out


def test_xdelta_codec_decode():
    from htslib_tpu.cram.structs import E_EXTERNAL, E_XDELTA
    vv = varint_vec(4)
    # word_size=2: LE uint16 words, zigzag deltas as uint7 varints
    words = [100, 105, 103, 65535, 0]
    payload = bytearray()
    last = 0
    for w in words:
        d = (w - last) & 0xFFFF
        if d >= 0x8000:
            d -= 0x10000
        payload += u7_encode(((d << 1) ^ (d >> 15)) & 0xFFFF)
        last = w
    params = vv.put32(2) + _enc(E_EXTERNAL, vv.put32(9), vv)
    codec, _ = parse_encoding(_enc(E_XDELTA, params, vv), 0, vv)
    st = SliceStreams(b"", {9: bytes(payload)})
    got = codec.read_bytes(st, 10)
    import struct
    assert list(struct.unpack("<5H", got)) == words


# ---------------------------------------------------------------------------
# whole-file round trips at version (4,0)
# ---------------------------------------------------------------------------

V4_CORPUS = [f for f in CORPUS if f in (
    "ce#1.sam", "ce#2.sam", "ce#5.sam", "ce#5b.sam", "ce#unmap.sam",
    "ce#unmap2.sam", "c1#bounds.sam", "c1#clip.sam", "c1#pad1.sam",
    "xx#minimal.sam", "xx#triplet.sam", "xx#large_aux.sam",
    "sam_alignment.tmp.sam",
)] or CORPUS[:8]


@pytest.mark.parametrize("fname", V4_CORPUS or ["skip"])
def test_cram_v4_roundtrip(fname, tmp_path):
    if fname == "skip":
        pytest.skip("no corpus")
    with SamReader(ref_path(fname)) as r:
        hdr = r.header
        recs = list(r)
    cram = str(tmp_path / "t.cram")
    with CramWriter(cram, hdr, version=(4, 0)) as w:
        for rec in recs:
            w.write(rec)
    with open(cram, "rb") as f:
        assert f.read(6) == b"CRAM\x04\x00"
    with CramReader(cram) as r2:
        assert r2.version == (4, 0)
        got = [norm(rec.to_sam(hdr)) for rec in r2]
    want = [norm(rec.to_sam(hdr)) for rec in recs]
    assert got == want


def test_cram_v4_roundtrip_with_reference(tmp_path):
    """Reference-based v4 encoding (substitution features against the
    fasta) with MD/NM regeneration on decode."""
    fa = ref_path("ce.fa")
    if not os.path.exists(fa):
        pytest.skip("no corpus")
    with SamReader(ref_path("ce#5b.sam")) as r:
        hdr = r.header
        recs = list(r)
    cram = str(tmp_path / "t.cram")
    with CramWriter(cram, hdr, ref=fa, version=(4, 0)) as w:
        for rec in recs:
            w.write(rec)
    # v4 decode_md is auto: no MD* placeholders were written, so the
    # default reader must not invent MD/NM (cram_decode.c:1114-1117)
    with CramReader(cram, ref=fa) as r2:
        got = [norm(rec.to_sam(hdr)) for rec in r2]
    want = [norm(rec.to_sam(hdr)) for rec in recs]
    assert got == want


def test_cram_v4_multiref_and_unsorted(tmp_path):
    """v4 AP is always delta-coded (cram_encode.c:2203), so unsorted and
    multi-ref slices must round trip through signed deltas."""
    if not CORPUS:
        pytest.skip("no corpus")
    with SamReader(ref_path("ce#5b.sam")) as r:
        hdr = r.header
        recs = list(r)
    recs = recs[::-1]  # reverse: deltas go negative
    cram = str(tmp_path / "t.cram")
    with CramWriter(cram, hdr, version=(4, 0)) as w:
        for rec in recs:
            w.write(rec)
    with CramReader(cram) as r2:
        got = [norm(rec.to_sam(hdr)) for rec in r2]
    assert got == [norm(rec.to_sam(hdr)) for rec in recs]


def test_cram_v4_container_crc_detects_corruption(tmp_path):
    if not CORPUS:
        pytest.skip("no corpus")
    with SamReader(ref_path("ce#1.sam")) as r:
        hdr = r.header
        recs = list(r)
    cram = str(tmp_path / "t.cram")
    with CramWriter(cram, hdr, version=(4, 0)) as w:
        for rec in recs:
            w.write(rec)
    blob = bytearray(open(cram, "rb").read())
    # flip a bit inside the second container's header (past the 26-byte
    # file definition + header container)
    blob[150] ^= 0x40
    bad = str(tmp_path / "bad.cram")
    open(bad, "wb").write(bytes(blob))
    with pytest.raises(IOError):
        with CramReader(bad) as r2:
            list(r2)
