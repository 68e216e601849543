"""CRAM 3.1 codec family (arith/fqzcomp/tok3/rANS Nx16).

Each codec has two independent implementations — pure Python
(htslib_tpu/codecs/) and C (htslib_tpu/native/htscodecs_shim/, also
linked into the locally built reference htslib) — validated here for
stream-level wire identity and bidirectional decode; file-level CRAM
3.1 interop against the built htslib lives in test_interop_htslib.py.
The htscodecs submodule is EMPTY in this snapshot, so identity against
authentic upstream binaries remains unverifiable locally; formats
follow the CRAM 3.1 specification structure."""
import numpy as np
import pytest

from htslib_tpu.codecs import arith, fqzcomp, tok3
from htslib_tpu.codecs.rans4x16 import (O_CAT, O_ORDER1, O_PACK, O_RLE,
                                        O_STRIPE)

rng = np.random.default_rng(5)
CASES = [b"", b"Z", b"hello world" * 50,
         bytes(rng.integers(0, 256, 3000, dtype=np.uint8)),
         bytes(rng.choice([65, 67, 71, 84], 5000).astype(np.uint8))]


@pytest.mark.parametrize("flags", [0, O_ORDER1, O_CAT, O_PACK, O_RLE,
                                   O_STRIPE, O_PACK | O_ORDER1,
                                   O_STRIPE | O_ORDER1])
def test_arith_roundtrip(flags):
    for data in CASES:
        assert arith.uncompress(arith.compress(data, flags)) == data


def test_arith_near_entropy():
    data = bytes(rng.choice([65, 67, 71, 84], 20000).astype(np.uint8))
    # 4 equiprobable symbols = 2 bits/sym = 5000 bytes
    assert len(arith.compress(data, 0)) < 5200


def test_fqz_roundtrip_and_ratio():
    walk = np.clip(np.cumsum(rng.integers(-2, 3, 20000)) + 35,
                   2, 60).astype(np.uint8)
    quals = bytearray()
    i = 0
    while i < len(walk):
        ln = int(rng.integers(80, 120))
        quals += bytes(walk[i:i + ln]) + b"\0"
        i += ln
    quals = bytes(quals)
    comp = fqzcomp.compress(quals)
    assert fqzcomp.decompress(comp) == quals
    assert len(comp) < len(quals) // 2


def test_tok3_structured_names():
    names = [f"HS18_09653:4:1315:{19857 + i * 7}:{61712 + (i * 13) % 999}"
             .encode() for i in range(3000)]
    names += [b"read_odd_name", b"x", b"a1:b2:003:z", b"007leading"]
    blob = tok3.encode_names(names)
    assert tok3.decode_names(blob) == b"\0".join(names) + b"\0"
    # token columns + delta must crush structured names
    assert len(blob) < len(b"\0".join(names)) // 20


def test_cram31_tok3_wiring(tmp_path):
    from htslib_tpu.cram import CramReader
    from htslib_tpu.cram.encode import CramEncoder
    from htslib_tpu.sam import BamReader
    from tests.conftest import has_ref, ref_path
    if not has_ref("range.bam"):
        pytest.skip("no corpus")
    with BamReader(ref_path("range.bam")) as r:
        hdr, recs = r.header, list(r)
    p = str(tmp_path / "t.cram")
    enc = CramEncoder(p, hdr, version=(3, 1))
    for rec in recs:
        enc.write(rec)
    enc.close()
    with CramReader(p) as r2:
        assert [rec.to_sam(hdr) for rec in r2] == \
            [rec.to_sam(hdr) for rec in recs]


# ---------------------------------------------------------------------------
# C <-> Python wire cross-validation: the native htscodecs_shim
# implementations (also linked into the locally built reference htslib)
# must produce byte-identical streams to the pure-Python codecs, and each
# side must decode the other's output.
# ---------------------------------------------------------------------------

def _native():
    from htslib_tpu.native import native
    if native is None:
        pytest.skip("native library unavailable")
    return native


XCASES = [b"", b"Z", b"hello world" * 50,
          bytes(rng.integers(0, 256, 2000, dtype=np.uint8)),
          bytes(rng.choice([65, 67, 71, 84], 4000).astype(np.uint8)),
          bytes((rng.integers(0, 8, 3000) * 5 + 33).astype(np.uint8))]


@pytest.mark.parametrize("flags", [0, 1, 4, 5, 0x40, 0x41, 0x80, 0x81,
                                   0xC1, 0x08, 0x09, 0x20])
def test_rans4x16_c_python_wire_identity(flags):
    from htslib_tpu.codecs import rans4x16
    nat = _native()
    for data in XCASES:
        c = nat.rans4x16_compress(data, flags)
        p = rans4x16.compress(data, flags)
        assert c == p
        assert rans4x16.uncompress(c) == data
        assert nat.rans4x16_uncompress(p) == data


@pytest.mark.parametrize("tier", ["scalar", "sse4", "avx2"])
@pytest.mark.parametrize("flags", [0x04, 0x05])
def test_rans4x16_x32_tier_dispatch(tier, flags):
    """Every SIMD tier of the 32-way wire (AVX2 / SSE4.1 / scalar;
    rANS_static32x16pr_{avx2,sse4}.c) produces and consumes identical
    bytes.  RANS32X16_TIER caps the dispatch so the lower tiers run on
    an AVX2 host; >=512-byte payloads force the vector paths."""
    import os

    from htslib_tpu.codecs import rans4x16
    nat = _native()
    datas = [bytes(rng.integers(0, 50, n, dtype=np.uint8) + 33)
             for n in (512, 2048, 4097)]
    try:
        os.environ["RANS32X16_TIER"] = tier
        for data in datas:
            c = nat.rans4x16_compress(data, flags)
            assert c == rans4x16.compress(data, flags)
            assert nat.rans4x16_uncompress(c) == data
    finally:
        os.environ.pop("RANS32X16_TIER", None)


@pytest.mark.parametrize("order", [0, 1, 0x41, 0x81, 0x09, 0x20])
def test_arith_c_python_wire_identity(order):
    nat = _native()
    for data in XCASES:
        c = nat.arith_compress(data, order)
        p = arith.compress(data, order)
        assert c == p
        assert arith.uncompress(c) == data
        assert nat.arith_uncompress(p) == data


def test_fqz_c_python_wire_identity():
    nat = _native()
    walk = np.clip(np.cumsum(rng.integers(-2, 3, 12000)) + 35,
                   2, 60).astype(np.uint8) + 33
    data = bytes(walk)
    lens = [100] * (len(data) // 100)
    c = nat.fqz_compress(data, lens)
    p = fqzcomp.compress(data, lens)
    assert c == p
    assert fqzcomp.decompress(c) == data
    assert nat.fqz_decompress(p) == data
    # small-alphabet path (qmap)
    d4 = bytes(rng.choice([33, 37, 40, 41], 3000).astype(np.uint8))
    assert nat.fqz_compress(d4, [150] * 20) == fqzcomp.compress(d4, [150] * 20)


def test_tok3_c_python_wire_identity():
    nat = _native()
    names = [f"HS18:4:{1000 + i}:{i * 37 % 999}".encode() for i in range(400)]
    names += [b"", b"odd", b"0042", b"123456789012345"]
    blk = b"".join(n + b"\0" for n in names)
    for ua in (0, 1):
        c = nat.tok3_encode(blk, ua)
        p = tok3.encode_names(names, ua)
        assert c == p
        assert tok3.decode_names(c) == blk
        assert nat.tok3_decode(p) == blk
