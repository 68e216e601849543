"""CRAM 3.1 codec family (arith/fqzcomp/tok3; htscodecs submodule is
empty in the snapshot, so these validate self-consistency and
compression quality, not wire interop)."""
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
