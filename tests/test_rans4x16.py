"""rANS Nx16 codec property tests (CRAM 3.1 entropy coder; htscodecs
submodule is empty in the reference snapshot, so these validate
self-consistency: decode(encode(x)) == x over every flag combination)."""
import numpy as np
import pytest

from htslib_tpu.codecs import rans4x16 as R

rng = np.random.default_rng(11)
CASES = [
    b"",
    b"A",
    b"AAAA" * 100,
    bytes(rng.integers(0, 256, 5000, dtype=np.uint8)),
    bytes(rng.integers(60, 64, 10000, dtype=np.uint8)),     # 4-symbol
    bytes(rng.choice([65, 67, 71, 84], 9999).astype(np.uint8)),
    b"".join(bytes([c]) * int(r) for c, r in
             zip(rng.integers(30, 40, 500), rng.integers(1, 50, 500))),
]
FLAGS = [0, R.O_ORDER1, R.O_N32, R.O_ORDER1 | R.O_N32, R.O_CAT,
         R.O_PACK, R.O_RLE, R.O_PACK | R.O_RLE, R.O_STRIPE,
         R.O_STRIPE | R.O_ORDER1, R.O_PACK | R.O_ORDER1,
         R.O_RLE | R.O_ORDER1]


@pytest.mark.parametrize("flags", FLAGS)
def test_roundtrip_all_flagsets(flags):
    for data in CASES:
        assert R.uncompress(R.compress(data, flags)) == data


def test_compresses_low_entropy():
    data = bytes(rng.choice([65, 67, 71, 84], 50000).astype(np.uint8))
    assert len(R.compress(data, 0)) < len(data) // 3
    assert len(R.compress(data, R.O_PACK)) < len(data) // 3


def test_cram31_file_roundtrip(tmp_path):
    # version (3,1) files pick rans4x16 per-series via codec metrics
    from htslib_tpu.cram import CramReader
    from htslib_tpu.cram.encode import CramEncoder
    from htslib_tpu.sam import SamReader
    from tests.conftest import has_ref, ref_path
    if not has_ref("ce#1000.sam"):
        pytest.skip("no corpus")
    with SamReader(ref_path("ce#1000.sam")) as r:
        hdr, recs = r.header, list(r)
    p = str(tmp_path / "t31.cram")
    enc = CramEncoder(p, hdr, version=(3, 1))
    for rec in recs:
        enc.write(rec)
    enc.close()
    assert open(p, "rb").read()[4:6] == b"\x03\x01"
    with CramReader(p) as r2:
        assert [rec.to_sam(hdr) for rec in r2] == \
            [rec.to_sam(hdr) for rec in recs]
