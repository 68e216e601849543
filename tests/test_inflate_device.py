"""Device DEFLATE inflate vs zlib ground truth.

The device decoder (htslib_tpu/ops/inflate.py) replaces the reference's
per-block host inflate (`bgzf_uncompress`, /root/reference/bgzf.c:730).
Byte-exactness is checked against zlib over synthetic stream shapes and
against every BGZF block of reference corpus files.
"""
import base64
import json
import zlib

import numpy as np
import pytest

from conftest import REF_TEST, clean_jax_run


def _deflate(data: bytes, level: int) -> bytes:
    co = zlib.compressobj(level, zlib.DEFLATED, -15)
    return co.compress(data) + co.flush()


def _mk_cases():
    rng = np.random.RandomState(0)
    yield b""
    yield b"x"
    yield b"hello world " * 100
    yield rng.randint(0, 256, 5000, np.uint8).tobytes()   # stored-ish
    yield b"A" * 60000                                    # long matches
    yield (b"ACGT" * 4000) + rng.randint(0, 256, 3000, np.uint8).tobytes()
    yield bytes(range(256)) * 256                         # full 64 KiB
    yield rng.randint(65, 91, 65536, np.uint8).tobytes()  # text-like max


def run_inflate_cases(tmp_path, payloads, isizes, want):
    req = tmp_path / "req.json"
    req.write_text(json.dumps({
        "payloads": [base64.b64encode(p).decode() for p in payloads],
        "isizes": list(isizes),
    }))
    out = clean_jax_run(f"""
import base64, json
from htslib_tpu.ops.inflate import inflate_batch
req = json.loads(open({str(req)!r}).read())
payloads = [base64.b64decode(p) for p in req["payloads"]]
res = inflate_batch(payloads, req["isizes"])
print(json.dumps([base64.b64encode(r).decode() for r in res]))
""")
    got = [base64.b64decode(x) for x in json.loads(out)]
    assert len(got) == len(want)
    for i, (g, w) in enumerate(zip(got, want)):
        assert g == w, f"stream {i}: {len(g)} vs {len(w)} bytes"


@pytest.mark.parametrize("level", [0, 1, 6, 9])
def test_device_inflate_roundtrip(tmp_path, level):
    cases = list(_mk_cases())
    payloads = [_deflate(d, level) for d in cases]
    run_inflate_cases(tmp_path, payloads, [len(d) for d in cases], cases)


def _bgzf_blocks(path):
    raw = open(path, "rb").read()
    off = 0
    while off < len(raw):
        xlen = int.from_bytes(raw[off + 10:off + 12], "little")
        xo, end, bsize = off + 12, off + 12 + xlen, None
        while xo < end:
            si1, si2 = raw[xo], raw[xo + 1]
            slen = int.from_bytes(raw[xo + 2:xo + 4], "little")
            if si1 == 66 and si2 == 67:
                bsize = int.from_bytes(raw[xo + 4:xo + 6], "little") + 1
            xo += 4 + slen
        cdata = raw[off + 12 + xlen:off + bsize - 8]
        isize = int.from_bytes(raw[off + bsize - 4:off + bsize], "little")
        yield cdata, isize
        off += bsize


@pytest.mark.parametrize("name", ["range.bam", "modhdr.vcf.gz", "colons.bam"])
def test_device_inflate_corpus(tmp_path, name):
    blocks = [(c, i) for c, i in _bgzf_blocks(f"{REF_TEST}/{name}") if i > 0]
    payloads = [c for c, _ in blocks]
    want = [zlib.decompress(c, -15) for c in payloads]
    run_inflate_cases(tmp_path, payloads, [i for _, i in blocks], want)


def test_device_inflate_corrupt(tmp_path):
    good = _deflate(b"hello world" * 50, 6)
    bad = bytes([good[0] ^ 0xFF]) + good[1:]
    req = tmp_path / "req.json"
    req.write_text(json.dumps(
        {"payloads": [base64.b64encode(bad).decode()], "isizes": [550]}))
    out = clean_jax_run(f"""
import base64, json
from htslib_tpu.ops.inflate import inflate_batch
req = json.loads(open({str(req)!r}).read())
try:
    inflate_batch([base64.b64decode(p) for p in req["payloads"]],
                  req["isizes"])
    print("NOERROR")
except ValueError:
    print("VALUEERROR")
""")
    assert "VALUEERROR" in out
