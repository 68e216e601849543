"""On-device decode->reduce pipeline (ops/device_stats.py): wire-exact
rANS decode chained into a histogram reduction with only counts coming
back (VERDICT r3 task #2).  Runs in Pallas interpret mode on CPU."""
import numpy as np
import pytest

from tests.conftest import clean_jax_run


@pytest.mark.slow
def test_qualstats_device_interpret():
    out = clean_jax_run("""
import numpy as np
from htslib_tpu.codecs.rans4x16 import compress
from htslib_tpu.ops.device_stats import qualstats_device, qualstats_host
rng = np.random.RandomState(11)
# uneven lengths + skewed and uniform distributions + >1 group
datas = [rng.randint(0, 45, 30000 + i * 7777).astype(np.uint8).tobytes()
         for i in range(5)]
datas.append((b"\\x17" * 50000) + bytes(rng.randint(0, 64, 1000,
                                                    dtype=np.uint8)))
encs = [compress(d, 0x04) for d in datas]
hist, t = qualstats_device(encs, interpret=True)
want = qualstats_host(datas)
assert hist.shape == want.shape
assert (hist == want).all(), "device histogram != host histogram"
assert int(hist.sum()) == sum(len(d) for d in datas)
print("OK", int(hist.sum()))
""")
    assert "OK" in out


@pytest.mark.slow
def test_bgzf_stored_device_interpret():
    """Device stored-block BGZF writer (ops/bgzf_device.py): byte-valid
    output (gzip + BGZFReader + EOF marker), CRC32 via the GF(2) bit-
    contribution kernel."""
    out = clean_jax_run("""
import numpy as np, gzip
from htslib_tpu.ops.bgzf_device import bgzf_stored_device, crc_device_rate
rng = np.random.RandomState(9)
for n in (0, 5, 65280, 65281, 200000):
    data = rng.randint(0, 256, n, dtype=np.uint8).tobytes()
    blob = bgzf_stored_device(data, interpret=True)
    assert gzip.decompress(blob) == data, n
    open("/tmp/_dev_stored_t.gz", "wb").write(blob)
    from htslib_tpu.bgzf import BGZFReader
    with BGZFReader("/tmp/_dev_stored_t.gz") as r:
        assert bytes(r.read_all()) == data, n
        assert r.check_eof()
r = crc_device_rate(n_blocks=4, reps=1, interpret=True)
assert r["exact"]
print("OK")
""")
    assert "OK" in out


@pytest.mark.slow
def test_rans_enc_pallas_interpret():
    """Device rANS Nx16 O0 encode (ops/rans_enc_pallas.py): byte-exact
    vs the Python codec across lengths, alphabets and padding shapes."""
    out = clean_jax_run("""
import numpy as np
from htslib_tpu.codecs.rans4x16 import compress, uncompress
from htslib_tpu.ops.rans_enc_pallas import encode_nx16_o0_batch
rng = np.random.RandomState(5)
datas = []
for n in (33, 64, 100, 4097, 40001, 70000):
    datas.append(rng.randint(0, 45, n).astype(np.uint8).tobytes())
datas.append(bytes(rng.randint(0, 256, 2000, dtype=np.uint8)))
datas.append(b"\\x07" * 9000)
got = encode_nx16_o0_batch(datas, interpret=True)
for d, g in zip(datas, got):
    assert g == compress(d, 0x04), len(d)
    assert uncompress(g) == d
print("OK", len(datas))
""")
    assert "OK" in out


@pytest.mark.slow
def test_cram_qual_hist_device_profile(tmp_path):
    """Whole-file CRAM quality histogram with the TPU-serving profile:
    the QS series is pinned to the device-decodable 32-way O0 rANS wire,
    streams decode+reduce on the (interpret-mode) device pipeline, and
    the result equals the per-record host truth.  The profile output
    stays valid CRAM readable by the normal reader."""
    out = clean_jax_run(f"""
import numpy as np
from htslib_tpu.sam import SamReader
from htslib_tpu.cram import CramReader, CramWriter
from htslib_tpu.ops.device_stats import QBINS, cram_qual_hist
src = "/root/reference/test/ce#1000.sam"
with SamReader(src) as r:
    hdr = r.header
    recs = list(r)
path = {str(tmp_path / 'dev.cram')!r}
w = CramWriter(path, hdr, version=(3, 1), seqs_per_slice=300,
               device_profile=True)
for rec in recs:
    w.write(rec)
w.close()
# plain readers still decode the profile output
with CramReader(path) as rr:
    back = [bytes(x.qual) for x in rr]
assert back == [bytes(x.qual) for x in recs]
want = np.zeros(QBINS, np.int64)
for q in back:
    a = np.minimum(np.frombuffer(q, np.uint8), QBINS - 1)
    want += np.bincount(a, minlength=QBINS)[:QBINS]
stats = {{}}
got = cram_qual_hist(path, interpret=True, stats=stats)
assert stats["device_blocks"] > 0, stats
assert (got == want).all()
print("OK", stats)
""")
    assert "OK" in out


@pytest.mark.slow
def test_deflate_uniform_device_interpret():
    """Entropy-coded device deflate (uniform-length dynamic Huffman):
    valid DEFLATE with real compression for small alphabets, stored
    fallback otherwise, gzip- and BGZFReader-decodable."""
    out = clean_jax_run("""
import numpy as np, gzip
from htslib_tpu.ops.bgzf_device import deflate_uniform_device
rng = np.random.RandomState(3)
cases = [rng.randint(20, 41, 200000).astype(np.uint8).tobytes(),
         bytes(rng.choice(list(b"ACGT"), 150000)),
         rng.randint(0, 200, 70000).astype(np.uint8).tobytes(),
         b"AAAA", b"", b"Q",
         bytes(range(128)) * 600]
ratios = []
for data in cases:
    st = {}
    blob = deflate_uniform_device(data, interpret=True, stats=st)
    assert gzip.decompress(blob) == data
    open("/tmp/_devhuff_t.gz", "wb").write(blob)
    from htslib_tpu.bgzf import BGZFReader
    with BGZFReader("/tmp/_devhuff_t.gz") as r:
        assert bytes(r.read_all()) == data and r.check_eof()
    if data:
        ratios.append(len(blob) / len(data))
assert ratios[0] < 0.7 and ratios[1] < 0.45   # 5-bit quals, 3-bit ACGT
print("OK", [round(r, 3) for r in ratios])
""")
    assert "OK" in out


@pytest.mark.slow
def test_qualstats_device_4x8_interpret():
    """Vanilla CRAM 3.0 wire: rANS 4x8 order-0 streams decode AND
    reduce on the (interpret-mode) device, including odd tails and
    rounding-tolerant tables."""
    out = clean_jax_run("""
import numpy as np
from htslib_tpu.codecs import rans4x8
from htslib_tpu.ops.device_stats import (QBINS, qualstats_device_4x8,
                                         qualstats_host)
rng = np.random.RandomState(4)
datas = [rng.randint(0, 45, 30000 + i * 7771).astype(np.uint8).tobytes()
         for i in range(5)]
datas.append(b"\\x17" * 40001)
datas.append(bytes(rng.randint(0, 64, 1001, dtype=np.uint8)))
encs = [rans4x8.compress(d, 0) for d in datas]
hist, t = qualstats_device_4x8(encs, interpret=True)
want = qualstats_host(datas)
assert (hist == want).all()
assert int(hist.sum()) == sum(len(d) for d in datas)
print("OK", int(hist.sum()))
""")
    assert "OK" in out


@pytest.mark.slow
def test_rans4x8_pallas_decode_interpret():
    """Wire-exact device decode of the CRAM 3.0 rANS 4x8 codec."""
    out = clean_jax_run("""
import numpy as np
from htslib_tpu.codecs import rans4x8
from htslib_tpu.ops.rans4x8_pallas import decode_4x8_o0_batch
rng = np.random.RandomState(2)
datas = [rng.randint(0, 45, n).astype(np.uint8).tobytes()
         for n in (1000, 4093, 4096, 40001, 12345)]
datas += [bytes(rng.choice(list(b"ACGTN"), 5003)) for _ in range(30)]
encs = [rans4x8.compress(d, 0) for d in datas]
got = decode_4x8_o0_batch(encs, interpret=True)
assert all(g == d for g, d in zip(got, datas))
print("OK", len(datas))
""")
    assert "OK" in out


@pytest.mark.slow
def test_qualstats_device_o1_interpret():
    """rANS Nx16 ORDER-1 32-way streams (the mode real encoders pick
    for correlated qualities) decode AND reduce on the (interpret-mode)
    device, including host-finished tails and the dense-context carry
    (ops/rans_o1_pallas.py)."""
    out = clean_jax_run("""
import numpy as np
from htslib_tpu.codecs.rans4x16 import compress
from htslib_tpu.ops.device_stats import qualstats_device_o1, qualstats_host
rng = np.random.RandomState(5)
def walk(n):
    return np.clip(np.cumsum(rng.randint(-2, 3, n)) + 20, 0,
                   44).astype(np.uint8).tobytes()
datas = [walk(30000 + i * 777) for i in range(3)] + [walk(97), walk(64)]
encs = [compress(d, 0x05) for d in datas]
assert all(e[0] == 0x05 for e in encs)
hist, t = qualstats_device_o1(encs, interpret=True)
want = qualstats_host(datas)
assert (hist == want).all()
print("OK", int(hist.sum()))
""")
    assert "OK" in out


@pytest.mark.slow
def test_qualstats_device_4x8_o1_interpret():
    """Vanilla CRAM 3.0 ORDER-1 wire (rans4x8 order=1) through the
    stacked-context hist kernel, tails finished on the host from the
    returned final context."""
    out = clean_jax_run("""
import numpy as np
from htslib_tpu.codecs import rans4x8
from htslib_tpu.ops.device_stats import qualstats_device_4x8, qualstats_host
rng = np.random.RandomState(6)
def walk(n):
    return np.clip(np.cumsum(rng.randint(-2, 3, n)) + 20, 0,
                   44).astype(np.uint8).tobytes()
datas = [walk(20000 + i * 773) for i in range(3)] + [walk(4003)]
encs = [rans4x8.compress(d, 1) for d in datas]
assert all(e[0] == 1 for e in encs)
hist, t = qualstats_device_4x8(encs, interpret=True, o1=True)
want = qualstats_host(datas)
assert (hist == want).all()
print("OK", int(hist.sum()))
""")
    assert "OK" in out


@pytest.mark.slow
def test_pack_rewrap_remap():
    """PACK-transformed Nx16 streams: core rewrapped as a plain stream
    and the 256-bin core histogram remapped exactly to symbol bins
    (incl. pad-slot subtraction)."""
    import numpy as np

    from htslib_tpu.codecs.rans4x16 import compress, uncompress
    from htslib_tpu.ops.device_stats import (QBINS, _pack_hist_remap,
                                             _pack_rewrap, qualstats_host)
    rng = np.random.RandomState(7)
    for P, fl in ((2, 0x84), (4, 0x84), (13, 0x85)):
        data = bytes((rng.randint(0, P, 30001) * 3 + 5).astype(np.uint8))
        enc = compress(data, fl)
        assert enc[0] == fl
        syms, w, ulen, plen, core = _pack_rewrap(enc)
        # host-decode the rewrapped core and histogram it (the device
        # kernels' wire-exactness is covered by the kernel tests)
        core_bytes = uncompress(core)
        assert len(core_bytes) == plen
        core_hist = np.bincount(np.frombuffer(core_bytes, np.uint8),
                                minlength=256)
        got = _pack_hist_remap(core_hist, syms, w, ulen, plen, QBINS)
        want = qualstats_host([data])[0]
        assert (got == want).all(), (P, hex(fl))


def test_o1_decode_batch_interpret():
    """Wire-exact O1 bytes-out decode vs the host codec."""
    out = clean_jax_run("""
import numpy as np
from htslib_tpu.codecs.rans4x16 import compress, uncompress
from htslib_tpu.ops.rans_o1_pallas import decode_nx16_o1_batch
rng = np.random.RandomState(8)
def walk(n):
    return np.clip(np.cumsum(rng.randint(-2, 3, n)) + 16, 0,
                   40).astype(np.uint8).tobytes()
cases = [walk(5000), walk(3001), walk(97), walk(64),
         bytes(np.full(500, 7, np.uint8))]
encs = [compress(d, 0x05) for d in cases]
for e, d in zip(encs, cases):
    assert uncompress(e) == d
out = decode_nx16_o1_batch(encs, interpret=True)
assert all(o == d for o, d in zip(out, cases))
print("OK")
""")
    assert "OK" in out


@pytest.mark.slow
def test_stripe_rewrap_device():
    """STRIPE-transformed Nx16 streams (flags & 0x08): the N sub-streams
    are standalone plain 32-way streams after rewrap, and their device
    histograms sum to the original data's histogram (both orders)."""
    out = clean_jax_run("""
import numpy as np
from htslib_tpu.codecs.rans4x16 import compress
from htslib_tpu.ops.device_stats import (_stripe_rewrap, qualstats_device,
                                         qualstats_device_o1, qualstats_host)
rng = np.random.RandomState(9)
def walk(n):
    return np.clip(np.cumsum(rng.randint(-2, 3, n)) + 20, 0,
                   44).astype(np.uint8).tobytes()
for fl in (0x0C, 0x0D):
    data = walk(40007)
    enc = compress(data, fl)
    assert enc[0] == fl
    subs = _stripe_rewrap(enc)
    tot = np.zeros(64, np.int64)
    o0s = [s for s, o1 in subs if not o1]
    o1s = [s for s, o1 in subs if o1]
    if o0s:
        h, _ = qualstats_device(o0s, interpret=True)
        tot += h.sum(axis=0)
    if o1s:
        h, _ = qualstats_device_o1(o1s, interpret=True)
        tot += h.sum(axis=0)
    assert (tot == qualstats_host([data])[0]).all(), hex(fl)
print("OK")
""")
    assert "OK" in out
