"""Pallas rANS kernels: wire-exactness of the gatherless Nx16 order-0
decoder against the validated host codec (interpret mode on CPU; the
same kernel runs compiled on the chip — scripts/bench_device.py)."""
import pytest

from tests.conftest import clean_jax_run


def test_pallas_nx16_o0_wire_exact():
    out = clean_jax_run(r'''
import numpy as np
from htslib_tpu.codecs.rans4x16 import compress, uncompress
from htslib_tpu.ops.rans_pallas import decode_nx16_o0_batch
rng = np.random.RandomState(3)
cases = [
    rng.randint(0, 40, 5000).astype(np.uint8).tobytes(),   # quality-like
    rng.randint(0, 4, 3000).astype(np.uint8).tobytes(),    # 4-base
    rng.randint(0, 256, 2000).astype(np.uint8).tobytes(),  # full alphabet
    rng.randint(0, 40, 100).astype(np.uint8).tobytes(),    # tiny
    bytes(500),                                            # constant-ish
    rng.randint(0, 40, 64).astype(np.uint8).tobytes(),     # sub-round
]
encs = [compress(d, 0x04) for d in cases]
for e, d in zip(encs, cases):
    assert uncompress(e) == d
out = decode_nx16_o0_batch(encs, interpret=True)
assert all(o == d for o, d in zip(out, cases)), \
    [i for i, (o, d) in enumerate(zip(out, cases)) if o != d]
print("OK", len(cases))
''')
    assert "OK" in out


def test_pack_tables_telescoping():
    out = clean_jax_run(r'''
import numpy as np
from htslib_tpu.ops.rans_pallas import pack_tables, TOTFREQ
rng = np.random.RandomState(1)
freqs = np.zeros((2, 256), np.int64)
freqs[0, :40] = 1
freqs[0, 0] = TOTFREQ - 39
freqs[1] = 16                     # uniform full alphabet
lo, dfc = pack_tables(freqs, 256)
# the masked telescoping sum must recover (f-1)|c<<12|sym<<24 exactly
for b in range(2):
    cum = np.zeros(257, np.int64)
    np.cumsum(freqs[b], out=cum[1:])
    for m in rng.randint(0, TOTFREQ, 200):
        e = int(np.where(m >= lo[:, b],
                         dfc[:, b].astype(np.int64), 0).sum()) & 0xFFFFFFFF
        sym = e >> 24
        f = (e & 0xFFF) + 1
        c = (e >> 12) & 0xFFF
        want = int(np.searchsorted(cum, m, "right")) - 1
        assert sym == want and f == freqs[b][sym] and c == cum[sym], \
            (b, m, sym, want)
print("OK")
''')
    assert "OK" in out


def test_huffman_resolve_interpret():
    """Canonical-Huffman gatherless resolve: dependent chain matches
    the numpy model (interpret mode)."""
    out = clean_jax_run(r'''
import numpy as np
from jax.experimental.pallas import tpu as pltpu
from htslib_tpu.ops.huffman_pallas import make_huffman_resolve_bench
fn, args, ref_step, v0 = make_huffman_resolve_bench(L=128, rounds=8,
                                                    unroll=4)
v = v0[0].copy()
for _ in range(8):
    v, sym = ref_step(v)
with pltpu.force_tpu_interpret_mode():
    r = fn(*args)
assert np.array_equal(np.asarray(r)[0], v)
print("OK")
''')
    assert "OK" in out
