"""CRAM 3.1 codec wire-vector fixtures + differential fuzz (VERDICT r2
task #7 — de-circularise the 3.1 evidence as far as this sandbox
allows).

The sandbox has no authentic htscodecs artifacts for the 3.1 codecs
(the reference snapshot's htscodecs submodule is empty and all corpus
CRAMs are v3.0), so the evidence here is:

  1. FROZEN byte-vector fixtures: committed hex literals (generated
     once on 2026-08-21, never re-derived at test time).  Both the C
     and the Python implementations must produce these exact streams
     and decode them back — so any regression or C/Python divergence
     on the wire format trips immediately.
  2. Randomised differential fuzz: fresh random inputs every run
     (seeded per-run from a fixed list) across every codec flag
     combination, asserting C==Python stream identity plus round trip.

rANS 4x8 remains the one codec with authentic-artifact validation
(test/range.cram, tests/test_interop_htslib.py)."""
import numpy as np
import pytest

from htslib_tpu.codecs import arith, fqzcomp, rans4x16, tok3

QUAL = (b'"$"!"!#%&%"(\'$(""!&$\'$%(#!%!!%"$((#($\'&\'%%"\'""!&("$$\'##$&%'
        b'!%&$"%$#$&(""$"%&%$!!"#"!$!(&$$#!\'&!#$')
TXT = b"The CRAM 3.1 codecs: rANS Nx16, range coder, FQZComp, name tok3!"

RANS_VECTORS = {
    0x00: "00602122060084558555830086028400832a822a8300bef48c0013f71500e2031c00162122004fd3330e8c1755a2fa6e279fc935bd4eb4552ef7911c3a4a82398d917d40ab62",
    0x01: "0160812500212206002223002800900088008800212206008449844984498224867084498224822421220327280000893a8552817087438361817081702122032800870e834783478a568347834721220600840084008400840082008400860084002122002425012800852a8802852a825588008255212425002728000083478a568a55834783472223030084498449891384498912222301262701008c0084008400840084008400edb2cf01310b00411b0ef50021a50000ca5d0122f153acc841a80ba9203cf1fb906ff48391071ff1f3e5",
    0x04: "04602122060084558555830086028400832a822a83005744a000fad82e018013a00087915f017583a100e6a00a0106d62101886b24014a5cd900045b0201a0449900fcef4f02bf5dce009e796500e35ff70039839900dda3410100626d0008dcac007e484b002cde7f02c0a830018aab99013cff96003c8610011ac024018f8ab9005130790110c23c012acb8f00d642aa0086397100",
    0x05: "0560811800212206002122060086008800830085008400820082008200212206008274856882748274886082748274827421220327280000891584498224891282248224822421242500280086338c678633863321220600822484498449822482248449867084492122002425012800840084008800840088008400242800952b8a5522230300852a852a852a852a8a5822230026008a568a558a5566243100cd013200a1176d001c9cc301a16e5501b0952f00af5d3800622a6c019b17620020516c0043e33100a97f7a0077b92c00009e83013475a800eb464d007c2f550091e859007e285e00640b7600101d5400753c7000250a4500e0d4310050747200402be0009a52ce00ac054d0073a15a005b5a3b01384158007ec14700",
    0x40: "406010012200000000010000010000010000005d2122060084688468830c861c841083388234830c81520b008e66010046f345009d110b0060d1a5fccb6e52afcd22bd7fdc6e871d6f78d5f4ad7cefea5018a0d038d19483",
    0x09: "096004666666641154002122060022230028009000880088002428009000900022242627000088008800880088002100a00023252600280088008800880088002200a00024262700008a568a558a552226009000900024270090009000ecc2870100382000cc7e2601000482001154002122032728000021220024250000880088008800880022242500008800880090002328009000900021220025008a568a558a55212300952b8a55212200242800863386338c6786332500a0002327009000900040985a00bff2c90038d51401b9cecf011154002122042800222425010088008800880088002122012600880088008800880021232400280086338c678633863321220026008a568a558a5522230000900090002200a00021220025009000880088002600a000c2133301c5182d012627e301008c090211520021220024250300212425000090008800880024250000900090002400a000242500272800008a57852a852a8a5522252600280088008800880088002400a00024262700008a568a558a5522270090009000b336310060e36e0073094a023c0ca501",
}
ARITH_VECTORS = {
    0: "00407900b39580e13e9dc0228421f1d44a8f537354cc76965dc1670e2835e0cd33f93c7d90d60846b51c34f23fb1fb24bbdf87597f8a48ed43f3b86500",
    1: "01407900b38d5610379b21211b317bdcb8fe261a0e15677f0b5c05cfc646a002cec1bf18dd3f43d27e63d9c0af6516c91ea5ea1478148cba6a1f7200",
}
FQZ_VECTOR = ("60050000007408d60fcd2122232425262728010102040810204080ff01ffff02"
              "01010204081020c0001fffffe0264822d6fc0c1190d41e91feec4d4b82eb2223"
              "8a89cd8f2f191ab5adcd5fcdb22efb7ebe201489c29d4aed2dc0d08da9")
TOK3_NAMES = [b"I17_08765:2:123:61541:01763#9",
              b"I17_08765:2:123:61542:01764#9",
              b"I17_08765:2:124:61542:01765#9"]
TOK3_VECTOR = ("5a030000000520030909090100052003070101010104200249000200052003040101020306200411000000030005200306010103020320015f040005200305010104030620043d220000040403200105050005200306010105020320013a0600052003040101060306200402000000070005200306010107020320013a080005200304010208030620047b000000080503200101090005200306010109020320013a0a000520030402010a0306200465f000000a05032001010b000520030601010b020320013a0c000520030503030c03062004e30600000c04032001050c0504200201010d000520030601010d02032001230e000520030401010e03062004090000000f00052003000000")


def _native():
    from htslib_tpu.native import native
    if native is None:
        pytest.skip("native library unavailable")
    return native


# ---------------------------------------------------------------------------
# frozen vectors: both implementations must hit them exactly
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("flags", sorted(RANS_VECTORS))
def test_rans4x16_frozen_vectors(flags):
    want = bytes.fromhex(RANS_VECTORS[flags])
    assert rans4x16.compress(QUAL, flags) == want
    assert rans4x16.uncompress(want) == QUAL
    nat = _native()
    assert nat.rans4x16_compress(QUAL, flags) == want
    assert nat.rans4x16_uncompress(want) == QUAL


@pytest.mark.parametrize("order", sorted(ARITH_VECTORS))
def test_arith_frozen_vectors(order):
    want = bytes.fromhex(ARITH_VECTORS[order])
    assert arith.compress(TXT, order) == want
    assert arith.uncompress(want) == TXT
    nat = _native()
    assert nat.arith_compress(TXT, order) == want
    assert nat.arith_uncompress(want) == TXT


def test_fqz_frozen_vector():
    want = bytes.fromhex(FQZ_VECTOR)
    assert fqzcomp.compress(QUAL, [32, 32, 32]) == want
    assert fqzcomp.decompress(want) == QUAL
    nat = _native()
    assert nat.fqz_compress(QUAL, [32, 32, 32]) == want
    assert nat.fqz_decompress(want) == QUAL


def test_tok3_frozen_vector():
    want = bytes.fromhex(TOK3_VECTOR)
    blk = b"".join(n + b"\0" for n in TOK3_NAMES)
    assert tok3.encode_names(TOK3_NAMES, 0) == want
    assert tok3.decode_names(want) == blk
    nat = _native()
    assert nat.tok3_encode(blk, 0) == want
    assert nat.tok3_decode(want) == blk


# ---------------------------------------------------------------------------
# randomised differential fuzz: fresh inputs per seed, every flag combo
# ---------------------------------------------------------------------------

RANS_FLAGS = [0x00, 0x01, 0x04, 0x05, 0x40, 0x41, 0x80, 0x81, 0xC0, 0xC1,
              0x08, 0x09, 0x44, 0x45, 0x20]
ARITH_ORDERS = [0, 1, 0x40, 0x41, 0x80, 0x81, 0x08, 0x09]


def _inputs(rng):
    return [
        bytes(rng.integers(0, 256, rng.integers(1, 4000),
                           dtype=np.uint8)),          # full alphabet
        bytes(rng.integers(33, 74, rng.integers(1, 4000),
                           dtype=np.uint8)),          # quality-like
        bytes(rng.choice([65, 67, 71, 84, 78],
                         rng.integers(1, 4000)).astype(np.uint8)),
        bytes(np.repeat(rng.integers(0, 4, 40, dtype=np.uint8),
                        rng.integers(1, 99))),        # runs (RLE path)
        bytes(rng.integers(0, 2, rng.integers(1, 1000),
                           dtype=np.uint8)),          # 1-bit (PACK path)
    ]


@pytest.mark.parametrize("seed", [11, 22, 33])
def test_rans4x16_differential_fuzz(seed):
    nat = _native()
    rng = np.random.default_rng(seed)
    for data in _inputs(rng):
        for flags in RANS_FLAGS:
            c = nat.rans4x16_compress(data, flags)
            p = rans4x16.compress(data, flags)
            assert c == p, (seed, flags, len(data))
            assert rans4x16.uncompress(c) == data
            assert nat.rans4x16_uncompress(p) == data


@pytest.mark.parametrize("seed", [44, 55])
def test_arith_differential_fuzz(seed):
    nat = _native()
    rng = np.random.default_rng(seed)
    for data in _inputs(rng):
        for order in ARITH_ORDERS:
            c = nat.arith_compress(data, order)
            p = arith.compress(data, order)
            assert c == p, (seed, order, len(data))
            assert arith.uncompress(c) == data
            assert nat.arith_uncompress(p) == data


@pytest.mark.parametrize("seed", [66, 77])
def test_fqz_differential_fuzz(seed):
    nat = _native()
    rng = np.random.default_rng(seed)
    for rlen in (60, 151):
        n = rlen * int(rng.integers(5, 40))
        walk = np.clip(np.cumsum(rng.integers(-3, 4, n)) + 37,
                       0, 50).astype(np.uint8) + 33
        data = bytes(walk)
        lens = [rlen] * (n // rlen)
        c = nat.fqz_compress(data, lens)
        p = fqzcomp.compress(data, lens)
        assert c == p, (seed, rlen)
        assert fqzcomp.decompress(c) == data
        assert nat.fqz_decompress(p) == data


@pytest.mark.parametrize("seed", [88, 99])
def test_tok3_differential_fuzz(seed):
    nat = _native()
    rng = np.random.default_rng(seed)
    names = []
    run = int(rng.integers(50, 400))
    for i in range(run):
        names.append(
            f"M{int(rng.integers(0, 9))}:{1200 + i}:"
            f"{int(rng.integers(0, 99999)):05d}:"
            f"{int(rng.integers(0, 9999))}#{int(rng.integers(0, 9))}"
            .encode())
    names += [b"x", b"", b"000", b"99999999999999"]
    blk = b"".join(n + b"\0" for n in names)
    for ua in (0, 1):
        c = nat.tok3_encode(blk, ua)
        p = tok3.encode_names(names, ua)
        assert c == p, (seed, ua)
        assert tok3.decode_names(c) == blk
        assert nat.tok3_decode(p) == blk
