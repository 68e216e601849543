"""Chained device BAM->SAM pipeline (ops/bam2sam.py): device BGZF
inflate feeding device record scan + unpack + nibble2base + itoa + line
assembly, byte-exact vs the record-path formatter on corpus files."""
import pytest

from conftest import REF_TEST, clean_jax_run

_CODE_TPL = r"""
import struct
from htslib_tpu.sam import SamReader
from htslib_tpu.ops.bam2sam import bam_payload_to_sam_device
for src in %(srcs)r:
    with SamReader("%(ref)s/" + src) as sr:
        recs = list(sr)
        hdr = sr.header
    payload = b"".join(struct.pack("<I", len(r.to_bam_buffer()))
                       + r.to_bam_buffer() for r in recs)
    want = ("\n".join(r.to_sam(hdr).rstrip("\n") for r in recs)
            + "\n").encode()
    got = bam_payload_to_sam_device(payload, hdr)
    assert got == want, src
print("B2S_OK")
"""

_CHAIN_CODE = r"""
import struct
from htslib_tpu.sam import BamReader, BamWriter, SamReader
from htslib_tpu.bgzf import scan_blocks
from htslib_tpu.ops.inflate import inflate_batch
from htslib_tpu.ops.bam2sam import bam_payload_to_sam_device
import tempfile, os

src = "%(ref)s/ce#1000.sam"
tmp = tempfile.mkdtemp()
bam = os.path.join(tmp, "c.bam")
with SamReader(src) as sr:
    recs = list(sr)
    hdr = sr.header
with BamWriter(bam, hdr) as w:
    for r in recs:
        w.write(r)

# stage 1: DEVICE BGZF inflate of every block
raw = open(bam, "rb").read()
bt = scan_blocks(raw)
payloads, isizes = [], []
for co, cs, us in zip(bt.coffsets, bt.csizes, bt.usizes):
    blk = raw[co:co + cs]
    xlen = int.from_bytes(blk[10:12], "little")
    payloads.append(blk[12 + xlen:cs - 8])
    isizes.append(us)
keep = [i for i, s in enumerate(isizes) if s > 0]
parts = inflate_batch([payloads[i] for i in keep],
                      [isizes[i] for i in keep])
u = b"".join(parts)
# skip the BAM header to the record stream
with BamReader(bam) as br:
    u_skip = br.fp.utell()

# stage 2: DEVICE record scan + unpack + format
got = bam_payload_to_sam_device(u[u_skip:], hdr)
want = ("\n".join(r.to_sam(hdr).rstrip("\n") for r in recs)
        + "\n").encode()
assert got == want
print("CHAIN_OK")
"""


@pytest.mark.slow
def test_device_bam2sam_corpus():
    srcs = ["ce#1.sam", "ce#1000.sam", "ce#unmap2.sam", "ce#supp.sam",
            "ce#5b.sam"]
    out = clean_jax_run(_CODE_TPL % {"srcs": srcs, "ref": REF_TEST})
    assert "B2S_OK" in out


@pytest.mark.slow
def test_device_inflate_to_sam_chain():
    out = clean_jax_run(_CHAIN_CODE % {"ref": REF_TEST})
    assert "CHAIN_OK" in out
