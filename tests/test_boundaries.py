"""Edge-condition goldens: BAM records split across BGZF blocks
(test.pl:840-870), headerless-@SQ BAMs (test.pl:948-960), >2 Gbase
positions with CSI queries (test.pl:963-985), and huge CIGARs."""
import os

import pytest

from htslib_tpu.bgzf import BGZFWriter
from htslib_tpu.sam import BamReader, SamReader
from htslib_tpu.sam.indexing import build_sam_gz_index, sam_gz_fetch
from tests.conftest import REF_TEST, has_ref, ref_path


def norm(line):
    f = line.split("\t")
    if int(f[1]) & 4:
        f[4] = "0"
        f[5] = "*"
    return "\t".join(f[:11] + sorted(f[11:]))


@pytest.mark.parametrize("n", [1, 2, 3])
def test_bgzf_boundaries_bam(n):
    # records deliberately split between BGZF blocks decode to ce#1.sam
    path = os.path.join(REF_TEST, "bgzf_boundaries",
                        f"bgzf_boundaries{n}.bam")
    if not os.path.exists(path):
        pytest.skip("no corpus")
    with BamReader(path) as r:
        got = [norm(rec.to_sam(r.header)) for rec in r]
    with SamReader(ref_path("ce#1.sam")) as r2:
        want = [norm(rec.to_sam(r2.header)) for rec in r2]
    assert got == want


def test_large_record_spanning_blocks(tmp_path):
    # 16000-op CIGAR + 32kb seq: boundaries hit inside CIGAR and SEQ
    from htslib_tpu.sam import BamWriter, SamHeader
    from htslib_tpu.sam.record import BamRecord
    hdr = SamHeader("@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:ref\tLN:100000\n")
    line = ("read\t0\tref\t1\t60\t" + "1M1I" * 16000 + "\t*\t0\t0\t"
            + "A" * 32000 + "\t" + "Q" * 32000)
    rec = BamRecord.from_sam(line, hdr)
    p = str(tmp_path / "big.bam")
    w = BamWriter(p, hdr, level=0)
    w.write(rec)
    w.close()
    with BamReader(p) as r:
        back = [x.to_sam(r.header) for x in r]
    assert back == [line]


def test_no_hdr_sq_bam():
    # @SQ lines absent from text header: binary ref list supplies the
    # name<->tid mapping (sam_hdr_fill_hrecs from binary refs)
    if not has_ref("no_hdr_sq_1.bam"):
        pytest.skip("no corpus")
    with BamReader(ref_path("no_hdr_sq_1.bam")) as r:
        hdr = r.header
        got = [norm(rec.to_sam(hdr)) for rec in r]
        assert hdr.name2tid("CHROMOSOME_I") == 0
    with SamReader(ref_path("no_hdr_sq_1.expected.sam")) as r2:
        want = [norm(rec.to_sam(r2.header)) for rec in r2]
    assert got == want


def test_longref_roundtrip_and_query(tmp_path):
    # >2 Gbase positions: SAM <-> sam.gz round-trip and CSI region query
    src = os.path.join(REF_TEST, "longrefs", "longref.sam")
    if not os.path.exists(src):
        pytest.skip("no corpus")
    with SamReader(src) as r:
        hdr = r.header
        recs = list(r)
    assert max(rec.pos for rec in recs) > (1 << 31)  # really 64-bit
    # round-trip through bgzf text
    gz = str(tmp_path / "longref.sam.gz")
    w = BGZFWriter(gz)
    body = open(src, "rb").read()
    w.write(body)
    w.close()
    with SamReader(gz) as r2:
        back = [rec.to_sam(r2.header) for rec in r2]
    assert back == [rec.to_sam(hdr) for rec in recs]
    # CSI (min_shift 14, depth auto-raised for the 10Gb reference) +
    # region query vs longref_itr.expected.sam
    idx = build_sam_gz_index(gz, min_shift=14)
    assert idx.n_lvls > 5  # hts_adjust_csi_settings engaged
    tid = hdr.name2tid("CHROMOSOME_I")
    got = [rec.to_sam(hdr) for rec in
           sam_gz_fetch(gz, idx, hdr, tid, 9999999999, 10000000003)]
    want = [l.rstrip("\n") for l in
            open(os.path.join(REF_TEST, "longrefs",
                              "longref_itr.expected.sam"))
            if not l.startswith("@")]
    assert got == want


def test_bgzf_boundary_bams_match_ce1():
    """BAM records deliberately split across BGZF block boundaries
    (test.pl:840): all three fixture BAMs decode to ce#1.sam."""
    from htslib_tpu.sam.batch import bam_file_to_sam

    want = [l for l in open(ref_path("ce#1.sam")).read().splitlines()
            if l and not l.startswith("@")]
    for i in (1, 2, 3):
        f = os.path.join(REF_TEST, "bgzf_boundaries",
                         f"bgzf_boundaries{i}.bam")
        hdr, sam = bam_file_to_sam(f)
        got = [l for l in sam.tobytes().decode().splitlines()]
        assert got == want, f


def test_large_record_spanning_blocks(tmp_path):
    """A 32 kb alignment whose CIGAR and sequence straddle several
    BGZF blocks (test.pl:855 large_rec), uncompressed (-l 0) write
    then read back."""
    from htslib_tpu.sam.batch import bam_file_to_sam, sam_to_bam_file
    from htslib_tpu.sam import SamHeader

    hdr = SamHeader("@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:ref\tLN:100000\n")
    line = ("read\t0\tref\t1\t60\t" + "1M1I" * 16000 + "\t*\t0\t0\t"
            + "A" * 32000 + "\t" + "Q" * 32000)
    body = (line + "\n").encode()
    out = str(tmp_path / "large.bam")
    sam_to_bam_file(body, hdr, out, level=0)
    h2, sam = bam_file_to_sam(out)
    assert sam.tobytes() == body
