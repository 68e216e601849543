""".crai building: from an existing CRAM (cram_index_build,
cram_index.c:779) and on the fly while writing (cram_index_slice,
cram_index.c:695).  Validated against the reference's own prebuilt
range.cram.crai and by indexed-fetch equivalence."""
import os

import pytest

from htslib_tpu.cram import CramReader, CramWriter
from htslib_tpu.cram.index import CramIndex, build_crai
from htslib_tpu.sam import BamReader
from tests.conftest import has_ref, ref_path


@pytest.mark.skipif(not has_ref("range.cram"), reason="no corpus")
def test_build_crai_matches_reference_index(tmp_path):
    out = str(tmp_path / "range.crai")
    idx = build_crai(ref_path("range.cram"), out, ref=ref_path("ce.fa"))
    want = CramIndex.load(ref_path("range.cram.crai"))
    got = CramIndex.load(out)
    as_rows = lambda ix: [(e.refid, e.start, e.span, e.offset, e.slice_off,
                           e.slice_len) for e in ix.entries]
    assert as_rows(got) == as_rows(want)


@pytest.mark.skipif(not has_ref("range.bam"), reason="no corpus")
def test_on_the_fly_crai_matches_rebuild(tmp_path):
    with BamReader(ref_path("range.bam")) as r:
        hdr = r.header
        recs = list(r)
    cram = str(tmp_path / "t.cram")
    with CramWriter(cram, hdr, ref=ref_path("ce.fa"), write_index=True) as w:
        for rec in recs:
            w.write(rec)
    assert os.path.exists(cram + ".crai")
    otf = CramIndex.load(cram + ".crai")
    rebuilt = build_crai(cram, str(tmp_path / "rebuilt.crai"),
                         ref=ref_path("ce.fa"))
    rows = lambda ix: [(e.refid, e.start, e.span, e.offset, e.slice_off,
                        e.slice_len) for e in ix.entries]
    assert rows(otf) == rows(rebuilt)

    # indexed fetch through the on-the-fly index equals a full-scan filter
    with CramReader(cram, ref=ref_path("ce.fa")) as r2:
        r2.load_index(cram + ".crai")
        got = [rec.to_sam(hdr) for rec in r2.fetch(0, 900, 1500)]
    want = [rec.to_sam(hdr) for rec in recs
            if rec.tid == 0 and rec.pos < 1500 and rec.endpos() > 900]
    assert got == want


@pytest.mark.skipif(not has_ref("range.bam"), reason="no corpus")
def test_on_the_fly_crai_multiref_and_v4(tmp_path):
    with BamReader(ref_path("range.bam")) as r:
        hdr = r.header
        recs = list(r)
    # one big multi-ref slice + CRAM 4.0 framing
    cram = str(tmp_path / "t4.cram")
    with CramWriter(cram, hdr, version=(4, 0), write_index=True) as w:
        for rec in recs:
            w.write(rec)
    idx = CramIndex.load(cram + ".crai")
    tids = sorted({e.refid for e in idx.entries})
    assert tids == sorted({rec.tid for rec in recs})
    with CramReader(cram) as r2:
        r2.load_index(cram + ".crai")
        got = [rec.to_sam(hdr) for rec in r2.fetch(1, 1000, 3100)]
    want = [rec.to_sam(hdr) for rec in recs
            if rec.tid == 1 and rec.pos < 3100 and rec.endpos() > 1000]
    assert got == want
