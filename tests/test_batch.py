"""Batch (columnar) BAM decode + vectorised SAM formatting must be
byte-identical to the record-at-a-time path on the whole corpus."""
import glob
import os

import numpy as np
import pytest

from htslib_tpu.sam import BamReader, BamWriter, SamReader
from htslib_tpu.sam.batch import (sam_text_to_bam, bam_stream_to_sam, bam_to_sam_bytes, decode_bam_columns,
                                  format_sam_batch, dec_len, write_ints,
                                  ragged_gather, ragged_indices)
from tests.conftest import REF_TEST, ref_path, has_ref

CORPUS = sorted(
    os.path.basename(p) for p in glob.glob(os.path.join(REF_TEST, "*.sam"))
) if os.path.isdir(REF_TEST) else []


def test_dec_len_and_write_ints():
    vals = np.array([0, 1, 9, 10, 99, 100, -1, -10, 12345678901234,
                     -2147483648, 2147483647, 65535], np.int64)
    want = [str(v) for v in vals]
    lens = dec_len(vals)
    assert list(lens) == [len(w) for w in want]
    total = int(lens.sum())
    ends = np.cumsum(lens)
    out = np.zeros(total, np.uint8)
    write_ints(out, ends, vals)
    assert out.tobytes().decode() == "".join(want)


def test_ragged_helpers():
    lens = np.array([3, 0, 2], np.int64)
    seg, intra = ragged_indices(lens)
    assert list(seg) == [0, 0, 0, 2, 2]
    assert list(intra) == [0, 1, 2, 0, 1]
    data = np.frombuffer(b"abcdefgh", np.uint8)
    flat, _, _ = ragged_gather(data, np.array([1, 0, 5]), lens)
    assert flat.tobytes() == b"bcdfg"


def batch_vs_records(bam_path):
    with BamReader(bam_path) as r:
        hdr = r.header
        want = "".join(rec.to_sam(hdr) + "\n" for rec in r).encode()
    with BamReader(bam_path) as r:
        data, offs, sizes = r.raw_records()
        got = bam_to_sam_bytes(data, offs, sizes, r.header)
    return want, got


@pytest.mark.skipif(not has_ref("range.bam"), reason="no corpus")
def test_batch_range_bam():
    want, got = batch_vs_records(ref_path("range.bam"))
    assert got == want


@pytest.mark.skipif(not has_ref("colons.bam"), reason="no corpus")
def test_batch_colons_bam():
    want, got = batch_vs_records(ref_path("colons.bam"))
    assert got == want


@pytest.mark.parametrize("fname", CORPUS or ["skip"])
def test_batch_all_corpus_sams(fname, tmp_path):
    if fname == "skip":
        pytest.skip("no corpus")
    bam_path = str(tmp_path / "t.bam")
    with SamReader(ref_path(fname)) as r:
        hdr = r.header
        with BamWriter(bam_path, hdr) as w:
            for rec in r:
                w.write(rec)
    want, got = batch_vs_records(bam_path)
    assert got == want, f"batch mismatch for {fname}"


# ---------------------------------------------------------------------------
# sam_text_to_bam (native sam_parse_worker equivalent, sam.c:3215)

SAM_PARSE_CASES = ["ce#1000.sam", "index_dos.sam", "xx#large_aux.sam",
                   "auxf#values.sam", "sam_alignment.tmp.sam"]


@pytest.mark.parametrize("fname", SAM_PARSE_CASES)
def test_sam_text_to_bam_matches_record_path(fname):
    import struct as _struct
    if not has_ref(fname):
        pytest.skip("missing")
    path = ref_path(fname)
    with SamReader(path) as r:
        hdr = r.header
        want = b"".join(_struct.pack("<I", len(b)) + b
                        for b in (rec.to_bam_buffer() for rec in r))
    got = sam_text_to_bam(open(path, "rb").read(), hdr)
    assert got.tobytes() == want


def test_sam_text_to_bam_roundtrip_through_formatter():
    path = ref_path("ce#1000.sam")
    if not has_ref("ce#1000.sam"):
        pytest.skip("missing")
    with SamReader(path) as r:
        hdr = r.header
    body = b"".join(l + b"\n" for l in open(path, "rb").read().split(b"\n")
                    if l and not l.startswith(b"@"))
    stream = sam_text_to_bam(body, hdr)
    back = bam_stream_to_sam(np.asarray(stream), hdr)
    assert back.tobytes() == body


def test_sam_text_to_bam_rejects_garbage():
    from htslib_tpu.sam import SamHeader
    hdr = SamHeader("@SQ\tSN:c1\tLN:100\n")
    with pytest.raises((IOError, ValueError)):
        sam_text_to_bam(b"r1\tnot_a_flag\tc1\t1\t0\t*\t*\t0\t0\t*\t*\n", hdr)
    with pytest.raises((IOError, ValueError)):
        # SEQ/QUAL length mismatch (sam_parse1 errors)
        sam_text_to_bam(b"r1\t0\tc1\t1\t0\t4M\t*\t0\t0\tACGT\t##\n", hdr)


BAM_CORPUS = sorted(
    os.path.basename(p) for p in glob.glob(os.path.join(REF_TEST, "*.bam"))
    if not p.endswith((".bai", ".csi"))
) if os.path.isdir(REF_TEST) else []


@pytest.mark.parametrize("fname", BAM_CORPUS or ["skip"])
def test_fused_bgzf_to_sam_matches_staged(fname):
    """The single-call fused native pipeline (inflate + scan + format
    overlapped, htstpu_bgzf_to_sam) must be byte-identical to the staged
    path on every corpus BAM."""
    if fname == "skip":
        pytest.skip("no corpus")
    from htslib_tpu.sam.batch import bam_file_to_sam
    path = ref_path(fname)
    try:
        with BamReader(path) as r:
            hdr = r.header
            staged = bam_stream_to_sam(r.fp.read_all(), hdr)
    except IOError:
        pytest.skip(f"{fname} is not a plain readable BAM")
    hdr2, fused = bam_file_to_sam(path)
    assert hdr2.text == hdr.text
    assert bytes(fused) == bytes(staged)


def test_wide_team_spec_scan_byte_identical(tmp_path):
    """With a wide thread team the native pipelines switch to a
    speculative parallel record-boundary scan (segment sync + chain
    validation + verified stitch).  Output must be byte-identical to the
    narrow-team serial-scanner path on the same input."""
    from htslib_tpu.native import native
    if native is None:
        pytest.skip("native library unavailable")
    import struct as _struct
    from htslib_tpu.sam import SamHeader
    from htslib_tpu.sam.record import BamRecord

    hdr = SamHeader("@HD\tVN:1.6\tSO:coordinate\n"
                    "@SQ\tSN:chr1\tLN:249250621\n"
                    "@SQ\tSN:a_rather_long_reference_name_to_stress_bounds\tLN:500\n")
    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", np.uint8)
    path = str(tmp_path / "wide.bam")
    w = BamWriter(path, hdr, level=1)
    payload = []
    pos = 100
    for i in range(2000):
        # vary record sizes (incl. tiny unmapped + long reads) so segment
        # boundaries land everywhere
        rl = int(rng.integers(1, 400))
        seq = bases[rng.integers(0, 4, rl)].tobytes().decode()
        qual = "".join(chr(33 + int(q)) for q in rng.integers(0, 40, rl))
        pos += int(rng.integers(0, 30))
        if i % 97 == 0:
            line = f"u{i}\t4\t*\t0\t0\t*\t*\t0\t0\t*\t*"
        else:
            line = (f"r{i}\t0\tchr1\t{pos}\t60\t{rl}M\t*\t0\t0\t{seq}\t{qual}"
                    f"\tNM:i:0\tXB:B:c,-128,127,0")
        rec = BamRecord.from_sam(line, hdr)
        buf = rec.to_bam_buffer()
        payload.append(_struct.pack("<I", len(buf)) + buf)
    blob = b"".join(payload)
    for _ in range(40):  # ~enough blocks for nthreads=8 phase mode
        w.fp.write(blob)
    w.close()

    raw = np.fromfile(path, np.uint8)
    with BamReader(path) as r:
        u_skip = r.fp.tell_uncompressed() if hasattr(r.fp, "tell_uncompressed") else None
    if u_skip is None:
        # compute header size from the uncompressed stream directly
        from htslib_tpu.bgzf import BGZFReader
        with BGZFReader(path) as bf:
            head = bf.read(1 << 16)
        ltext = int.from_bytes(head[4:8], "little")
        p = 8 + ltext
        nref = int.from_bytes(head[p:p + 4], "little")
        p += 4
        for _ in range(nref):
            ln = int.from_bytes(head[p:p + 4], "little")
            p += 4 + ln + 4
        u_skip = p
    narrow = native.bgzf_to_sam(raw, u_skip, hdr.ref_names, nthreads=2)
    wide = native.bgzf_to_sam(raw, u_skip, hdr.ref_names, nthreads=8)
    assert bytes(narrow) == bytes(wide)

    # and the pre-inflated entry point's wide path (>16MB trigger)
    from htslib_tpu.bgzf import BGZFReader
    with BGZFReader(path) as bf:
        udata = np.frombuffer(bf.read(), np.uint8)
    if len(udata) - u_skip > (16 << 20):
        nw = native.bam_scan_format(udata, u_skip, hdr.ref_names, nthreads=2)
        wd = native.bam_scan_format(udata, u_skip, hdr.ref_names, nthreads=8)
        assert bytes(nw) == bytes(wd)


def test_sam_to_bam_file_roundtrip(tmp_path):
    """Fused SAM->BAM pipeline (parse workers + batch deflate + ordered
    writer) round-trips byte-exactly through the batch formatter."""
    from htslib_tpu.sam.batch import bam_file_to_sam, sam_to_bam_file
    from htslib_tpu.sam import BamWriter, SamReader
    src = os.path.join(REF_TEST, "ce#1000.sam")
    bam = str(tmp_path / "a.bam")
    with SamReader(src) as sr:
        hdr = sr.header
        recs = list(sr)
    with BamWriter(bam, hdr) as w:
        for r in recs:
            w.write(r)
    h, sam = bam_file_to_sam(bam)
    out = str(tmp_path / "b.bam")
    sam_to_bam_file(sam.tobytes(), h, out)
    h2, sam2 = bam_file_to_sam(out)
    assert sam2.tobytes() == sam.tobytes()
