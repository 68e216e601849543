"""CRAM encode round-trip tests: decode(encode(x)) == x over the corpus
(test/cross_validate.sh contract).

Normalisations applied on both sides, matching reference behavior:
  * unmapped reads lose MAPQ/CIGAR (compare_sam.pl:107)
  * =/X CIGAR ops degrade to M in no-ref encoding (as in the reference's
    no_ref mode) and zero-length ops are unrepresentable in the CRAM
    feature stream
"""
import glob
import os
import re

import pytest

from htslib_tpu.cram import CramReader, CramWriter
from htslib_tpu.sam import BamReader, SamReader
from tests.conftest import REF_TEST, ref_path, has_ref

CORPUS = sorted(
    os.path.basename(p) for p in glob.glob(os.path.join(REF_TEST, "*.sam"))
) if os.path.isdir(REF_TEST) else []


def norm(line):
    f = line.split("\t")
    if int(f[1]) & 4:
        f[4] = "0"
        f[5] = "*"
    # =/X degrade to M; zero-length ops are unrepresentable; adjacent
    # same-op runs merge in the CRAM feature stream (all as in the
    # reference decoder)
    f[5] = re.sub(r"(\d+)[=X]", r"\1M", f[5])
    f[5] = re.sub(r"(?<![0-9])0[MIDNSHP]", "", f[5]) or "*"
    if f[5] != "*":
        ops = re.findall(r"(\d+)([MIDNSHP])", f[5])
        merged = []
        for n, op in ops:
            if merged and merged[-1][1] == op:
                merged[-1][0] += int(n)
            else:
                merged.append([int(n), op])
        f[5] = "".join(f"{n}{op}" for n, op in merged) or "*"
    return "\t".join(f)


@pytest.mark.parametrize("fname", CORPUS or ["skip"])
def test_cram_encode_roundtrip(fname, tmp_path):
    if fname == "skip":
        pytest.skip("no corpus")
    with SamReader(ref_path(fname)) as r:
        hdr = r.header
        recs = list(r)
    cram = str(tmp_path / "t.cram")
    with CramWriter(cram, hdr) as w:
        for rec in recs:
            w.write(rec)
    with CramReader(cram) as r2:
        got = [norm(rec.to_sam(hdr)) for rec in r2]
    want = [norm(rec.to_sam(hdr)) for rec in recs]
    assert got == want, f"CRAM round-trip mismatch for {fname}"


@pytest.mark.skipif(not has_ref("range.bam"), reason="no corpus")
def test_cram_encode_range_bam(tmp_path):
    with BamReader(ref_path("range.bam")) as r:
        hdr = r.header
        recs = list(r)
    cram = str(tmp_path / "range.cram")
    with CramWriter(cram, hdr) as w:
        for rec in recs:
            w.write(rec)
    with CramReader(cram) as r2:
        got = [norm(rec.to_sam(hdr)) for rec in r2]
    want = [norm(rec.to_sam(hdr)) for rec in recs]
    assert got == want


def test_multi_slice_container(tmp_path):
    # force multiple containers via small slices
    from htslib_tpu.cram.encode import CramEncoder
    with SamReader(ref_path("ce#1000.sam")) as r:
        hdr = r.header
        recs = list(r)
    cram = str(tmp_path / "multi.cram")
    enc = CramEncoder(cram, hdr, seqs_per_slice=100)
    for rec in recs:
        enc.write(rec)
    enc.close()
    with CramReader(cram) as r2:
        got = [rec.to_sam(hdr) for rec in r2]
    assert got == [rec.to_sam(hdr) for rec in recs]


REF_CASES = [f for f in CORPUS
             if os.path.exists(os.path.join(
                 REF_TEST, f.split("#")[0] + ".fa"))]


@pytest.mark.parametrize("fname", REF_CASES or ["skip"])
def test_cram_encode_roundtrip_with_reference(fname, tmp_path):
    # reference-based mode: implicit matches + substitution features
    if fname == "skip":
        pytest.skip("no corpus")
    fa = ref_path(fname.split("#")[0] + ".fa")
    with SamReader(ref_path(fname)) as r:
        hdr = r.header
        recs = list(r)
    cram = str(tmp_path / "t.cram")
    with CramWriter(cram, hdr, ref=fa) as w:
        for rec in recs:
            w.write(rec)
    with CramReader(cram, ref=fa, decode_md=False) as r2:
        got = [norm(rec.to_sam(hdr)) for rec in r2]
    want = [norm(rec.to_sam(hdr)) for rec in recs]
    assert got == want, f"ref-based CRAM round-trip mismatch for {fname}"


def test_ref_based_is_smaller_and_generates_md(tmp_path):
    # encoding with a reference should beat no-ref size on real data and
    # the decoder regenerates MD/NM from the reference
    from htslib_tpu.sam import BamReader
    if not has_ref("range.bam"):
        pytest.skip("no corpus")
    with BamReader(ref_path("range.bam")) as r:
        hdr = r.header
        recs = list(r)
    noref = str(tmp_path / "noref.cram")
    withref = str(tmp_path / "ref.cram")
    with CramWriter(noref, hdr) as w:
        for rec in recs:
            w.write(rec)
    with CramWriter(withref, hdr, ref=ref_path("ce.fa")) as w:
        for rec in recs:
            w.write(rec)
    assert os.path.getsize(withref) < os.path.getsize(noref)
    with CramReader(withref, ref=ref_path("ce.fa")) as r2:
        rec = r2.read1()
        assert rec.get_aux("MD") is not None
        assert rec.get_aux("NM") is not None


def test_embed_ref_decodes_without_fasta(tmp_path):
    # CRAM_OPT_EMBED_REF: the reference window travels inside each slice
    # (ref_base_id block), so decode needs no external reference at all
    from htslib_tpu.sam import BamReader
    if not has_ref("range.bam"):
        pytest.skip("no corpus")
    with BamReader(ref_path("range.bam")) as r:
        hdr = r.header
        recs = list(r)
    p = str(tmp_path / "e.cram")
    with CramWriter(p, hdr, ref=ref_path("ce.fa"), embed_ref=1) as w:
        for rec in recs:
            w.write(rec)
    with CramReader(p) as r2:  # no ref argument
        back = [rec.to_sam(hdr) for rec in r2]
    assert back == [rec.to_sam(hdr) for rec in recs]


def test_mate_linkage_roundtrip(tmp_path):
    # proper pairs are stored linked (CRAM_FLAG_MATE_DOWNSTREAM + NF)
    # and the decoder xref reconstructs mate fields/tlen exactly
    from htslib_tpu.cram.encode import CramEncoder
    from htslib_tpu.sam import SamHeader
    from htslib_tpu.sam.record import BamRecord
    hdr = SamHeader("@SQ\tSN:c1\tLN:10000\n")

    def mk(q, flag, pos, mpos, tlen):
        return BamRecord.from_sam(
            f"{q}\t{flag}\tc1\t{pos}\t60\t10M\t=\t{mpos}\t{tlen}\t"
            f"{'ACGTACGTAC'}\t{'I' * 10}", hdr)

    a = mk("p1", 99, 100, 300, 210)
    b = mk("p1", 147, 300, 100, -210)
    assert CramEncoder._mate_link_ok(a, b)
    # inconsistent stored mate info must force detached storage
    assert not CramEncoder._mate_link_ok(mk("p2", 99, 100, 999, 5),
                                         mk("p2", 147, 300, 100, -210))
    p = str(tmp_path / "t.cram")
    with CramWriter(p, hdr) as w:
        w.write(a)
        w.write(b)
    with CramReader(p) as r:
        back = [rec.to_sam(hdr) for rec in r]
    assert back == [a.to_sam(hdr), b.to_sam(hdr)]


def test_lossy_names(tmp_path):
    # CRAM_OPT_LOSSY_NAMES: linked pairs lose names (decoder synthesizes
    # consistent ones); every other field survives exactly
    from htslib_tpu.sam import BamReader
    if not has_ref("range.bam"):
        pytest.skip("no corpus")
    with BamReader(ref_path("range.bam")) as r:
        hdr, recs = r.header, list(r)
    p = str(tmp_path / "l.cram")
    with CramWriter(p, hdr, ref=ref_path("ce.fa"), lossy_names=1) as w:
        for rec in recs:
            w.write(rec)
    with CramReader(p, ref=ref_path("ce.fa"), decode_md=False) as r2:
        back = list(r2)

    def rest(l):
        return "\t".join(l.split("\t")[1:])

    assert [rest(a.to_sam(hdr)) for a in back] == \
        [rest(b.to_sam(hdr)) for b in recs]
    # smaller than the name-preserving encoding
    p2 = str(tmp_path / "full.cram")
    with CramWriter(p2, hdr, ref=ref_path("ce.fa")) as w:
        for rec in recs:
            w.write(rec)
    assert os.path.getsize(p) < os.path.getsize(p2)


def test_consensus_reference_no_fasta(tmp_path):
    # embed_ref=2: build a majority-vote consensus from the reads and
    # embed it (cram_generate_reference) — no fasta needed at either end
    from htslib_tpu.sam import BamReader
    if not has_ref("range.bam"):
        pytest.skip("no corpus")
    with BamReader(ref_path("range.bam")) as r:
        hdr, recs = r.header, list(r)
    p = str(tmp_path / "c.cram")
    with CramWriter(p, hdr, embed_ref=2) as w:
        for rec in recs:
            w.write(rec)
    with CramReader(p, decode_md=False) as r2:
        back = [rec.to_sam(hdr) for rec in r2]
    assert back == [rec.to_sam(hdr) for rec in recs]


def test_consensus_majority_vote():
    from htslib_tpu.cram.encode import _consensus_reference
    from htslib_tpu.sam import SamHeader
    from htslib_tpu.sam.record import BamRecord
    hdr = SamHeader("@SQ\tSN:c1\tLN:100\n")
    recs = [BamRecord.from_sam(f"r{i}\t0\tc1\t1\t60\t4M\t*\t0\t0\t"
                               f"{s}\tIIII", hdr)
            for i, s in enumerate(["ACGT", "ACGT", "ATGT"])]
    cons = _consensus_reference(recs, 1, 6)
    assert cons == b"ACGTNN"  # majority C at pos 2; no coverage -> N


@pytest.mark.skipif(not has_ref("range.bam"), reason="no corpus")
def test_multi_slice_containers(tmp_path):
    """CRAM_OPT_SLICES_PER_CONTAINER: several slices share one container
    and compression header (cram_encode_container, cram_encode.c:1843);
    landmarks address each slice and the crai indexes them."""
    from htslib_tpu.cram import CramReader
    from htslib_tpu.cram.index import CramIndex
    from htslib_tpu.cram.io import CramIO, read_file_definition
    from htslib_tpu.sam import BamReader
    with BamReader(ref_path("range.bam")) as r:
        hdr = r.header
        recs = list(r)
    for version in ((3, 0), (4, 0)):
        p = str(tmp_path / f"ms{version[0]}.cram")
        with CramWriter(p, hdr, ref=ref_path("ce.fa"), version=version,
                        write_index=True) as w:
            w._enc.seqs_per_slice = 20
            w._enc.slices_per_container = 3
            for rec in recs:
                w.write(rec)
        # container structure: first data container has 3 landmarks
        from htslib_tpu.hfile import hopen
        fp = hopen(p, "rb")
        read_file_definition(fp)
        io = CramIO(fp, version)
        hdr_cont = io.read_container_header()
        io.skip_container_data(hdr_cont)
        c = io.read_container_header()
        assert len(c.landmarks) == 3, c.landmarks
        fp.close()
        # decode equality
        with CramReader(p, ref=ref_path("ce.fa"), decode_md=False) as r2:
            got = [norm(rec.to_sam(hdr)) for rec in r2]
        assert got == [norm(rec.to_sam(hdr)) for rec in recs]
        # indexed fetch through the multi-slice crai
        idx = CramIndex.load(p + ".crai")
        assert len(idx.entries) >= len(recs) // 20
        with CramReader(p, ref=ref_path("ce.fa"), decode_md=False) as r3:
            r3.load_index(p + ".crai")
            sub = [rec.to_sam(hdr) for rec in r3.fetch(0, 900, 1500)]
        want = [rec.to_sam(hdr) for rec in recs
                if rec.tid == 0 and rec.pos < 1500 and rec.endpos() > 900]
        assert sub == want


def test_cram_profiles_matrix(tmp_path):
    """CRAM_OPT_PROFILE settings (cram_io.c:5915): every profile
    round-trips exactly, denser profiles do not grow the file, and the
    codec enables follow the reference (fast drops the tokeniser,
    small/archive enable bz2+fqz, archive adds arith)."""
    import os

    from htslib_tpu.cram import CramReader, CramWriter
    from htslib_tpu.sam import SamReader
    from tests.conftest import ref_path

    with SamReader(ref_path("ce#1000.sam")) as sr:
        recs = list(sr)
        hdr = sr.header
    want = [r.to_sam(hdr) for r in recs]
    sizes = {}
    for prof in ("fast", "normal", "small", "archive"):
        out = str(tmp_path / f"{prof}.cram")
        with CramWriter(out, hdr, ref=ref_path("ce.fa"),
                        version=(3, 1), profile=prof) as cw:
            enc = cw._enc
            if prof == "fast":
                assert not enc.use_tok and enc._level == 1
            if prof in ("small", "archive"):
                assert enc._use_bz2 and enc.use_fqz
            if prof == "archive":
                assert enc._use_arith
            for r in recs:
                cw.write(r)
        sizes[prof] = os.path.getsize(out)
        with CramReader(out, ref=ref_path("ce.fa")) as cr:
            got = [rec.to_sam(cr.header) for rec in cr]
        assert got == want, prof
    assert sizes["archive"] < sizes["small"] <= sizes["normal"] \
        < sizes["fast"]
