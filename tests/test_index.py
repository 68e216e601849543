"""Index build/load/query tests — modeled on reference test/test_index.c
and test.pl's region-query golden files (range.out/range.out2)."""
import os

import pytest

from htslib_tpu.index import (HTS_FMT_BAI, HtsIndex, parse_decimal,
                              parse_region, reg2bin, reg2bins,
                              HTS_PARSE_ONE_COORD, HTS_PARSE_LIST,
                              HTS_POS_MAX)
from htslib_tpu.sam import BamReader
from htslib_tpu.sam.indexing import (MultiRegionIterator, bam_fetch,
                                     build_bam_index, load_bam_index)
from tests.conftest import ref_path, has_ref

REGIONS1 = ["CHROMOSOME_II:2980-2980", "CHROMOSOME_IV:1500-1500",
            "CHROMOSOME_II:2980-2980", "CHROMOSOME_I:1000-1100"]
REGIONS2 = ["CHROMOSOME_I:1122-1122", "CHROMOSOME_II:1136-1136",
            "CHROMOSOME_II:1241-1241", "CHROMOSOME_II:1267-1267",
            "CHROMOSOME_II:1326-1326", "CHROMOSOME_II:1345-1345",
            "CHROMOSOME_II:1353-1353", "CHROMOSOME_II:1366-1366",
            "CHROMOSOME_II:1416-1416", "CHROMOSOME_II:1459-1459",
            "CHROMOSOME_II:1536-1536"]


def test_bin_math():
    assert reg2bin(0, 2 ** 14) == 4681
    assert reg2bin(0, 2 ** 17) == 585
    assert 4681 in reg2bins(0, 100)
    assert 0 in reg2bins(0, 100)
    assert len(reg2bins(0, 1 << 29)) > 4000


def test_parse_decimal():
    assert parse_decimal("1234")[0] == 1234
    assert parse_decimal("1,234", 1)[0] == 1234
    assert parse_decimal("1.5k")[0] == 1500
    assert parse_decimal("2M")[0] == 2000000
    assert parse_decimal("-17")[0] == -17
    assert parse_decimal("1e3")[0] == 1000


def test_parse_region():
    names = {"chr1": 0, "chr2": 1, "HLA-DRB1*12:17": 2, "chr1:100-200": 3}
    n2i = lambda s: names.get(s, -1)
    assert parse_region("chr1", n2i)[:3] == (0, 0, HTS_POS_MAX)
    assert parse_region("chr1:100", n2i)[:3] == (0, 99, HTS_POS_MAX)
    assert parse_region("chr1:100", n2i, HTS_PARSE_ONE_COORD)[:3] == (0, 99, 100)
    # both chr1 and "chr1:100-200" exist: ambiguous, needs {} quoting
    # (hts.c:4081-4098)
    assert parse_region("chr1:100-200", n2i) is None
    assert parse_region("{chr1:100-200}", n2i)[:3] == (3, 0, HTS_POS_MAX)
    assert parse_region("{chr1}:100-200", n2i)[:3] == (0, 99, 200)
    assert parse_region("chr2:1,000-2,000", n2i)[:3] == (1, 999, 2000)
    assert parse_region("HLA-DRB1*12:17", n2i)[:3] == (2, 0, HTS_POS_MAX)
    assert parse_region("{chr2}:-500", n2i, HTS_PARSE_ONE_COORD)[:3] == (1, 0, 500)
    r = parse_region("chr1:5-10,chr2:3-4", n2i, HTS_PARSE_LIST)
    assert r[:3] == (0, 4, 10) and r[3] == len("chr1:5-10,")


@pytest.mark.skipif(not has_ref("range.bam"), reason="no corpus")
def test_load_prebuilt_bai_queries_match_golden():
    idx = HtsIndex.load(ref_path("range.bam.bai"))
    want = open(ref_path("range.out")).read()
    want_lines = [l for l in want.rstrip("\n").split("\n") if not l.startswith("@")]
    got_lines = []
    with BamReader(ref_path("range.bam")) as r:
        for region in REGIONS1:
            for rec in bam_fetch(r, idx, region):
                got_lines.append(rec.to_sam(r.header))
    assert got_lines == want_lines


@pytest.mark.skipif(not has_ref("range.bam"), reason="no corpus")
def test_built_bai_matches_prebuilt_queries(tmp_path):
    out = str(tmp_path / "range.bam.bai")
    idx = build_bam_index(ref_path("range.bam"), out)
    ref_idx = HtsIndex.load(ref_path("range.bam.bai"))
    assert idx.n == ref_idx.n
    for tid in range(idx.n):
        a, b = idx.bidx[tid], ref_idx.bidx[tid]
        if a is None or b is None:
            assert (a is None) == (b is None)
            continue
        assert set(a.keys()) == set(b.keys()), f"tid {tid} bin sets differ"
        for bin_ in a:
            assert sorted(a[bin_].chunks) == sorted(b[bin_].chunks), \
                f"tid {tid} bin {bin_} chunks differ"
        assert idx.lidx[tid] == ref_idx.lidx[tid]
    # and the saved file reloads to the same structure
    idx2 = HtsIndex.load(out)
    assert idx2.n == idx.n
    for tid in range(idx.n):
        if idx.bidx[tid] is None:
            continue
        assert set(idx2.bidx[tid].keys()) == set(idx.bidx[tid].keys())


@pytest.mark.skipif(not has_ref("range.bam"), reason="no corpus")
def test_multi_region_matches_golden_out2():
    idx = HtsIndex.load(ref_path("range.bam.bai"))
    want = open(ref_path("range.out2")).read()
    want_lines = [l for l in want.rstrip("\n").split("\n") if not l.startswith("@")]
    with BamReader(ref_path("range.bam")) as r:
        regions = []
        from htslib_tpu.index import parse_region as pr
        for spec in REGIONS2:
            tid, beg, end, _ = pr(spec, r.header.name2tid)
            regions.append((tid, beg, end))
        got = [rec.to_sam(r.header) for rec in MultiRegionIterator(r, idx, regions)]
    assert got == want_lines


@pytest.mark.skipif(not has_ref("index.bam.csi"), reason="no corpus")
def test_load_csi():
    idx = HtsIndex.load(ref_path("index.bam.csi"))
    assert idx.min_shift == 14
    assert idx.n >= 1


@pytest.mark.skipif(not has_ref("colons.bam"), reason="no corpus")
def test_colons_name_queries():
    # test.pl:954 "Try a range query to ensure id <-> name mapping works"
    idx = HtsIndex.load(ref_path("colons.bam.bai"))
    with BamReader(ref_path("colons.bam")) as r:
        tid0 = {rec.qname for rec in r if rec.tid == 0}
    with BamReader(ref_path("colons.bam")) as r:
        name = r.header.ref_names[0]
        got = {rec.qname for rec in bam_fetch(r, idx, "{%s}" % name)}
    assert got == tid0 and got


@pytest.mark.skipif(not has_ref("range.bam"), reason="no corpus")
def test_on_the_fly_index_matches_post_hoc(tmp_path):
    # writing with build_index=True must produce the same index as
    # indexing the finished file (hts_idx_amend_last semantics)
    out = str(tmp_path / "otf.bam")
    with BamReader(ref_path("range.bam")) as r:
        from htslib_tpu.sam import BamWriter
        w = BamWriter(out, r.header, build_index=True)
        for rec in r:
            w.write(rec)
        w.close()
    otf = HtsIndex.load(out + ".bai")
    post = build_bam_index(out, str(tmp_path / "post.bai"))
    assert otf.n == post.n
    for tid in range(otf.n):
        a, b = otf.bidx[tid], post.bidx[tid]
        assert (a is None) == (b is None)
        if a is None:
            continue
        assert set(a.keys()) == set(b.keys())
        for k in a:
            assert sorted(a[k].chunks) == sorted(b[k].chunks), (tid, k)
        assert otf.lidx[tid] == post.lidx[tid]


def test_idx_get_stat_counts():
    # hts_idx_get_stat (hts.c:3115): meta pseudo-bin mapped/unmapped
    if not has_ref("range.bam"):
        pytest.skip("no corpus")
    from htslib_tpu.sam.indexing import build_bam_index
    idx = build_bam_index(ref_path("range.bam"))
    assert [idx.get_stat(t) for t in range(4)] == [
        (18, 0), (34, 0), (41, 0), (19, 0)]
    with pytest.raises(KeyError):
        idx.get_stat(99)


def test_hts_features():
    import htslib_tpu
    assert htslib_tpu.hts_features() & 32  # libdeflate path present
    assert "libdeflate=yes" in htslib_tpu.hts_feature_string()


def test_adjust_csi_settings():
    """hts_adjust_csi_settings port: depth grows with reference length,
    min_shift only as a last resort."""
    from htslib_tpu.index import adjust_csi_settings, bin_maxpos
    # default 14/5 covers ~2^29: a 2Gb chromosome needs more levels
    ms, nl = adjust_csi_settings(2_000_000_000, 14, 5)
    assert ms == 14 and nl == 6
    assert bin_maxpos(ms, nl) >= 2_000_000_000 + 256
    # small refs: unchanged
    assert adjust_csi_settings(100_000, 14, 5) == (14, 5)
    # beyond 9 levels: min_shift gives way
    ms, nl = adjust_csi_settings(1 << 43, 14, 5)
    assert nl == 9 and ms > 14
    assert bin_maxpos(ms, nl) >= (1 << 43) + 256


def test_parse_region_reference_battery():
    """The full test-parse-reg.c case battery (test/test-parse-reg.c:
    90-137): range extensions, {} disambiguation, ambiguity errors,
    thousands separators, k/M and scientific-notation coordinates,
    HTS_PARSE_LIST splitting, and the Issue#353 beg>end rejection."""
    names = ["chr1", "chr1:100", "chr1:100-200", "chr2:100-200", "chr3",
             "chr1,chr3"]

    def n2i(s):
        try:
            return names.index(s)
        except ValueError:
            return -1

    M = HTS_POS_MAX
    L, OC = HTS_PARSE_LIST, HTS_PARSE_ONE_COORD
    cases = [
        ("chr1", 0, (0, 0, M)), ("chr1:50", 0, (0, 49, M)),
        ("chr1:50", OC, (0, 49, 50)), ("chr1:50-100", 0, (0, 49, 100)),
        ("chr1:50-", 0, (0, 49, M)), ("chr1:-50", 0, (0, 0, 50)),
        ("chr1:100-200", 0, None),              # ambiguous
        ("{chr1}:100-200", 0, (0, 99, 200)),
        ("{chr1:100-200}", 0, (2, 0, M)),
        ("{chr1:100-200}:100-200", 0, (2, 99, 200)),
        ("{chr2:100-200}:100-200", 0, (3, 99, 200)),
        ("chr2:100-200:100-200", 0, (3, 99, 200)),
        ("chr2:100-200", 0, (3, 0, M)),
        ("chr3", 0, (4, 0, M)), ("chr3:", 0, (4, 0, M)),
        ("chr3:1000-1500", 0, (4, 999, 1500)),
        ("chr3:1,000-1,500", 0, (4, 999, 1500)),
        ("chr3:1k-1.5K", 0, (4, 999, 1500)),
        ("chr3:1e3-1.5e3", 0, (4, 999, 1500)),
        ("chr3:1e3-15e2", 0, (4, 999, 1500)),
        ("chr1,chr3", L, (0, 0, M)),
        ("chr1:100-200,chr3", L, None),         # ambiguous
        ("{chr1,chr3}", L, (5, 0, M)),
        ("{chr1,chr3},chr1", L, (5, 0, M)),
        ("chr3:1,000-1,500", L | OC, (4, 0, 1)),
        ("chr2", 0, None), ("chr1,", 0, None), ("{chr1", 0, None),
        ("chr1:10-10", 0, (0, 9, 10)),
        ("chr1:10-9", 0, None),                 # Issue#353
        ("chr1:x", 0, None), ("chr1:1-y", 0, None),
        ("chr1:1,chr3", 0, None),
    ]
    for reg, flags, want in cases:
        got = parse_region(reg, n2i, flags)
        if want is None:
            assert got is None, (reg, flags, got)
        else:
            assert got is not None and got[:3] == want, (reg, flags, got)


@pytest.mark.skipif(not os.path.exists(os.path.join(
    os.environ.get("HTSLIB_BUILD", "/tmp/htslib-build"),
    "test", "test_view")), reason="reference htslib not built")
def test_region_query_differential_fuzz():
    """Random region queries on range.bam: our indexed fetch must
    return exactly what the reference's test_view prints for the same
    region string."""
    import random
    import subprocess

    tv = os.path.join(os.environ.get("HTSLIB_BUILD", "/tmp/htslib-build"),
                      "test", "test_view")
    rnd = random.Random(4242)
    idx = HtsIndex.load(ref_path("range.bam.bai"))
    with BamReader(ref_path("range.bam")) as r:
        names = list(r.header.ref_names)
    for _ in range(25):
        reg = "%s:%d-%d" % (rnd.choice(names), (b := rnd.randint(1, 3000)),
                            b + rnd.randint(0, 2000))
        p = subprocess.run([tv, ref_path("range.bam"), reg],
                           capture_output=True, timeout=60)
        assert p.returncode == 0, (reg, p.stderr[:200])
        want = [l for l in p.stdout.decode().splitlines()
                if not l.startswith("@")]
        with BamReader(ref_path("range.bam")) as r:
            got = [rec.to_sam(r.header) for rec in bam_fetch(r, idx, reg)]
        assert got == want, reg
