"""hts option system tests (hts_opt_add hts.c:1098, hts_parse_format
hts.c:1337, hts_opt_apply hts.c:1185)."""
import pytest

from htslib_tpu.format import Compression, Format
from htslib_tpu.opts import hts_opt_add, hts_opt_apply, hts_parse_format
from tests.conftest import has_ref, ref_path


def test_parse_format_names():
    for name, fmt, comp in [
        ("sam", Format.sam, Compression.no_compression),
        ("sam.gz", Format.sam, Compression.bgzf),
        ("bam", Format.bam, Compression.bgzf),
        ("cram", Format.cram, Compression.custom),
        ("vcf", Format.vcf, Compression.no_compression),
        ("bcf", Format.bcf, Compression.bgzf),
        ("fastq", Format.fastq_format, Compression.no_compression),
        ("fa.gz", Format.fasta_format, Compression.bgzf),
    ]:
        f, _ = hts_parse_format(name)
        assert (f.format, f.compression) == (fmt, comp), name
    with pytest.raises(ValueError):
        hts_parse_format("unknownfmt")


def test_opt_list_grammar():
    f, opts = hts_parse_format("cram,seqs_per_slice=500,no_ref,reference=x.fa")
    assert ("seqs_per_slice", 500) in opts
    assert ("no_ref", 1) in opts            # bare key == boolean 1
    assert ("reference", "x.fa") in opts
    with pytest.raises(ValueError):
        hts_opt_add([], "not_a_real_option")
    with pytest.raises(ValueError):
        hts_opt_add([], "seqs_per_slice=abc")


def test_opts_apply_to_cram_reader():
    if not has_ref("range.cram"):
        pytest.skip("no corpus")
    from htslib_tpu.hts import hts_open
    r = hts_open(ref_path("range.cram"), "r", ref=ref_path("ce.fa"),
                 opts=["decode_md=0", "ignore_md5"])
    try:
        assert r.decode_md is False
        assert r.refs.ignore_md5 is True
        assert r.read1().get_aux("MD") is None
    finally:
        r.close()
