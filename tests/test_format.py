"""Format detection tests vs the reference corpus (hts_detect_format2)."""
import pytest

from htslib_tpu.format import (Category, Compression, Format,
                               detect_format, detect_format_file)
from tests.conftest import ref_path, has_ref

CASES = [
    ("range.bam", Format.bam, Compression.bgzf),
    ("range.cram", Format.cram, Compression.no_compression),
    ("index.sam", Format.sam, Compression.no_compression),
    ("index.vcf", Format.vcf, Compression.no_compression),
    ("index.bam.bai", Format.bai, Compression.no_compression),
    ("index.bam.csi", Format.csi, Compression.bgzf),
    ("index.vcf.gz.tbi", Format.tbi, Compression.bgzf),
    ("index.cram.crai", Format.crai, Compression.gzip),
    ("ce.fa", Format.fasta_format, Compression.no_compression),
    ("ce.fa.fai", Format.fai_format, Compression.no_compression),
    ("emptyfile", Format.empty_format, Compression.no_compression),
    ("bgziptest.txt.gz", Format.text_format, Compression.bgzf),
]


@pytest.mark.parametrize("fname,fmt,comp", CASES)
def test_detect_reference_files(fname, fmt, comp):
    if not has_ref(fname):
        pytest.skip(f"missing {fname}")
    got = detect_format_file(ref_path(fname))
    assert got.format == fmt, f"{fname}: {got.format} != {fmt}"
    assert got.compression == comp, f"{fname}: {got.compression} != {comp}"


def test_detect_synthetic():
    assert detect_format(b"").format == Format.empty_format
    assert detect_format(b"BAM\x01xxxx").format == Format.bam
    assert detect_format(b"CRAM\x03\x00" + b"\0" * 20).format == Format.cram
    f = detect_format(b"##fileformat=VCFv4.3\n#CHROM\t...")
    assert f.format == Format.vcf and f.version_major == 4 and f.version_minor == 3
    assert detect_format(b"BCF\x02\x02xxxx").format == Format.bcf
    assert detect_format(b">seq1\nACGT\n").format == Format.fasta_format
    assert detect_format(b"@read1\nACGT\n+\nFFFF\n").format == Format.fastq_format
    assert detect_format(b"@HD\tVN:1.6\n").format == Format.sam
    sam_body = b"r1\t0\tchr1\t100\t60\t4M\t*\t0\t0\tACGT\tFFFF\n"
    assert detect_format(sam_body).format == Format.sam
    assert detect_format(b"chr1\t100\t200\n").format == Format.bed


def test_description():
    d = detect_format(b"BAM\x01xxxx").description()
    assert "BAM" in d and "sequence" in d


def test_fieldarith_golden():
    """bam_cigar2qlen/bam_cigar2rlen/bam_endpos against the
    reference's fieldarith.sam, whose XQ/XR/XE aux tags carry the
    expected values for each record (test/fieldarith.c)."""
    from htslib_tpu.sam import SamHeader
    from htslib_tpu.sam.cigar import cigar2qlen, cigar2rlen
    from htslib_tpu.sam.record import BamRecord

    lines = open(ref_path("fieldarith.sam")).read().splitlines()
    hdr = SamHeader("".join(l + "\n" for l in lines if l.startswith("@")))
    n = 0
    for line in lines:
        if not line or line.startswith("@"):
            continue
        rec = BamRecord.from_sam(line, hdr)
        assert rec.get_aux("XQ") == cigar2qlen(rec.cigar), line
        assert rec.get_aux("XR") == cigar2rlen(rec.cigar), line
        assert rec.get_aux("XE") == rec.endpos(), line
        n += 1
    assert n == 8


def test_sam_parse_rejects_out_of_range_ints():
    """Overflowing or out-of-range numeric fields are parse errors,
    as in the reference's hts_str2int/uint clamped parses (flag 16-bit,
    MAPQ 8-bit, pos int32, scalar aux 32-bit, sam.c:2593-2753) — never
    silent truncation."""
    import numpy as np
    import pytest

    from htslib_tpu.native import native
    from htslib_tpu.sam import SamHeader

    if native is None:
        pytest.skip("native helper unavailable")
    hdr = SamHeader("@SQ\tSN:c1\tLN:10000\n")
    base = "r1\t{flag}\tc1\t{pos}\t{mapq}\t4M\t*\t0\t0\tACGT\tJJJJ{aux}"
    bad = [
        dict(flag=65536, pos=100, mapq=60, aux=""),
        dict(flag=0, pos=2147483649, mapq=60, aux=""),
        dict(flag=0, pos=100, mapq=256, aux=""),
        dict(flag=0, pos=100, mapq=60, aux="\tXN:i:4294967296"),
        dict(flag=0, pos=100, mapq=60, aux="\tXN:i:-2147483649"),
        dict(flag=0, pos=100, mapq=60,
             aux="\tXN:i:99999999999999999999999"),
    ]
    for kw in bad:
        line = (base.format(**kw) + "\n").encode()
        with pytest.raises(IOError):
            native.sam_to_bam(np.frombuffer(line, np.uint8),
                              hdr.ref_names)
    ok = (base.format(flag=65535, pos=100, mapq=255,
                      aux="\tXN:i:4294967295") + "\n").encode()
    assert len(native.sam_to_bam(np.frombuffer(ok, np.uint8),
                                 hdr.ref_names)) > 0
