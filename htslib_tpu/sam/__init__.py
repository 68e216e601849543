"""SAM/BAM/CRAM sequence-data layer (reference sam.c, header.c, cram/).

Record-level API (BamRecord, readers/writers) for compatibility and
correctness; columnar batch API (htslib_tpu.sam.batch) as the TPU-native
fast path.
"""
from htslib_tpu.sam.header import SamHeader, HeaderLine  # noqa: F401
from htslib_tpu.sam.record import BamRecord  # noqa: F401
from htslib_tpu.sam.cigar import (  # noqa: F401
    BAM_CIGAR_STR, CIGAR_OPS, cigar_op, cigar_oplen,
)
from htslib_tpu.sam.bam import BamReader, BamWriter  # noqa: F401
from htslib_tpu.sam.samtext import SamReader, SamWriter  # noqa: F401
from htslib_tpu.sam.hts_open import hts_open_sam  # noqa: F401
