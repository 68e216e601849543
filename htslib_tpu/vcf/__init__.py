"""VCF/BCF variant-data layer (reference vcf.c:1-6658, htslib/vcf.h)."""
from htslib_tpu.vcf.header import BcfHeader  # noqa: F401
from htslib_tpu.vcf.record import BcfRecord  # noqa: F401
from htslib_tpu.vcf.io import (VcfReader, VcfWriter, BcfReader, BcfWriter,  # noqa: F401
                               open_vcf)
from htslib_tpu.vcf.merge import bcf_hdr_merge, bcf_translate  # noqa: F401
