"""htslib_tpu — a TPU-native high-throughput sequencing (HTS) data framework.

A from-scratch re-design of the capabilities of samtools/htslib
(reference: /root/reference, HTS_VERSION 102390) for TPU hardware:

  * Host layer (Python + C++ native library): byte I/O (hfile), BGZF
    framing, format detection, headers, indexes, varints — the branchy,
    tiny fraction of the work.
  * Device layer (JAX/XLA/Pallas): batched columnar kernels for the
    byte-crunching hot paths — block inflate/deflate, CRC32, rANS
    entropy coding, BAM record unpack (nibble sequences, packed CIGAR),
    SAM text formatting, pileup accumulation, BAQ HMM realignment.
  * Scale-out: `jax.sharding.Mesh` data parallelism over BGZF block
    batches / CRAM slices; `psum`/`all_gather` merges for pileup tiles
    and statistics.

The record-at-a-time iterator API of the reference is kept as a thin
compatibility veneer; the native unit of work is a *batch*:
fixed-shape `[N, block]` byte tensors and structure-of-arrays record
columns with validity masks.
"""

__version__ = "0.1.0"

# HTS_VERSION-alike integer for feature tests (major*10^5 + minor*10^3 + patch*10)
HTS_VERSION = 100  # 0.1.0

from htslib_tpu.util.log import (  # noqa: F401
    hts_log, hts_set_log_level, hts_get_log_level,
    log_error, log_warning, log_info, log_debug, log_trace,
)


def hts_features() -> int:
    """Build-feature bitmask (hts_features, hts.c:89; HTS_FEATURE_*
    flags).  Reflects what this environment actually provides."""
    feats = 0
    # bit layout mirrors htslib/hts.h HTS_FEATURE_* values
    CONFIGURE, PLUGINS, LIBCURL, S3, GCS, LIBDEFLATE, LZMA, BZIP2, \
        HTSCODECS, CC = (1, 2, 4, 8, 16, 32, 64, 128, 1 << 27, 1 << 28)
    feats |= S3 | GCS                 # s3/gcs signing built in
    try:
        from htslib_tpu.native import native
        if native is not None:
            feats |= LIBDEFLATE
    except Exception:
        pass
    try:
        import lzma  # noqa: F401
        feats |= LZMA
    except ImportError:
        pass
    try:
        import bz2  # noqa: F401
        feats |= BZIP2
    except ImportError:
        pass
    feats |= HTSCODECS                # rANS 4x8 codec implemented in-tree
    return feats


def hts_feature_string() -> str:
    """Human-readable feature summary (hts_feature_string, hts.c:240)."""
    f = hts_features()
    def yn(bit):
        return "yes" if f & bit else "no"
    return (f"libdeflate={yn(32)} lzma={yn(64)} bzip2={yn(128)} "
            f"s3={yn(8)} gcs={yn(16)} htscodecs={yn(1 << 27)}")
