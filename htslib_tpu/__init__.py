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
