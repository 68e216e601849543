"""Entropy codecs used by CRAM block compression (the htscodecs
equivalent): rANS 4x8 (CRAM 3.0), rANS 4x16 + pack/RLE transforms
(CRAM 3.1), adaptive arithmetic, FQZComp quality model, name tokenizer.

Pure numpy implementations are the reference; the Pallas device kernels in
htslib_tpu.ops mirror the 4x16 decoder (32 interleaved states = vector
lanes).
"""
