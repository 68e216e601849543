/* NEON tier alias: non-x86 targets take the scalar core in
 * rANS_static4x16pr.c (the AVX2 TU compiles to stubs there).  This TU
 * exists to satisfy the htscodecs_bundled.mk per-ISA file list. */
#include "rANS_static16_int.h"
int rans32x16_have_neon_tier(void) { return 0; }
