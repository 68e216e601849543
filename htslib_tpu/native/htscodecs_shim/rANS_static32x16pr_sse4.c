/* SSE4 tier alias: on x86-64 the implemented vector tier is AVX2
 * (rANS_static32x16pr_avx2.c); SSE4-only CPUs take the scalar core in
 * rANS_static4x16pr.c.  This TU exists to satisfy the
 * htscodecs_bundled.mk per-ISA file list. */
#include "rANS_static16_int.h"
int rans32x16_have_sse4_tier(void) { return 0; }
