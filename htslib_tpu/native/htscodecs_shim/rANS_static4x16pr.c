/* rANS Nx16 (CRAM 3.1) — stub until the real implementation lands.
 * Returning NULL makes the reference's codec auto-tuning treat the
 * method as unavailable (cram/cram_io.c:1912 trial logic). */
#include <stddef.h>
#include "rANS_static4x16.h"

unsigned char *rans_compress_4x16(unsigned char *in, unsigned int in_size,
                                  unsigned int *out_size, int order) {
    (void)in; (void)in_size; (void)out_size; (void)order;
    return NULL;
}

unsigned char *rans_uncompress_4x16(unsigned char *in, unsigned int in_size,
                                    unsigned int *out_size) {
    (void)in; (void)in_size; (void)out_size;
    return NULL;
}

unsigned char *rans_uncompress_to_4x16(unsigned char *in, unsigned int in_size,
                                       unsigned char *out,
                                       unsigned int *out_size) {
    (void)in; (void)in_size; (void)out; (void)out_size;
    return NULL;
}

unsigned int rans_compress_bound_4x16(unsigned int size, int order) {
    (void)order;
    return size + 1024;
}
