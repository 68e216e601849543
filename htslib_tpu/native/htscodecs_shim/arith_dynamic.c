/* Adaptive arithmetic coder (CRAM 3.1) — stub until the real
 * implementation lands; NULL = method unavailable. */
#include <stddef.h>
#include "arith_dynamic.h"

unsigned char *arith_compress_to(unsigned char *in, unsigned int in_size,
                                 unsigned char *out, unsigned int *out_size,
                                 int order) {
    (void)in; (void)in_size; (void)out; (void)out_size; (void)order;
    return NULL;
}

unsigned char *arith_uncompress_to(unsigned char *in, unsigned int in_size,
                                   unsigned char *out, unsigned int *out_sz) {
    (void)in; (void)in_size; (void)out; (void)out_sz;
    return NULL;
}

unsigned int arith_compress_bound(unsigned int size, int order) {
    (void)order;
    return size + 1024;
}
