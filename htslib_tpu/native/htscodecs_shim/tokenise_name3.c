/* Name tokeniser (CRAM 3.1) — stub until the real implementation lands;
 * NULL = method unavailable. */
#include <stddef.h>
#include "tokenise_name3.h"

uint8_t *tok3_encode_names(char *blk, int len, int level, int use_arith,
                           int *out_len, int *last_start_p) {
    (void)blk; (void)len; (void)level; (void)use_arith; (void)out_len;
    (void)last_start_p;
    return NULL;
}

uint8_t *tok3_decode_names(uint8_t *in, uint32_t sz, uint32_t *out_len) {
    (void)in; (void)sz; (void)out_len;
    return NULL;
}
