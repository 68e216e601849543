/* FQZComp quality codec (CRAM 3.1) — stub until the real implementation
 * lands; NULL = method unavailable. */
#include <stddef.h>
#include "fqzcomp_qual.h"

char *fqz_compress(int vers, fqz_slice *s, char *in, size_t in_size,
                   size_t *out_size, int strat, fqz_gparams *gp) {
    (void)vers; (void)s; (void)in; (void)in_size; (void)out_size;
    (void)strat; (void)gp;
    return NULL;
}

char *fqz_decompress(char *in, size_t in_size, size_t *out_size,
                     int *lengths, int nlengths) {
    (void)in; (void)in_size; (void)out_size; (void)lengths; (void)nlengths;
    return NULL;
}
