/* Golden driver for vcfutils parity tests: reads a VCF, prints
 * bcf_calc_ac + bcf_gt_type for every record/sample, then applies
 * bcf_remove_allele_set with the allele indexes given in argv[2]
 * (comma-separated) and prints the resulting VCF line.
 *
 * Built by tests/test_vcfutils.py against the locally built reference
 * htslib (scripts/build_reference_htslib.sh); output is the oracle for
 * htslib_tpu.vcfutils. */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "htslib/vcf.h"
#include "htslib/vcfutils.h"
#include "htslib/kbitset.h"

int main(int argc, char **argv) {
    if (argc < 2) return 1;
    htsFile *fp = hts_open(argv[1], "r");
    if (!fp) return 1;
    bcf_hdr_t *hdr = bcf_hdr_read(fp);
    if (!hdr) return 1;
    bcf1_t *line = bcf_init();
    kstring_t str = {0,0,0};
    int nsmpl = bcf_hdr_nsamples(hdr);
    int *ac = NULL;
    while (bcf_read(fp, hdr, line) == 0) {
        bcf_unpack(line, BCF_UN_ALL);
        ac = realloc(ac, line->n_allele * sizeof(int));
        int ret = bcf_calc_ac(hdr, line, ac, BCF_UN_FMT);
        printf("AC ret=%d", ret);
        if (ret) { int i; for (i = 0; i < line->n_allele; i++) printf(" %d", ac[i]); }
        printf("\n");
        bcf_fmt_t *gt = bcf_get_fmt(hdr, line, "GT");
        if (gt) {
            int s;
            for (s = 0; s < nsmpl; s++) {
                int ial = -9, jal = -9;
                int t = bcf_gt_type(gt, s, &ial, &jal);
                printf("GTTYPE %d %d %d\n", t, ial, jal);
            }
        }
        if (argc > 2 && argv[2][0]) {
            kbitset_t *rm = kbs_init(line->n_allele);
            char *tok = strtok(strdup(argv[2]), ",");
            while (tok) { kbs_insert(rm, atoi(tok)); tok = strtok(NULL, ","); }
            if (bcf_remove_allele_set(hdr, line, rm) != 0) {
                printf("RM error\n");
            } else {
                str.l = 0;
                vcf_format(hdr, line, &str);
                printf("RM %s", str.s);
            }
            kbs_destroy(rm);
        }
    }
    free(ac);
    free(str.s);
    bcf_destroy(line);
    bcf_hdr_destroy(hdr);
    hts_close(fp);
    return 0;
}
