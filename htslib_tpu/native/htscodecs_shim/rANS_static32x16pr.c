/* Placeholder translation unit (rANS_static32x16pr): entry points live in stubs.c or
 * rANS_static.c until the real implementation lands. */
typedef int htstpu_hc_rANS_static32x16pr_unused;
