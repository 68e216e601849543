#!/bin/sh
# Build the reference htslib (for baseline measurement + interop tests).
#
# The snapshot at /root/reference ships an EMPTY htscodecs submodule, so a
# stock build is impossible; this script copies the tree to $BUILD and
# fills htscodecs/ with the wire-compatible shim from
# htslib_tpu/native/htscodecs_shim/ (rANS 4x8 is real and validated
# against authentic htscodecs output via test/range.cram; the 3.1-only
# codecs start as stubs and are upgraded as the native implementations
# land).  Produces $BUILD/test/test_view, bgzip, tabix, htsfile.
set -e

REF=${REF:-/root/reference}
BUILD=${BUILD:-/tmp/htslib-build}
REPO=$(cd "$(dirname "$0")/.." && pwd)

if [ ! -x "$BUILD/test/test_view" ]; then
    rm -rf "$BUILD"
    cp -r "$REF" "$BUILD"
    mkdir -p "$BUILD/htscodecs/htscodecs"
    # the image ships libbz2.so.1 but no dev headers; a two-prototype
    # bzlib.h + linking the runtime .so directly gives the reference
    # build its bzip2 CRAM block method for interop coverage
    cat > "$BUILD/bzlib.h" <<'BZEOF'
#ifndef HTSBUILD_BZLIB_SHIM_H
#define HTSBUILD_BZLIB_SHIM_H
#define BZ_OK 0
#define BZ_RUN_OK 1
#define BZ_MEM_ERROR (-3)
int BZ2_bzBuffToBuffCompress(char* dest, unsigned int* destLen,
                             char* source, unsigned int sourceLen,
                             int blockSize100k, int verbosity,
                             int workFactor);
int BZ2_bzBuffToBuffDecompress(char* dest, unsigned int* destLen,
                               char* source, unsigned int sourceLen,
                               int small, int verbosity);
#endif
BZEOF
    cp "$REPO"/htslib_tpu/native/htscodecs_shim/*.c \
       "$REPO"/htslib_tpu/native/htscodecs_shim/*.h \
       "$BUILD/htscodecs/htscodecs/"
    cat > "$BUILD/config.mk" <<'EOF'
CC = gcc
CFLAGS = -g -O2 -fvisibility=hidden
CPPFLAGS = -DHAVE_LIBDEFLATE -DHAVE_LIBLZMA -DHAVE_LIBBZ2 -DHAVE_DRAND48 -I.
LDFLAGS =
LIBS = -ldeflate -lz -llzma /usr/lib/x86_64-linux-gnu/libbz2.so.1 -lm -lpthread
plugindir =
NONCONFIGURE_OBJS =
EOF
    cat > "$BUILD/config.h" <<'EOF'
#define HAVE_LIBDEFLATE 1
#define HAVE_LIBLZMA 1
#define HAVE_LIBBZ2 1
#define HAVE_DRAND48 1
#define HAVE_FSEEKO 1
#define HAVE_INTTYPES_H 1
#define HAVE_STDINT_H 1
EOF
    make -C "$BUILD" -j"$(nproc)" lib-static test/test_view bgzip tabix htsfile
else
    # refresh shim sources and relink if they changed
    cp "$REPO"/htslib_tpu/native/htscodecs_shim/*.c \
       "$REPO"/htslib_tpu/native/htscodecs_shim/*.h \
       "$BUILD/htscodecs/htscodecs/"
    make -C "$BUILD" -j"$(nproc)" lib-static test/test_view bgzip tabix htsfile
fi
# Record which rANS X32 SIMD tier the baseline build will dispatch at
# runtime (the shim's dispatch order is AVX2 -> SSE4.1 -> scalar, all
# byte-exact): ratios measured against this build are only
# like-for-like on hosts dispatching the same tier.
if grep -qw avx2 /proc/cpuinfo 2>/dev/null; then TIER=avx2
elif grep -qw sse4_1 /proc/cpuinfo 2>/dev/null; then TIER=sse4
else TIER=scalar; fi
echo "rans32x16_tier=$TIER" > "$BUILD/SIMD_TIER.txt"
echo "reference htslib ready: $BUILD/test/test_view (rANS X32 tier: $TIER)"
