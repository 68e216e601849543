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
    cp "$REPO"/htslib_tpu/native/htscodecs_shim/*.c \
       "$REPO"/htslib_tpu/native/htscodecs_shim/*.h \
       "$BUILD/htscodecs/htscodecs/"
    cat > "$BUILD/config.mk" <<'EOF'
CC = gcc
CFLAGS = -g -O2 -fvisibility=hidden
CPPFLAGS = -DHAVE_LIBDEFLATE -DHAVE_LIBLZMA -DHAVE_DRAND48
LDFLAGS =
LIBS = -ldeflate -lz -llzma -lm -lpthread
plugindir =
NONCONFIGURE_OBJS =
EOF
    cat > "$BUILD/config.h" <<'EOF'
#define HAVE_LIBDEFLATE 1
#define HAVE_LIBLZMA 1
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
echo "reference htslib ready: $BUILD/test/test_view"
