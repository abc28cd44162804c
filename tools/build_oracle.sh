#!/bin/sh
# Build the reference C library + the oracle golden-dump harnesses
# out-of-tree (the reference mount is read-only).
set -e
BUILD=${1:-/tmp/refbuild}
mkdir -p "$BUILD"
cmake -G Ninja -S /root/reference -B "$BUILD" -DCMAKE_BUILD_TYPE=Release
ninja -C "$BUILD"
for tool in tools/oracle/*.c; do
    name=$(basename "$tool" .c)
    gcc -O2 -o "$BUILD/$name" "$tool" \
        -I/root/reference/include -I/root/reference/src -I"$BUILD" -I"$BUILD/include" \
        "$BUILD/libsoundswallower.a" -lm
    echo "built $BUILD/$name"
done
