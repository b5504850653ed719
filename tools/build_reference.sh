#!/bin/bash
# Build the reference CPU photonmap binary (from the read-only mount at
# /root/reference) into a scratch dir, for golden-image comparison tests.
# Uses the repo's stub GL headers (the renderer never calls GL at runtime;
# only the unused Draw() methods reference it).
set -e
SRC=${1:-/root/reference}
OUT=${2:-/tmp/refbuild}
STUB="$(cd "$(dirname "$0")" && pwd)/glstub"

if [ -x "$OUT/src/photonmap" ] && [ "$OUT/src/photonmap" -nt "$0" ]; then
    # already built from this script
    exit 0
fi
rm -rf "$OUT"
cp -r "$SRC" "$OUT"
chmod -R u+w "$OUT"
cd "$OUT/src"
rm -f photonmap visualize
# offsetof returns size_t; ambiguous overload on LP64 Linux
sed -i 's/offsetof(struct Photon, position)/(int) offsetof(struct Photon, position)/' photonmap.cpp
# USER_CFLAGS is exported so the recursive per-library makes (which build
# with BASE_CFLAGS=$(USER_CFLAGS) -Wall -I. -I..) also see the GL stub.
USER_CFLAGS="-std=c++17 -I$STUB" make photonmap \
    CPPFLAGS="-Wall -I. -O3 -DNDEBUG -std=c++17 -I$STUB" \
    OPENGL_LIBS= -j"$(nproc)" >/dev/null
test -x photonmap && echo "built $OUT/src/photonmap"
