#!/bin/sh
# Build the AKAZE oracle: the reference's vendored detector sources are read
# from the (read-only) reference checkout at build time — never copied into
# this repo — and compiled against the minimal cvshim.
set -e
cd "$(dirname "$0")"
REF="${AKAZE_REF_DIR:-/root/reference/src/thirdparty/akaze/lib}"
LIOP="${LIOP_REF_DIR:-/root/reference/src/thirdparty/liop}"
if [ ! -f "$REF/AKAZE.cpp" ]; then
  echo "reference AKAZE sources not found at $REF" >&2
  exit 3
fi
EXTRA=""
DEFS=""
if [ -f "$LIOP/vl_liop.c" ]; then
  # compile the reference's vendored VLFeat LIOP so the CPU baseline times
  # the FULL feature stage (detect + describe), like the TPU side does
  gcc -O2 -w -c "$LIOP/vl_liop.c" -I "$LIOP" -o vl_liop.o
  EXTRA="vl_liop.o"
  DEFS="-DWITH_LIOP -I $LIOP"
fi
g++ -O2 -fopenmp -DAKAZE_USE_OPENMP -w $DEFS \
  -I cvshim -I "$REF" \
  harness.cpp "$REF/AKAZE.cpp" "$REF/fed.cpp" \
  "$REF/nldiffusion_functions.cpp" $EXTRA \
  -o akaze_oracle
echo "built $(pwd)/akaze_oracle"
