#!/bin/sh
# Build the AKAZE oracle: the reference's vendored detector sources are read
# from the (read-only) reference checkout at build time — never copied into
# this repo — and compiled against the minimal cvshim.
set -e
cd "$(dirname "$0")"
REF="${AKAZE_REF_DIR:-/root/reference/src/thirdparty/akaze/lib}"
if [ ! -f "$REF/AKAZE.cpp" ]; then
  echo "reference AKAZE sources not found at $REF" >&2
  exit 3
fi
g++ -O2 -fopenmp -DAKAZE_USE_OPENMP -w \
  -I cvshim -I "$REF" \
  harness.cpp "$REF/AKAZE.cpp" "$REF/fed.cpp" \
  "$REF/nldiffusion_functions.cpp" \
  -o akaze_oracle
echo "built $(pwd)/akaze_oracle"
