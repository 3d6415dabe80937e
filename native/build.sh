#!/bin/sh
# Build the native host-runtime library (no external deps).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    r3d_native.cpp -o libr3d_native.so
echo "built $(pwd)/libr3d_native.so"
