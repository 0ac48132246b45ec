#!/usr/bin/env bash
# Build the native host-side data ops into native/libmudiff_native.so.
# (Replaces the reference's build_extensions.py CUDA-extension AOT build;
# plain C++ + threads, no CUDA, no torch headers.)
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 -pthread \
    slice_gather.cpp -o libmudiff_native.so
echo "built $(pwd)/libmudiff_native.so"
