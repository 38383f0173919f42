#!/bin/sh
# Build the native data-loader components into cdfo_tpu/data/_native.so
set -e
cd "$(dirname "$0")/.."
g++ -O3 -march=native -fopenmp -shared -fPIC \
    native/batcher.cpp \
    -o cdfo_tpu/data/_native.so
echo "built cdfo_tpu/data/_native.so"
