#!/bin/sh
# Build the native window-loader shared library, named by the source hash
# (graph_wavenet_tpu/data/native_loader.py loads exactly this name, so a
# stale binary from older sources is never picked up).
set -e
cd "$(dirname "$0")"
HASH=$(sha1sum windowloader.cpp | cut -c1-10)
g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
    windowloader.cpp -o "libwindowloader-${HASH}.so"
echo "built $(pwd)/libwindowloader-${HASH}.so"
