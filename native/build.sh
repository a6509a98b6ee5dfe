#!/bin/sh
# Build the native window-loader shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
    windowloader.cpp -o libwindowloader.so
echo "built $(pwd)/libwindowloader.so"
