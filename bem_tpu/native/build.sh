#!/bin/sh
# Build the native host-pipeline library.
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -pthread histogram.cpp -o libbem_native.so
echo "built $(pwd)/libbem_native.so"
