#!/bin/bash
# Build the native octree-core runtime: native/libhpmvs_octree.so
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC octree_core.cpp -o libhpmvs_octree.so
echo "built $(pwd)/libhpmvs_octree.so"
