#!/bin/sh
# Build the native helpers. Invoked automatically by rtvm_tpu.navigate.astar on
# first use; can also be run manually.
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -o libastar.so astar.cpp
echo "built $(pwd)/libastar.so"
