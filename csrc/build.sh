#!/bin/sh
# Build the native host-runtime library.  Output lands next to the sources;
# instant_nvr_tpu/utils/native.py searches here (and rebuilds on demand).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 -o libnvrhost.so nvrhost.cpp
echo "built $(pwd)/libnvrhost.so"
