#!/usr/bin/env bash
# Build the native C++ components into lib/.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p lib
g++ -O3 -march=native -std=c++17 -shared -fPIC -pthread \
    csrc/databatch.cpp -o lib/librfv_data.so
echo "built lib/librfv_data.so"
