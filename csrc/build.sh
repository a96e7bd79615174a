#!/bin/bash
# Build the native data-prep library. Output: tgt_tpu/data/libtgt_native.so
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o ../tgt_tpu/data/libtgt_native.so tgt_native.cpp
echo "built tgt_tpu/data/libtgt_native.so"
