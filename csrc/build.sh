#!/usr/bin/env bash
# Build the native host runtime library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -o ../das_tpu/libdas_host.so das_host.cpp
echo "built das_tpu/libdas_host.so"
