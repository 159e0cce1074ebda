#!/bin/sh
# Build the native runtime library (no external deps).
set -e
cd "$(dirname "$0")"
g++ -O2 -shared -fPIC -std=c++17 -Wall -o libovrfsr_native.so \
    src/ovrfsr_native.cc -lpthread
echo "built $(pwd)/libovrfsr_native.so"
