#!/bin/sh
# Build the native streaming runtime (libaruco3stream.so).
set -e
cd "$(dirname "$0")/.."
mkdir -p aruco3_tpu/runtime/lib
g++ -O3 -shared -fPIC -std=c++17 -o aruco3_tpu/runtime/lib/libaruco3stream.so \
    native/stream_buffer.cpp
echo "built aruco3_tpu/runtime/lib/libaruco3stream.so"
