#!/bin/sh
# Build the native data-loader shared library.
set -e
cd "$(dirname "$0")/.."
SRC=stjep_tpu/data/native/fastloader.cpp
OUT=stjep_tpu/data/native/libfastloader.so
${CXX:-g++} -O3 -shared -fPIC -pthread -std=c++17 -o "$OUT" "$SRC"
echo "built $OUT"
