#!/bin/sh
# Build the native runtime components (C++ -> shared lib, loaded via ctypes).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 quadfind.cpp -o libquadfind.so
echo "built native/libquadfind.so"
