#!/bin/sh
# Build the native mesh-ops runtime into a shared library for ctypes.
set -e
cd "$(dirname "$0")"
g++ -O3 -fPIC -shared -std=c++17 -o libmeshops.so meshops.cpp
echo "built $(pwd)/libmeshops.so"
