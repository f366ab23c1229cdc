#!/bin/sh
# Build the native fastprep library next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -pthread -std=c++17 -o libfastprep.so fastprep.cpp
echo "built $(pwd)/libfastprep.so"
