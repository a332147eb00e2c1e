#!/bin/sh
# Build the native helpers into upnerf/native/.
set -e
cd "$(dirname "$0")"
mkdir -p ../upnerf/native
g++ -O2 -shared -fPIC -std=c++17 -o ../upnerf/native/libcolmap_reader.so colmap_reader.cc
echo "built upnerf/native/libcolmap_reader.so"
