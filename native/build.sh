#!/bin/sh
# Build the native dataio library.
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -o libpftdataio.so dataio.cc
echo "built $(pwd)/libpftdataio.so"
