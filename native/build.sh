#!/bin/bash
# Builds the native data loader shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++17 -o libse3ds_dataloader.so dataloader.cc -lz
echo "built $(pwd)/libse3ds_dataloader.so"
