#!/usr/bin/env bash
# Build the native cross-check binary (the reference builds its CUDA
# counterparts with nvcc in cupy_cusparse/build.sh; here plain g++).
set -eu
cd "$(dirname "$0")"
g++ -O2 -std=c++17 -Wall -o spgemm_cross_check spgemm_cross_check.cpp
echo "built native/spgemm_cross_check"
g++ -O2 -std=c++17 -Wall -shared -fPIC -o libspmv_planner.so spmv_planner.cpp
echo "built native/libspmv_planner.so"
