#!/usr/bin/env bash
# Compile the REFERENCE serving engine (read-only at /root/reference) against
# this machine's pip-installed LibTorch, for a measured CPU baseline on
# identical artifacts.  Nothing from the reference is copied into this repo:
# the build happens in a scratch dir; only the cnpy shim (our own code, see
# cnpy_shim.cpp) and this script live here.
#
# Usage: build_reference_search.sh [out_dir]   (default /tmp/refbuild)
set -euo pipefail

REF=${REF:-/root/reference}
OUT=${1:-/tmp/refbuild}
TORCH=$(python -c "import torch, os; print(os.path.dirname(torch.__file__))")
HERE=$(dirname "$(readlink -f "$0")")

mkdir -p "$OUT"
g++ -O3 -march=native -fopenmp -std=c++17 \
    -I"$REF" \
    -I"$TORCH/include" -I"$TORCH/include/torch/csrc/api/include" \
    "$REF/search.cpp" "$HERE/cnpy_shim.cpp" \
    -L"$TORCH/lib" -Wl,-rpath,"$TORCH/lib" \
    -ltorch -ltorch_cpu -lc10 -lz \
    -o "$OUT/search_ref"
echo "built $OUT/search_ref"
