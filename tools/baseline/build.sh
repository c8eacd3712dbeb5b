#!/bin/bash
# Build the baseline measurement harness against the reference Uno library.
# Prereq: the reference core builds with no external solvers in this
# container (cmake /root/reference && make uno_static -> libuno.a);
# this script does that into /tmp/uno_build if needed.
set -euo pipefail

REF=/root/reference
BUILD=/tmp/uno_build
OUT=${1:-/tmp/uno_baseline}
HERE="$(cd "$(dirname "$0")" && pwd)"

if [ ! -f "$BUILD/libuno.a" ]; then
  mkdir -p "$BUILD"
  (cd "$BUILD" && cmake "$REF" -DCMAKE_BUILD_TYPE=Release >/dev/null && make -j"$(nproc)" uno_static)
fi

# link our factory-overriding objects BEFORE libuno.a so the reference's
# SymmetricIndefiniteLinearSolverFactory.cpp.o archive member is never pulled in
g++ -O2 -std=c++17 -I"$REF/uno" -I"$REF" \
    "$HERE/uno_baseline.cpp" \
    "$HERE/../../uno_tpu/io/nlread.cpp" \
    "$BUILD/libuno.a" \
    -l:liblapack.so.3 -l:libblas.so.3 \
    -o "$OUT"
echo "built $OUT"
