#!/bin/bash
# Build the CPU FULL-LOOP baseline (the reference hpmvs algorithm end-to-end
# on this host's CPU, bench/cpu_fullloop.cpp), linking the reference's own
# vendored nlopt BOBYQA like build_baseline.sh does.
set -e
cd "$(dirname "$0")"
NLOPT_DIR=${NLOPT_DIR:-/root/reference/thirdLibs/nlopt-2.4.2}
BUILD=build
mkdir -p $BUILD

if [ ! -f $BUILD/config.h ]; then
  # create config.h + nlopt objects WITHOUT clobbering cpu_baseline.json
  # (build_baseline.sh tees its measurement there; a B=1 run would poison
  # bench.py's vs_baseline denominator)
  saved=$(mktemp); cp cpu_baseline.json "$saved" 2>/dev/null || true
  ./build_baseline.sh 1 > /dev/null
  cp "$saved" cpu_baseline.json 2>/dev/null || true
fi

INC="-I$BUILD -I$NLOPT_DIR/api -I$NLOPT_DIR/util -I$NLOPT_DIR/bobyqa"
g++ -O3 -fopenmp $INC cpu_fullloop.cpp \
    $BUILD/bobyqa.o $BUILD/stop.o $BUILD/timer.o $BUILD/qsort_r.o \
    $BUILD/rescale.o $BUILD/general.o $BUILD/mt19937ar.o \
    -o $BUILD/cpu_fullloop -lm
echo "built $BUILD/cpu_fullloop"
