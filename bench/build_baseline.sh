#!/bin/bash
# Build + run the CPU baseline (hpmvs-style per-patch BOBYQA optimization on
# this host's CPU), writing bench/cpu_baseline.json for bench.py.
#
# Links the reference's own vendored nlopt BOBYQA (the exact optimizer the
# reference uses, PatchOptimizer.cpp:348) from NLOPT_DIR; the harness itself
# is a from-scratch transcription of the reference's objective math.
set -e
cd "$(dirname "$0")"
NLOPT_DIR=${NLOPT_DIR:-/root/reference/thirdLibs/nlopt-2.4.2}
BUILD=build
mkdir -p $BUILD

cat > $BUILD/config.h <<'EOF'
#define HAVE_COPYSIGN 1
#define HAVE_ISNAN 1
#define HAVE_ISINF 1
#define HAVE_QSORT_R 0
#define HAVE_GETTIMEOFDAY 1
#define HAVE_SYS_TIME_H 1
#define HAVE_STDINT_H 1
#define HAVE_UINT32_T 1
#define TIME_WITH_SYS_TIME 1
#define MAJOR_VERSION 2
#define MINOR_VERSION 4
#define BUGFIX_VERSION 2
#define THREADLOCAL __thread
EOF

INC="-I$BUILD -I$NLOPT_DIR/api -I$NLOPT_DIR/util -I$NLOPT_DIR/bobyqa"
for src in bobyqa/bobyqa.c util/stop.c util/timer.c util/qsort_r.c \
           util/rescale.c api/general.c util/mt19937ar.c; do
  obj=$BUILD/$(basename "$src" .c).o
  [ -f "$obj" ] || gcc -O3 -c $INC "$NLOPT_DIR/$src" -o "$obj"
done
g++ -O3 -fopenmp $INC cpu_baseline.cpp $BUILD/*.o -o $BUILD/cpu_baseline -lm

B=${1:-512}
./$BUILD/cpu_baseline "$B" | tee cpu_baseline.json
