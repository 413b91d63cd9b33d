#!/bin/bash
# Build the reference CCJ binary and the test-oracle dumpers into .ref_build/.
# (see .claude/skills/verify/SKILL.md). Run from the repo root.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/../.." && pwd)"
REF="${REFERENCE_DIR:-/root/reference}"
cd "$REPO"
cmake -S "$REF" -B .ref_build -DCMAKE_BUILD_TYPE=Release
cmake --build .ref_build -j4
g++ -O2 -std=c++17 -I"$REF"/src -I"$REF"/src/ViennaRNA \
    tools/oracle/dump_oracle.cc \
    .ref_build/CMakeFiles/CCJ.dir/src/W_final.cc.o \
    .ref_build/CMakeFiles/CCJ.dir/src/pseudo_loop.cc.o \
    .ref_build/CMakeFiles/CCJ.dir/src/s_energy_matrix.cc.o \
    .ref_build/libRNA.a -o .ref_build/dump_oracle
g++ -O2 -std=c++17 -I"$REF"/src -I"$REF"/src/ViennaRNA \
    tools/oracle/dump_raw_defaults.cc .ref_build/libRNA.a \
    -o .ref_build/dump_raw_defaults
echo "oracle build ok: .ref_build/{CCJ,dump_oracle,dump_raw_defaults}"
