#!/bin/sh
# Build the parity drivers against the REFERENCE headers (symlinked in
# parity/include). -Ofast -march=native -fopenmp matches the baseline build
# recorded in BASELINE.md. powitacq is its own TU, like the reference's
# powitacq.cpp (only parity_city links it).
set -e
cd "$(dirname "$0")"
mkdir -p build
CXX="${CXX:-g++}"
FLAGS="-std=c++20 -Ofast -march=native -fopenmp -DNDEBUG -Iinclude -I."
$CXX $FLAGS src/parity_cornell.cpp -o build/parity_cornell
$CXX $FLAGS src/parity_configs.cpp -o build/parity_configs
$CXX $FLAGS src/parity_mesh.cpp -o build/parity_mesh
$CXX $FLAGS -c /root/reference/libwurblpt/powitacq.cpp -o build/powitacq.o
$CXX $FLAGS src/parity_city.cpp build/powitacq.o -o build/parity_city
echo built: build/parity_cornell build/parity_configs build/parity_mesh build/parity_city
