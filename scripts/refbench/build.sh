#!/bin/sh
# Build the reference-kernel benchmark driver OUT OF TREE (objects + binary
# in $BUILD, default /tmp/hibag_refbench). Reference sources are compiled
# in place from /root/reference/src — nothing is copied into the repo.
set -e
HERE=$(cd "$(dirname "$0")" && pwd)
REF=${REF:-/root/reference/src}
BUILD=${BUILD:-/tmp/hibag_refbench}
mkdir -p "$BUILD"

CXX=${CXX:-g++}
FLAGS="-O3 -std=c++17 -I$HERE/stubs -I$REF -I/root/reference/inst/include"

for src in LibHLA LibHLA_ext_sse2 LibHLA_ext_sse4_2 LibHLA_ext_avx \
           LibHLA_ext_avx2 LibHLA_ext_avx512f LibHLA_ext_avx512bw \
           LibHLA_ext_avx512vpopcnt; do
  obj="$BUILD/$src.o"
  if [ ! -f "$obj" ] || [ "$REF/$src.cpp" -nt "$obj" ]; then
    echo "CXX $src.cpp"
    $CXX $FLAGS -c "$REF/$src.cpp" -o "$obj"
  fi
done
echo "CXX driver.cpp"
$CXX $FLAGS -c "$HERE/driver.cpp" -o "$BUILD/driver.o"
echo "CXX parity.cpp"
$CXX $FLAGS -c "$HERE/parity.cpp" -o "$BUILD/parity.o"
LIBOBJS=$(ls "$BUILD"/LibHLA*.o)
$CXX $LIBOBJS $BUILD/driver.o -ltbb -o "$BUILD/refbench"
$CXX $LIBOBJS $BUILD/parity.o -ltbb -o "$BUILD/refparity"
echo "built $BUILD/refbench $BUILD/refparity"
