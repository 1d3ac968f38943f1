#!/bin/sh
# Build the native host-runtime library (ctypes-loaded; no pybind11).
set -e
cd "$(dirname "$0")"
CC="${CC:-cc}"
$CC -O3 -march=native -shared -fPIC -o libffhtnative.so htprep.c htenc.c t2parse.c ebcot.c htdec.c seggather.c
echo "built native/libffhtnative.so"
