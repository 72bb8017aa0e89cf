#!/bin/sh
# Build the native ingestion helpers -> i3rc_tpu/native/_fastparse.so
set -e
cd "$(dirname "$0")/.."
g++ -O3 -shared -fPIC -std=c++17 \
    i3rc_tpu/native/fastparse.cc \
    -o i3rc_tpu/native/_fastparse.so
echo "built i3rc_tpu/native/_fastparse.so"
g++ -O3 -shared -fPIC -std=c++17 \
    i3rc_tpu/native/scalar_mc.cc \
    -o i3rc_tpu/native/_scalar_mc.so
echo "built i3rc_tpu/native/_scalar_mc.so"
