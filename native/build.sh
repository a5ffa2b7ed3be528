#!/bin/sh
# Build libi2vio.so (native decode runtime). Requires ffmpeg + libjpeg dev
# headers (present in this image).
set -e
cd "$(dirname "$0")"
g++ -O2 -fPIC -shared -pthread -o libi2vio.so i2vio.cc \
    -lavformat -lavcodec -lavutil -lswscale -ljpeg
echo "built $(pwd)/libi2vio.so"
