#!/bin/bash
# Build the native data-path runtime (csrc/) into eeg2video_tpu/_native/.
set -e
cd "$(dirname "$0")/.."
mkdir -p eeg2video_tpu/_native
g++ -O3 -march=native -shared -fPIC -pthread -std=c++17 \
    csrc/npy_loader.cpp -o eeg2video_tpu/_native/libnpyloader.so
echo "built eeg2video_tpu/_native/libnpyloader.so"
