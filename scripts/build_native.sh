#!/bin/bash
# Build the native data-path runtime (csrc/) into eeg2video_tpu/_native/.
set -e
cd "$(dirname "$0")/.."
mkdir -p eeg2video_tpu/_native
g++ -O3 -march=native -shared -fPIC -pthread -std=c++17 \
    csrc/npy_loader.cpp -o eeg2video_tpu/_native/libnpyloader.so
echo "built eeg2video_tpu/_native/libnpyloader.so"
g++ -O3 -march=native -shared -fPIC -pthread -std=c++17 \
    csrc/gif_encoder.cpp -o eeg2video_tpu/_native/libgifencoder.so
echo "built eeg2video_tpu/_native/libgifencoder.so"

# video decoder needs opencv4 (headers + libs in the image); optional
if pkg-config --exists opencv4; then
    g++ -O3 -march=native -shared -fPIC -pthread -std=c++17 \
        csrc/video_decoder.cpp -o eeg2video_tpu/_native/libvideodecoder.so \
        $(pkg-config --cflags --libs opencv4)
    echo "built eeg2video_tpu/_native/libvideodecoder.so"
else
    echo "opencv4 not found; skipping libvideodecoder.so (cv2 fallback stays)"
fi
