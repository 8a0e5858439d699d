"""Microbenchmark for the native decode/resize pipeline (host CPU).

Times the raw bilinear resize at representative shapes (row-cache regime
for sh < 2*dh, fresh-rows regime above) and the fused decode_jpeg(size=...)
path, single-threaded and through ParallelDecoder. Run before/after kernel
changes to image_io.cpp; numbers are ms per image (min over repeats).
On a loaded host the decode rows are noisy (libjpeg entropy decode
dominates them); the resize rows are the kernel signal.

Usage: python scripts/perf/bench_native_io.py [--repeats N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np

from tfimm_tpu import native


def _time(fn, repeats, inner=10):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(inner):
            fn()
        best = min(best, (time.perf_counter() - t0) / inner)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=7)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    print(f"{'case':<34}{'ms/img':>10}")

    for sh, sw in [(256, 256), (350, 350), (448, 448), (512, 512),
                   (1024, 1024), (2048, 2048)]:
        img = rng.integers(0, 256, (sh, sw, 3), np.uint8)
        ms = _time(lambda: native.resize_bilinear(img, (224, 224)),
                   args.repeats)
        regime = "cached" if sh < 2 * 224 else "fresh"
        print(f"resize {sh}x{sw}->224 ({regime})".ljust(34) + f"{ms:>10.3f}")

    # Upscale case (every source row reused).
    img = rng.integers(0, 256, (224, 224, 3), np.uint8)
    ms = _time(lambda: native.resize_bilinear(img, (384, 384)), args.repeats)
    print(f"{'resize 224->384 (sep up)':<34}{ms:>10.3f}")

    # Fused decode+resize: synthetic photo-sized JPEGs.
    for sh, sw in [(500, 375), (1024, 768), (2048, 1536)]:
        img = rng.integers(0, 256, (sh, sw, 3), np.uint8)
        blob = native.encode_jpeg(img, quality=90)
        ms = _time(lambda: native.decode_jpeg(blob, size=(224, 224)),
                   args.repeats)
        print(f"decode+resize jpeg {sh}x{sw}".ljust(34) + f"{ms:>10.3f}")

    # Batch throughput through the thread pool.
    img = rng.integers(0, 256, (1024, 768, 3), np.uint8)
    blob = native.encode_jpeg(img, quality=90)
    blobs = [blob] * 64
    dec = native.ParallelDecoder(size=(224, 224), num_threads=8)
    dec(blobs[:8])  # warm
    t0 = time.perf_counter()
    dec(blobs)
    dt = time.perf_counter() - t0
    print(f"{'ParallelDecoder 64x 1024x768 (8t)':<34}"
          f"{dt / len(blobs) * 1e3:>10.3f}  "
          f"({len(blobs) / dt:.0f} img/s)")
    dec.close()


if __name__ == "__main__":
    main()
