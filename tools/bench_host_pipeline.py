"""Standalone host input-pipeline scaling benchmark.

Measures the native ImagePool (C++ libjpeg decode + resize + pad, see
cpm_tpu/native/imageops.cpp) throughput in images/sec as a function of
worker-thread count, on synthetic JPEGs at COCO scale. This answers
"can one host feed N chips?": an 8-chip host at the measured train rate
(BENCH img/s/chip x 8) must be below the saturated pool rate.

Usage: python tools/bench_host_pipeline.py [--images 64] [--size 640 480]
Prints one JSON line:
  {"workers": [...], "images_per_sec": [...], "cpus": N, ...}
"""

import argparse
import io
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_jpegs(tmpdir: str, n: int, w: int, h: int):
    from PIL import Image

    rng = np.random.RandomState(0)
    paths = []
    for i in range(n):
        # photographic-ish content: low-frequency noise so JPEG decode cost
        # is realistic (pure noise inflates entropy, flat fields deflate it)
        base = rng.rand(h // 8, w // 8, 3)
        img = np.asarray(
            Image.fromarray(
                (base * 255).astype(np.uint8), "RGB"
            ).resize((w, h), Image.BILINEAR)
        )
        noise = rng.randint(-12, 13, img.shape, np.int16)
        img = np.clip(img.astype(np.int16) + noise, 0, 255).astype(np.uint8)
        p = os.path.join(tmpdir, f"img_{i:04d}.jpg")
        Image.fromarray(img).save(p, quality=90)
        paths.append(p)
    return paths


def bench_pool(paths, n_workers: int, resized_hw, padded_hw, repeats=2):
    """img/s through ImagePool.submit_u8/wait_any_u8 (the train path)."""
    from cpm_tpu.native import ImagePool

    pool = ImagePool(n_workers=n_workers)
    try:
        # warmup
        for i, p in enumerate(paths[: min(8, len(paths))]):
            pool.submit_u8(i, p, resized_hw, padded_hw)
        for _ in range(min(8, len(paths))):
            pool.wait_any_u8(padded_hw)

        best = 0.0
        for _ in range(repeats):
            t0 = time.perf_counter()
            inflight = 0
            max_inflight = max(2 * n_workers, 4)
            it = iter(enumerate(paths))
            done = 0
            while done < len(paths):
                while inflight < max_inflight:
                    try:
                        i, p = next(it)
                    except StopIteration:
                        break
                    pool.submit_u8(1000 + i, p, resized_hw, padded_hw)
                    inflight += 1
                if inflight:
                    pool.wait_any_u8(padded_hw)
                    inflight -= 1
                    done += 1
            dt = time.perf_counter() - t0
            best = max(best, len(paths) / dt)
        return best
    finally:
        pool.close() if hasattr(pool, "close") else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--size", type=int, nargs=2, default=(640, 480))
    ap.add_argument("--train-scale", type=int, default=800)
    ap.add_argument("--max-size", type=int, default=1333)
    ap.add_argument("--workers", type=int, nargs="*", default=None)
    args = ap.parse_args()

    from cpm_tpu.data.transforms import get_resize_size
    from cpm_tpu.native import get_lib

    if get_lib() is None:
        print(json.dumps(dict(error="native imageops unavailable")))
        return

    w, h = args.size
    nh, nw = get_resize_size((h, w), args.train_scale, args.max_size)
    ph = (nh + 31) // 32 * 32
    pw = (nw + 31) // 32 * 32

    cpus = os.cpu_count() or 1
    workers = args.workers or sorted(
        {1, 2, 4, 8, cpus, 2 * cpus} - {0}
    )

    with tempfile.TemporaryDirectory() as td:
        paths = make_jpegs(td, args.images, w, h)
        rates = []
        for nw_ in workers:
            rate = bench_pool(paths, nw_, (nh, nw), (ph, pw))
            rates.append(round(rate, 2))

    out = dict(
        workers=workers,
        images_per_sec=rates,
        cpus=cpus,
        decode_size=[w, h],
        resized_hw=[nh, nw],
        padded_hw=[ph, pw],
        peak_images_per_sec=max(rates),
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
