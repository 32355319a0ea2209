"""Thread-scaling measurement for the native C++ batch JPEG decoder.

The e2e data path replaces the reference's fork-per-worker PIL decode
(reference: video_reader.py:264-273) with ``native/frame_decoder.cc``
(libjpeg, one worker thread per slice). This script MEASURES the scaling
curve on the current host — replacing the earlier "scales with real cores"
inference with data — and the PIL single/multi-thread baseline.

Usage:
    python scripts/bench_decoder.py [--frames 960] [--size 256]
                                    [--threads 1,2,4,8,16]

Prints one JSON line:
    {"native_fps": {"1": ..., "2": ...}, "pil_fps": {...},
     "frames", "size", "host_cpus", "episode_equiv_eps_per_sec": {...}}
(an "episode" is 240 frames: 5-way 5-shot + 5 queries x 8 frames).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=960)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--threads", default="1,2,4,8,16")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    import numpy as np
    from PIL import Image

    from clipspm_tpu.data.native_decode import decode_frames, get_library

    root = f"/tmp/bench_decoder_{args.size}"
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(0)
    paths = []
    # realistic JPEG content: per-frame color ramps + noise (constant-color
    # JPEGs decode unrealistically fast)
    n_unique = min(args.frames, 64)
    for i in range(n_unique):
        p = os.path.join(root, f"f{i:04d}.jpg")
        if not os.path.exists(p):
            img = (rng.normal(128, 40, (args.size, args.size, 3))
                   .clip(0, 255).astype(np.uint8))
            Image.fromarray(img).save(p, quality=80)
        paths.append(p)
    paths = (paths * (args.frames // n_unique + 1))[: args.frames]

    thread_counts = [int(t) for t in args.threads.split(",")]
    have_native = get_library() is not None
    native_fps = {}
    if have_native:
        for nt in thread_counts:
            decode_frames(paths[:64], args.size, args.size, n_threads=nt)
            ts = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                decode_frames(paths, args.size, args.size, n_threads=nt)
                ts.append(time.perf_counter() - t0)
            native_fps[str(nt)] = round(args.frames / min(ts), 1)

    # PIL baseline: single-thread, and thread-pool at the same counts (PIL
    # releases the GIL during JPEG decode, so a pool does scale some)
    import concurrent.futures as cf

    def pil_one(p):
        with Image.open(p) as im:
            im.load()
            return np.asarray(im.convert("RGB"), np.uint8)

    pil_fps = {}
    for nt in thread_counts:
        with cf.ThreadPoolExecutor(max_workers=nt) as pool:
            list(pool.map(pil_one, paths[:64]))
            ts = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                list(pool.map(pil_one, paths))
                ts.append(time.perf_counter() - t0)
        pil_fps[str(nt)] = round(args.frames / min(ts), 1)

    print(json.dumps({
        "native_fps": native_fps or "library unavailable",
        "pil_fps": pil_fps,
        "frames": args.frames, "size": args.size,
        "host_cpus": os.cpu_count(),
        "episode_equiv_eps_per_sec": {
            k: round(v / 240.0, 2) for k, v in native_fps.items()},
    }))


if __name__ == "__main__":
    main()
