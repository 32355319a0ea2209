"""Generate a synthetic on-disk FSAR dataset in the reference layout.

Layout produced (matches reference run/main_run.py:161-175 + splits/):

    <root>/<frame_dir>/{train,test}/<class>/<vid>/{00001..N}.jpg
    <root>/splits/<split_dir>/{train,test}list03.txt   (lines: <class>/<vid>)
    <root>/tiny.yaml                                    (CPU-runnable config)

Frames are class-separable (per-class base color + per-frame motion ramp +
noise) so a model trained on this data must reach accuracy >> chance — used
by the verify recipe, ``bench.py --e2e``, and ``scripts/repro_accuracy.py``.

Usage:
    python scripts/make_synthetic_dataset.py --root /tmp/verify_ds \
        [--classes 4 --videos 6 --frames 6 --size 48 --dataset hmdb]
"""

from __future__ import annotations

import argparse
import io
import os


def make_dataset(root: str, classes: int = 4, videos: int = 6,
                 frames: int = 6, size: int = 48, dataset: str = "hmdb",
                 img_size: int = 32, seq_len: int = 4,
                 quality: int = 80, disjoint_test: bool = True,
                 test_videos: int = 0) -> str:
    """Write the dataset + a tiny config; returns the config path.

    ``test_videos`` overrides the per-class video count of the TEST split
    only (0 = same as ``videos``) — the measured 10k-episode protocol
    (bench.py) wants a reference-scale test split (HMDB: 1292 test videos
    over 10 classes) without paying to write an equally large train split.
    """
    import numpy as np
    from PIL import Image

    split_dirs = {"hmdb": ("splits/hmdb_ARN", "hmdb_256x256q5_l8"),
                  "ucf": ("splits/ucf_ARN", "ucf_256x256q5_l8"),
                  "kinetics": ("splits/kinetics_CMN", "k100_256x256q5_l8")}
    split_dir, frame_dir = split_dirs[dataset]
    rng = np.random.default_rng(0)

    for mode in ("train", "test"):
        n_videos = test_videos if (mode == "test" and test_videos) else videos
        lines = []
        for c in range(classes):
            cname = f"class{c:02d}"
            # distinct base colors per class; test classes offset so the
            # two splits are disjoint label sets (episodic protocol).
            # disjoint_test=False instead reuses the TRAIN hues for the
            # test split (fresh videos): eval then measures seen-class
            # few-shot matching rather than unseen-class transfer —
            # the two numbers bracket a trained model's quality.
            off = classes if (mode == "test" and disjoint_test) else 0
            hue = (c + off) / (2 * classes)
            base = np.array([hue * 255, (1 - hue) * 255, 128.0])
            for v in range(n_videos):
                vid = f"v{v:03d}"
                vdir = os.path.join(root, frame_dir, mode, cname, vid)
                os.makedirs(vdir, exist_ok=True)
                for f in range(frames):
                    ramp = 40.0 * f / max(frames - 1, 1)
                    img = (base[None, None] + ramp
                           + rng.normal(0, 12, (size, size, 3)))
                    img = np.clip(img, 0, 255).astype(np.uint8)
                    Image.fromarray(img).save(
                        os.path.join(vdir, f"{f + 1:05d}.jpg"),
                        quality=quality)
                lines.append(f"{cname}/{vid}")
        sdir = os.path.join(root, split_dir)
        os.makedirs(sdir, exist_ok=True)
        with open(os.path.join(sdir, f"{mode}list03.txt"), "w") as fh:
            fh.write("\n".join(lines) + "\n")

    cfg_path = os.path.join(root, "tiny.yaml")
    with open(cfg_path, "w") as fh:
        fh.write(f"""INFO: 'synthetic-{dataset}'
USE_AMP: false
MODEL:
  NAME: 'clipspm'
  BACKBONE: 'test-tiny'
TRAIN:
  WAY: 2
  SHOT: 1
  QUERY_PER_CLASS: 2
  TRAIN_EPISODES: 8
  VAL_FREQ: 0
  PRINT_FREQ: 4
  TASKS_PER_BATCH: 4
TEST:
  TEST_EPISODES: 4
DATA:
  DATASET: '{dataset}'
  DATA_DIR: '{root}'
  SEQ_LEN: {seq_len}
  IMG_SIZE: {img_size}
  NUM_WORKERS: 2
SOLVER:
  LR: 1e-3
CHECKPOINT:
  CHECKPOINT_DIR: '{root}/ckpt'
""")
    return cfg_path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True)
    p.add_argument("--classes", type=int, default=4)
    p.add_argument("--videos", type=int, default=6)
    p.add_argument("--frames", type=int, default=6)
    p.add_argument("--size", type=int, default=48)
    p.add_argument("--img-size", type=int, default=32)
    p.add_argument("--seq-len", type=int, default=4)
    p.add_argument("--dataset", default="hmdb",
                   choices=["hmdb", "ucf", "kinetics"])
    p.add_argument("--seen-test", action="store_true",
                   help="test split reuses the train hues (fresh videos): "
                        "seen-class few-shot eval instead of unseen-class "
                        "transfer")
    args = p.parse_args()
    cfg = make_dataset(args.root, classes=args.classes, videos=args.videos,
                       frames=args.frames, size=args.size,
                       dataset=args.dataset, img_size=args.img_size,
                       seq_len=args.seq_len,
                       disjoint_test=not args.seen_test)
    print(cfg)


if __name__ == "__main__":
    main()
