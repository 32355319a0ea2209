"""Production-scale convergence proof on real hardware.

Trains a full-size CLIP backbone + CLIP-SPM head THROUGH THE CLI (the same
surface a user runs — reference train protocol: run/main_run.py:179-243) on
the synthetic class-separable on-disk JPEG dataset for a few hundred
episodes, with mid-train validations; then restarts a FRESH process in
ONLY_TEST mode to prove checkpoint -> restore -> same accuracy.

This is the strongest accuracy statement available without the real
CLIP weights / frame dumps (see scripts/repro_accuracy.py for the
asset-gated path): the production architecture, production episode shapes
(5-way 5-shot, 8 frames, 224^2), the production optimizer/loop, learning
from random initialisation to >> chance on separable data.

Usage:
    python scripts/train_convergence.py --arch ViT-B/16 \
        [--episodes 400] [--lr 3e-4] [--root /tmp/conv_ds] [--final-eps 200]

Prints one JSON line: {"arch", "episodes", "val_curve", "final_acc",
"final_ci", "restore_acc", "cached_eval_acc", "wall_s", ...}. The final
eval runs three fresh-process restores: uncached (the number), uncached
again (restore determinism), and feature-cached (TEST.CACHE_FEATURES —
cross-checks train/feature_cache.py on the trained checkpoint and times
its wall-clock win). Pass --keep to retain the checkpoint dir for
inspection.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(args, env=None):
    e = dict(os.environ)
    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from clipspm_tpu.utils.cache import compilation_cache_dir

    e.setdefault("JAX_COMPILATION_CACHE_DIR", compilation_cache_dir())
    if env:
        e.update(env)
    p = subprocess.run([sys.executable, "-m", "clipspm_tpu.cli.run"] + args,
                       cwd=REPO, env=e, capture_output=True, text=True)
    sys.stderr.write(p.stdout[-4000:] + p.stderr[-2000:])
    if p.returncode != 0:
        raise RuntimeError(f"CLI exited {p.returncode}")
    return p.stdout


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default=None,
                    help="family config to train (default "
                         "configs/clipspm/<dataset>.yaml) — any head "
                         "family works, e.g. configs/molo/ucf.yaml")
    ap.add_argument("--dataset", default="hmdb",
                    choices=["hmdb", "ucf", "kinetics"],
                    help="synthetic-dataset layout; must match the "
                         "config's DATA.DATASET")
    ap.add_argument("--arch", default="ViT-B/16")
    ap.add_argument("--episodes", type=int, default=400)
    ap.add_argument("--lr", type=float, default=3e-4,
                    help="LR for training FROM RANDOM INIT (the shipped "
                         "1e-5 is a finetuning LR; random init needs a "
                         "larger step to move in ~25 optimizer updates)")
    ap.add_argument("--tasks-per-batch", type=int, default=16)
    ap.add_argument("--val-freq", type=int, default=96)
    ap.add_argument("--val-eps", type=int, default=48)
    ap.add_argument("--final-eps", type=int, default=200)
    ap.add_argument("--root", default="/tmp/conv_ds")
    ap.add_argument("--classes", type=int, default=8,
                    help="train classes in the generated dataset (test "
                         "classes are DISJOINT — hue-offset — so final "
                         "accuracy measures unseen-class transfer; denser "
                         "hue coverage improves it)")
    ap.add_argument("--lr-sch", type=int, default=0,
                    help="episode milestone for the reference MultiStep "
                         "0.1x LR decay (0 = no decay)")
    ap.add_argument("--videos", type=int, default=10,
                    help="videos per class in the generated dataset; more "
                         "videos = more video-level diversity = smaller "
                         "train->val generalization gap (10 videos/class "
                         "caps ViT-B/16 at ~87%% val)")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="plumbing check on CPU: test-tiny backbone, "
                         "32^2 frames, a handful of episodes")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from make_synthetic_dataset import make_dataset

    img = 224
    if args.smoke:
        args.arch, img = "test-tiny", 32
        args.root = args.root + "_smoke"
        args.episodes = min(args.episodes, 16)
        args.tasks_per_batch, args.val_freq = 4, 8
        args.val_eps, args.final_eps = 4, 8
        os.environ.setdefault("CLIPSPM_PLATFORM", "cpu")

    # production-geometry dataset: 256^2 JPEGs, 12 frames/video, 8 classes
    # for 5-way sampling, 10 videos/class (>= train shot 5 + queries 4)
    seq_len = 8 if not args.smoke else 4
    frame_dirs = {"hmdb": "hmdb_256x256q5_l8", "ucf": "ucf_256x256q5_l8",
                  "kinetics": "k100_256x256q5_l8"}
    if not os.path.exists(os.path.join(args.root, frame_dirs[args.dataset])):
        make_dataset(args.root, classes=args.classes, videos=args.videos,
                     frames=12 if not args.smoke else 6,
                     size=256 if not args.smoke else 48,
                     img_size=img, seq_len=seq_len, dataset=args.dataset)

    ckpt = os.path.join(args.root, f"ckpt_{args.arch.replace('/', '_')}")
    if os.path.isdir(ckpt):
        shutil.rmtree(ckpt)   # created by a previous run of this script

    common = [
        "--cfg", args.cfg or os.path.join(
            REPO, f"configs/clipspm/{args.dataset}.yaml"),
        "--splits-root", args.root,
        "--allow-random-weights",   # no CLIP release weights in this env
        f"MODEL.BACKBONE={args.arch}",
        f"DATA.DATA_DIR={args.root}",
        f"DATA.SEQ_LEN={seq_len}",
        f"DATA.IMG_SIZE={img}",
        f"CHECKPOINT.CHECKPOINT_DIR={ckpt}",
        f"SOLVER.LR={args.lr}",
    ]
    if args.lr_sch:
        common.append(f"SOLVER.LR_SCH={args.lr_sch}")
    t0 = time.perf_counter()
    out = sh(common + [
        f"TRAIN.TRAIN_EPISODES={args.episodes}",
        f"TRAIN.TASKS_PER_BATCH={args.tasks_per_batch}",
        f"TRAIN.VAL_FREQ={args.val_freq}",
        f"TRAIN.PRINT_FREQ={max(16, args.tasks_per_batch)}",
        f"TEST.TEST_EPISODES={args.val_eps}",
        "CHECKPOINT.SAVE_FREQ=0",
    ])
    train_wall = time.perf_counter() - t0
    val_curve = [(int(ep), float(acc)) for ep, acc in
                 re.findall(r"Val @ (\d+): acc ([\d.]+)", out)]
    train_curve = [(int(ep), float(loss)) for ep, loss in
                   re.findall(r"Task \[(\d+)/\d+\], Train Loss: ([\d.]+)",
                              out)]

    # fresh-process restore + final eval at a tighter CI
    t0 = time.perf_counter()
    out = sh(common + ["TEST.ONLY_TEST=true",
                       f"TEST.TEST_EPISODES={args.final_eps}"])
    final_wall = time.perf_counter() - t0
    m = re.search(r"\w+: ([\d.]+) \+/- ([\d.]+)", out)
    final_acc, final_ci = float(m.group(1)), float(m.group(2))

    # second restore must reproduce the same number (determinism of
    # checkpoint -> restore -> eval; eval episodes are seeded)
    out = sh(common + ["TEST.ONLY_TEST=true",
                       f"TEST.TEST_EPISODES={args.final_eps}"])
    m = re.search(r"\w+: ([\d.]+) \+/- ([\d.]+)", out)
    restore_acc = float(m.group(1))

    # third restore: the unique-video feature cache (TEST.CACHE_FEATURES,
    # train/feature_cache.py) on the SAME seeded episode stream — the
    # trained-checkpoint accuracy cross-check for the cached path, plus its
    # wall-clock win over the per-episode re-encode above
    t0 = time.perf_counter()
    out = sh(common + ["TEST.ONLY_TEST=true", "TEST.CACHE_FEATURES=true",
                       f"TEST.TEST_EPISODES={args.final_eps}"])
    cached_wall = time.perf_counter() - t0
    m = re.search(r"\w+: ([\d.]+) \+/- ([\d.]+)", out)
    cached_acc = float(m.group(1))

    if not args.keep:
        shutil.rmtree(ckpt, ignore_errors=True)
    print(json.dumps({
        "arch": args.arch, "episodes": args.episodes, "lr": args.lr,
        "chance_pct": 20.0,
        "train_loss_curve": train_curve, "val_curve": val_curve,
        "final_acc": final_acc, "final_ci": final_ci,
        "final_eval_episodes": args.final_eps,
        "restore_acc": restore_acc,
        "cached_eval_acc": cached_acc,
        "train_wall_s": round(train_wall, 1),
        "final_eval_wall_s": round(final_wall, 1),
        "cached_eval_wall_s": round(cached_wall, 1),
    }))


if __name__ == "__main__":
    main()
