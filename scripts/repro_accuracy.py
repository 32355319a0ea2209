"""Accuracy-readiness kit: reproduce any README table cell of the reference.

Given pretrained CLIP weights and a dataset root, this script runs the exact
published protocol (10,000 test episodes, 5-way, 1 query/class, 8 frames,
224^2 center-crop, CI = 196*std/sqrt(n) — reference: configs/base.yaml:29-30,
run/main_run.py:256-293) for one (backbone, dataset, shot) cell of the
reference's accuracy tables (reference: README.md:40-58; see BASELINE.md).

Usage:
    python scripts/repro_accuracy.py --dataset hmdb --backbone ViT-B/16 \
        --shot 1 [--episodes 10000] [--data-root /data] [--smoke]

Prerequisites (the asset checklist):
    1. CLIP weights: $CLIP_WEIGHTS_DIR (or ~/.cache/clip) containing
         RN50.pt        (OpenAI release, SHA256 prefix afeb0e10...)
         ViT-B-16.pt    (OpenAI release, SHA256 prefix 5806e77c...)
       — the same files the reference downloads by SHA-addressed URL
       (reference: models/clip_fsar.py:827-837). This environment has no
       network; place them manually. Files named like an official release
       are SHA256-verified at load against
       torch_import.CLIP_CHECKPOINT_SHA256 (corrupt/wrong files fail loudly).
    2. Dataset root (--data-root or $CLIPSPM_DATA_ROOT): pre-extracted
       frame dirs `<root>/<ds>_256x256q5_l8/{train,test}/<class>/<vid>/*.jpg`
       (reference: run/main_run.py:161-175) plus the split lists under
       `<root>/splits/` (this repo bundles the split lists in configs/?
       no — they ship with the dataset; layout per SURVEY §2.7).
    3. BPE vocab: bundled in clipspm_tpu/assets/ (nothing to do).
    4. A trained head checkpoint in CHECKPOINT.CHECKPOINT_DIR (train first,
       or point --checkpoint-dir at one); evaluating the untrained head
       measures the training-free protocol only.

``--smoke`` replaces prerequisites 1-2-4 with the synthetic on-disk dataset
(scripts/make_synthetic_dataset.py) and random weights, proving the whole
repro path executes end-to-end with only the real assets missing.
"""

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# config file per (dataset); every cell of the README tables is one of these
# configs + SHOT override (reference: configs/clipspm/*.yaml)
DATASET_CFG = {
    "hmdb": "configs/clipspm/hmdb.yaml",
    "ucf": "configs/clipspm/ucf.yaml",
    "kinetics": "configs/clipspm/k100.yaml",
    "ssv2": "configs/clipspm/ssv2_otam.yaml",       # SSv2-Full
    "ssv2_cmn": "configs/clipspm/ssv2_cmn.yaml",    # SSv2-Small
}

PUBLISHED = {  # (backbone, dataset, shot) -> % acc, reference README.md:40-58
    ("RN50", "hmdb", 1): 77.4, ("RN50", "hmdb", 3): 82.6,
    ("RN50", "hmdb", 5): 84.5,
    ("RN50", "ucf", 1): 93.8, ("RN50", "ucf", 3): 97.2,
    ("RN50", "ucf", 5): 97.7,
    ("RN50", "kinetics", 1): 90.9, ("RN50", "kinetics", 3): 92.9,
    ("RN50", "kinetics", 5): 93.5,
    ("RN50", "ssv2", 1): 62.3, ("RN50", "ssv2", 3): 67.0,
    ("RN50", "ssv2", 5): 69.4,
    ("RN50", "ssv2_cmn", 1): 50.8, ("RN50", "ssv2_cmn", 3): 54.9,
    ("RN50", "ssv2_cmn", 5): 58.5,
    ("ViT-B/16", "hmdb", 1): 78.2, ("ViT-B/16", "hmdb", 3): 86.3,
    ("ViT-B/16", "hmdb", 5): 88.6,
    ("ViT-B/16", "ucf", 1): 96.2, ("ViT-B/16", "ucf", 3): 98.2,
    ("ViT-B/16", "ucf", 5): 98.7,
    ("ViT-B/16", "kinetics", 1): 92.8, ("ViT-B/16", "kinetics", 3): 94.1,
    ("ViT-B/16", "kinetics", 5): 94.3,
    ("ViT-B/16", "ssv2", 1): 66.7, ("ViT-B/16", "ssv2", 3): 74.8,
    ("ViT-B/16", "ssv2", 5): 77.3,
    ("ViT-B/16", "ssv2_cmn", 1): 57.8, ("ViT-B/16", "ssv2_cmn", 3): 62.4,
    ("ViT-B/16", "ssv2_cmn", 5): 66.2,
}


def check_assets(backbone: str, data_root: str, dataset: str):
    from clipspm_tpu.train.setup import find_clip_checkpoint
    from clipspm_tpu.models.backbones.tokenizer import get_tokenizer

    problems = []
    if find_clip_checkpoint(backbone) is None:
        problems.append(
            f"missing CLIP weights for {backbone} — set CLIP_WEIGHTS_DIR")
    if not get_tokenizer().using_openai_vocab:
        problems.append("BPE vocab asset missing (unexpected: it is bundled)")
    # resolve the same dirs the runtime will use (utils/config.py
    # DATASET_PATHS) so the check cannot pass while the run fails
    from clipspm_tpu.utils.config import DATASET_PATHS

    split_rel, frame_rel = DATASET_PATHS[dataset]
    frame_dir = os.path.join(data_root, frame_rel)
    if not os.path.isdir(frame_dir):
        problems.append(f"missing frame dir {frame_dir}")
    test_list = os.path.join(data_root, split_rel, "testlist03.txt")
    if not os.path.isfile(test_list):
        problems.append(f"missing split list {test_list}")
    return problems


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--dataset", choices=sorted(DATASET_CFG), default="hmdb")
    p.add_argument("--backbone", choices=["RN50", "ViT-B/16"],
                   default="ViT-B/16")
    p.add_argument("--shot", type=int, choices=[1, 3, 5], default=1)
    p.add_argument("--episodes", type=int, default=10000)
    p.add_argument("--data-root",
                   default=os.environ.get("CLIPSPM_DATA_ROOT", "/data"))
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--eval-batch", type=int, default=16,
                   help="episodes per device step (batched eval; 1 = "
                        "reference-style single-episode loop)")
    p.add_argument("--smoke", action="store_true",
                   help="run the full path on the synthetic dataset with "
                        "random weights (no real assets needed)")
    args = p.parse_args(argv)

    if args.smoke:
        # hermetic plumbing check: default to CPU like the other --smoke
        # modes (the tiny backbone needs no accelerator, and a wedged
        # remote platform must not be able to hang the asset checklist)
        os.environ.setdefault("CLIPSPM_PLATFORM", "cpu")
        root = "/tmp/repro_smoke_ds"
        if not os.path.isdir(root):
            subprocess.run([sys.executable,
                            os.path.join(REPO, "scripts",
                                         "make_synthetic_dataset.py"),
                            "--root", root], check=True)
        from clipspm_tpu.cli.run import main as run_main
        run_main(["--cfg", os.path.join(root, "tiny.yaml"),
                  "--splits-root", root, "--allow-random-weights",
                  "TEST.ONLY_TEST=true", "TEST.TEST_EPISODES=10"])
        print("smoke repro path OK — supply real assets to reproduce "
              "published cells")
        return 0

    published = PUBLISHED.get((args.backbone, args.dataset, args.shot))
    problems = check_assets(args.backbone, args.data_root, args.dataset)
    if problems:
        print("NOT READY — missing assets:")
        for q in problems:
            print(f"  - {q}")
        print("\nSee the prerequisites checklist in this script's docstring.")
        return 1

    from clipspm_tpu.cli.run import main as run_main
    opts = [
        "--cfg", os.path.join(REPO, DATASET_CFG[args.dataset]),
        "--splits-root", args.data_root,
        f"MODEL.BACKBONE={args.backbone}",
        f"TRAIN.SHOT={args.shot}",
        "TEST.ONLY_TEST=true",
        f"TEST.TEST_EPISODES={args.episodes}",
        f"TEST.EVAL_BATCH={args.eval_batch}",
        f"DATA.DATA_DIR={args.data_root}",
    ]
    if args.checkpoint_dir:
        opts.append(f"CHECKPOINT.CHECKPOINT_DIR={args.checkpoint_dir}")
    print(f"reproducing cell: {args.backbone} / {args.dataset} / "
          f"{args.shot}-shot (published: {published})")
    run_main(opts)
    return 0


if __name__ == "__main__":
    sys.exit(main())
