"""bf16 vs int8 eval A/B on one checkpoint: the validation gate for
MODEL.INT8_EVAL.

INT8_EVAL (dynamic-int8 projection/MLP matmuls in the ViT tower) is an
opt-in non-parity eval mode measured at +19% batched-eval throughput
(README). This script discharges the "user must validate" note: given a
config/checkpoint, it evaluates the SAME episodes under bf16 and int8 and
prints the accuracy delta, per-episode argmax agreement, and logit error —
the numbers needed to decide whether int8 is safe for a given deployment.

Usage:
    python scripts/int8_ab.py --cfg configs/clipspm/hmdb.yaml \
        [--episodes 200] [--eval-batch 16] [--splits-root R] [overrides...]
    python scripts/int8_ab.py --smoke    # synthetic data, random weights

Prints one JSON line:
    {"acc_bf16", "ci_bf16", "acc_int8", "ci_int8", "acc_delta",
     "argmax_agreement_pct", "mean_abs_logit_delta", "max_abs_logit_delta",
     "episodes"}
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default=os.path.join(
        REPO, "configs/clipspm/hmdb.yaml"))
    ap.add_argument("--splits-root", default=None)
    ap.add_argument("--episodes", type=int, default=200)
    ap.add_argument("--eval-batch", type=int, default=16)
    ap.add_argument("--allow-random-weights", action="store_true",
                    help="permit a random-init backbone (e.g. A/B-ing a "
                         "checkpoint trained from scratch without the CLIP "
                         "release weights)")
    ap.add_argument("--smoke", action="store_true",
                    help="synthetic on-disk dataset + random weights on CPU "
                         "(pipeline check; accuracy deltas are meaningless "
                         "for real deployment decisions)")
    ap.add_argument("opts", nargs=argparse.REMAINDER)
    args = ap.parse_args(argv)

    from clipspm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if args.smoke:
        os.environ.setdefault("CLIPSPM_PLATFORM", "cpu")
    import jax
    import numpy as np

    platform = os.environ.get("CLIPSPM_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)

    from clipspm_tpu.models.fsar import build_model
    from clipspm_tpu.train.checkpoint import CheckpointManager
    from clipspm_tpu.train.setup import build_learner
    from clipspm_tpu.utils.config import load_config

    opts = list(args.opts)
    splits_root = args.splits_root
    if args.smoke:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from make_synthetic_dataset import make_dataset

        root = "/tmp/int8_ab_smoke"
        if not os.path.exists(os.path.join(root, "hmdb_256x256q5_l8")):
            make_dataset(root, classes=8, videos=8, frames=6, size=48,
                         img_size=32, seq_len=4)
        splits_root = root
        opts += [f"DATA.DATA_DIR={root}", "DATA.SEQ_LEN=4",
                 "DATA.IMG_SIZE=32", "MODEL.BACKBONE=test-tiny",
                 "TRAIN.WAY=3", "TRAIN.SHOT=2",
                 f"CHECKPOINT.CHECKPOINT_DIR={root}/ckpt"]
        args.episodes = min(args.episodes, 12)
        args.eval_batch = 4

    cfg = load_config(args.cfg, opts=opts, splits_root=splits_root)

    # bf16 learner owns data, weights, checkpoint restore, text tables
    learner = build_learner(
        cfg, log_fn=lambda m: print(m, file=sys.stderr),
        allow_random_weights=args.smoke or args.allow_random_weights)
    manager = CheckpointManager(cfg.CHECKPOINT.CHECKPOINT_DIR)
    restored = False
    if manager.exists("best"):
        learner.state = manager.restore("best", learner.state)["state"]
        restored = True
    elif not args.smoke:
        print("WARNING: no checkpoint_best found — A/B runs on the "
              "UNTRAINED head (backbone weights still matter if CLIP "
              "weights were found)", file=sys.stderr)

    # int8 twin: same class, arch flag flipped; identical param tree, so the
    # restored/loaded variables drive both (tests/test_int8_eval.py)
    cfg_q = load_config(args.cfg, opts=opts + ["MODEL.INT8_EVAL=true"],
                        splits_root=splits_root)
    q_model = build_model(cfg_q)

    from clipspm_tpu.train.learner import Learner

    q_learner = Learner(cfg_q, q_model,
                        {"params": learner.state.params,
                         **({"batch_stats": learner.state.batch_stats}
                            if learner.state.batch_stats else {})},
                        text_train=np.asarray(learner.state.text_train),
                        text_test=np.asarray(learner.state.text_test))
    q_learner.state = q_learner.state.replace(
        params=learner.state.params,
        batch_stats=learner.state.batch_stats,
        rng=learner.state.rng)

    # same episodes through both models
    eps = []
    it = iter(learner.test_source)
    for _ in range(args.episodes):
        eps.append(next(it))

    rf = learner.evaluate(args.episodes, source=iter(eps),
                          batch_size=args.eval_batch)
    rq = q_learner.evaluate(args.episodes, source=iter(eps),
                            batch_size=args.eval_batch)

    # logit-level compare on a subset (single-episode applies)
    import jax.numpy as jnp
    K = min(16, args.episodes)
    agree, deltas = [], []
    for ep in eps[:K]:
        epd = jax.tree.map(jnp.asarray, ep)
        of, _ = learner._apply(learner.state.params,
                               learner.state.batch_stats, epd,
                               jax.random.PRNGKey(0), train=False,
                               text_train=learner.state.text_train,
                               text_test=learner.state.text_test)
        oq, _ = q_learner._apply(q_learner.state.params,
                                 q_learner.state.batch_stats, epd,
                                 jax.random.PRNGKey(0), train=False,
                                 text_train=q_learner.state.text_train,
                                 text_test=q_learner.state.text_test)
        lf = np.asarray(of["logits"], np.float32).reshape(-1,
                                                          int(cfg.TRAIN.WAY))
        lq = np.asarray(oq["logits"], np.float32).reshape(-1,
                                                          int(cfg.TRAIN.WAY))
        agree.append(float((lf.argmax(-1) == lq.argmax(-1)).mean()))
        deltas.append(np.abs(lf - lq))
    deltas = np.concatenate([d.ravel() for d in deltas])

    print(json.dumps({
        "acc_bf16": round(rf["accuracy"], 2),
        "ci_bf16": round(rf["confidence"], 2),
        "acc_int8": round(rq["accuracy"], 2),
        "ci_int8": round(rq["confidence"], 2),
        "acc_delta": round(rq["accuracy"] - rf["accuracy"], 2),
        "argmax_agreement_pct": round(100.0 * float(np.mean(agree)), 2),
        "mean_abs_logit_delta": round(float(deltas.mean()), 5),
        "max_abs_logit_delta": round(float(deltas.max()), 5),
        "episodes": args.episodes,
        "restored_checkpoint": restored,
    }))


if __name__ == "__main__":
    main()
