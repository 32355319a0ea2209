"""Config-driven entry point (reference: run/run.py + run/main_run.py CLI).

Usage:
    python -m clipspm_tpu.cli.run --cfg configs/clipspm/hmdb.yaml \
        [TRAIN.WAY=5 SOLVER.LR=1e-5 ...]

Unlike the reference, the trailing ``KEY.PATH=value`` overrides are actually
applied (the reference parses but ignores them; utils/config.py:52-57), and
checkpoints go through orbax without ever deleting an existing directory.
"""

from __future__ import annotations

import argparse
import os
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="clipspm_tpu runner")
    p.add_argument("--cfg", dest="cfg_file", required=True,
                   help="path to the model/dataset YAML")
    p.add_argument("--base", dest="base_file", default=None,
                   help="path to base.yaml (defaults to configs/base.yaml)")
    p.add_argument("--splits-root", default=None,
                   help="directory containing the splits/ tree")
    p.add_argument("--allow-random-weights", action="store_true",
                   help="permit CLIP-head runs without pretrained weights / "
                        "the OpenAI BPE vocab (results are meaningless for "
                        "accuracy comparison)")
    p.add_argument("opts", nargs=argparse.REMAINDER,
                   help="KEY.PATH=value overrides")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    # Platform pin for this environment: the site hook force-sets
    # jax_platforms="axon,cpu" and IGNORES the JAX_PLATFORMS env var, so
    # give the CLI its own escape hatch (CLIPSPM_PLATFORM=cpu runs the
    # whole pipeline on host, as the tests do via conftest).
    platform = os.environ.get("CLIPSPM_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    # per-host persistent compile cache (utils/cache.py): production runs
    # should never pay a repeat compile; the fingerprinted path also keeps
    # a live-migrated guest from loading a foreign host's CPU AOT artifacts
    from clipspm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from clipspm_tpu.utils.config import load_config
    from clipspm_tpu.train.setup import build_learner
    from clipspm_tpu.train.checkpoint import CheckpointManager

    # pass opts through unfiltered: apply_opts raises on malformed tokens
    # (e.g. "TRAIN.WAY 5" without "=", or a --flag swallowed into the
    # REMAINDER by being placed after the first override) — silently
    # dropping them would run a wrong experiment config
    cfg = load_config(args.cfg_file, base_path=args.base_file,
                      opts=args.opts, splits_root=args.splits_root)

    ckpt_dir = cfg.CHECKPOINT.CHECKPOINT_DIR
    os.makedirs(ckpt_dir, exist_ok=True)
    logfile = open(os.path.join(ckpt_dir, "log.txt"), "a")

    def log(msg: str):
        print(msg)
        logfile.write(f"{time.strftime('%m/%d/%Y %H:%M:%S')} {msg}\n")
        logfile.flush()

    log(f"Options: {cfg.dump()}")
    learner = build_learner(cfg, log_fn=log,
                            allow_random_weights=args.allow_random_weights)
    manager = CheckpointManager(ckpt_dir)

    if cfg.CHECKPOINT.get("RESUME_FROM_CHECKPOINT", False) \
            and manager.exists("best"):
        payload = manager.restore("best", learner.state)
        learner.state = payload["state"]
        log(f"Resumed from episode {int(payload['meta']['iteration'])}")

    from clipspm_tpu.utils.metrics import MetricsWriter

    # JSONL + TensorBoard event files (reference: run/main_run.py:50-53)
    metrics = MetricsWriter(os.path.join(ckpt_dir, "metrics.jsonl"),
                            tb_dir=os.path.join(ckpt_dir, "tb"))
    eval_batch = max(1, int(cfg.TEST.get("EVAL_BATCH", 1) or 1))
    if cfg.TEST.ONLY_TEST:
        log("Conduct Testing:")
        test_model_path = str(cfg.TEST.get("TEST_MODEL_PATH", "") or "")
        if test_model_path:
            # explicit checkpoint selection (reference: utils/utils.py:75-77
            # hard-exits when TEST.TEST_MODEL_PATH is missing, then
            # run/main_run.py:415-418 loads exactly that path) — a set-but-
            # unloadable path must never silently fall through to 'best'
            # or the untrained model
            if not os.path.exists(test_model_path):
                raise FileNotFoundError(
                    f"TEST.TEST_MODEL_PATH={test_model_path!r} does not "
                    "exist — can't test (reference parity: "
                    "utils/utils.py:75-77)")
            payload = manager.restore_path(test_model_path, learner.state)
            learner.state = payload["state"]
            log(f"Loaded checkpoint from {test_model_path} ==> "
                f"iter: [{int(payload['meta']['iteration'])}]")
        elif manager.exists("best"):
            learner.state = manager.restore("best", learner.state)["state"]
        else:
            # loud, not silent: an accuracy line from an untrained head is
            # indistinguishable from a real repro otherwise (CLIP heads
            # produce plausible-looking training-free numbers)
            log(f"WARNING: no 'best' checkpoint under {ckpt_dir} — "
                "evaluating the FRESH (untrained) model")
        res = None
        if cfg.TEST.get("CACHE_FEATURES", False):
            # unique-video feature cache: encode each test video once, run
            # the head over gathered features (train/feature_cache.py) —
            # same episode stream and metrics as the uncached path. Default
            # ON in every cacheable family config.
            from clipspm_tpu.train.feature_cache import evaluate_cached
            from clipspm_tpu.train.setup import build_catalog_and_sampler

            # catalog/split errors surface; only eligibility ValueErrors
            # from the evaluator itself are downgraded to the fallback
            t_cat, t_samp = build_catalog_and_sampler(
                cfg, "test", False, int(cfg.TEST.QUERY_PER_CLASS))
            try:
                res = evaluate_cached(cfg, learner, catalog=t_cat,
                                      sampler=t_samp, log_fn=log)
            except ValueError as e:
                # a head that can't cache (pixel-space molo/soap, cpm2c
                # with visual prompts) falls back to the uncached protocol
                # — loudly, never silently
                log(f"WARNING: TEST.CACHE_FEATURES ignored — {e}")
            else:
                if learner.test_source is not None:
                    learner.test_source.close()  # prefetch was unused
        if res is None:
            res = learner.evaluate(int(cfg.TEST.TEST_EPISODES),
                                   batch_size=eval_batch)
        log(f"{cfg.DATA.DATASET}: {res['accuracy']:.2f} "
            f"+/- {res['confidence']:.2f} (loss {res['loss']:.4f})")
        metrics.scalars({f"TEST/{cfg.DATA.DATASET}_acc": res["accuracy"],
                         f"TEST/{cfg.DATA.DATASET}_ci": res["confidence"]}, 0)
    else:
        log("Conduct Training:")
        cached_ev = None
        if cfg.TEST.get("CACHE_FEATURES", False):
            # feature-cached mid-train validations: ONE persistent
            # evaluator (its seeded sampler stream continues across vals,
            # matching the uncached loader's semantics); the unique-video
            # table is re-encoded at the CURRENT params on every val
            # (train/feature_cache.py) — per-val wall drops from minutes
            # to seconds at production shape
            from clipspm_tpu.train.feature_cache import FeatureCachedEvaluator
            from clipspm_tpu.train.setup import build_catalog_and_sampler

            # catalog/split errors must surface (a malformed config is a
            # wrong experiment, not a cache-eligibility problem) — only the
            # evaluator constructor's eligibility ValueErrors are downgraded
            v_cat, v_samp = build_catalog_and_sampler(
                cfg, "test", False, int(cfg.TEST.QUERY_PER_CLASS))
            try:
                cached_ev = FeatureCachedEvaluator(
                    learner, v_cat, v_samp,
                    encode_videos_per_step=int(
                        cfg.TEST.get("CACHE_ENCODE_VIDEOS", 30) or 30),
                    eval_batch=int(cfg.TEST.get("CACHE_EVAL_BATCH", 64)
                                   or 64),
                    num_decode_workers=int(cfg.DATA.NUM_WORKERS),
                    log_fn=log)
            except ValueError as e:
                # e.g. a pixel-space head (molo/soap) — train with the
                # uncached validator rather than refusing to train
                log(f"WARNING: TEST.CACHE_FEATURES ignored for training "
                    f"validations — {e}")
                cached_ev = None
            if cached_ev is not None and learner.test_source is not None:
                # val_fn replaces the uncached validator entirely, so the
                # test loader's prefetch/decode workers would otherwise idle
                # (but stay alive) for the whole run — mirror the ONLY_TEST
                # branch and release them up front
                learner.test_source.close()
                learner.test_source = None
        try:
            learner.run(
                checkpoint_fn=lambda ep, acc: manager.save(
                    learner.state, "best", best_acc=acc),
                periodic_checkpoint_fn=lambda ep: manager.save(
                    learner.state, f"iter_{ep}"),
                metrics=metrics, eval_batch_size=eval_batch,
                val_fn=cached_ev.evaluate if cached_ev else None)
        finally:
            if cached_ev is not None:
                cached_ev.close()
    metrics.close()
    logfile.close()


if __name__ == "__main__":
    main()
