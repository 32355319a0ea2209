"""Validate SOLVER.DONATE_STATE on YOUR platform: step the production
train step N times and report host-RSS growth with donation on vs off.

Donation (buffer aliasing of the TrainState into the jitted step) is
value-invisible and saves ~3x params bytes of peak HBM, but a backend
that ignores the alias hint can leak the donated tree every step: on the
tunneled v5e used for development this leaked ~1.4 G host RSS/step until
a 125 G host OOM'd (README "Train-throughput levers"). This script is the
gate the README asks you to run before enabling it.

Usage:
    python scripts/donation_check.py [--arch ViT-B/16] [--steps 12]
        [--tasks-per-batch 4] [--img 224] [--seq-len 8]
    python scripts/donation_check.py --smoke   # CPU, tiny arch, seconds

Prints one JSON line per arm and a verdict:
    {"arm": "donate"|"no_donate", "rss_start_gb", "rss_end_gb",
     "gb_per_step", "eps_per_sec"} ... {"verdict": "SAFE"|"LEAKS", ...}
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def rss_gb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1e6
    return -1.0


def run_arm(donate: bool, args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from clipspm_tpu.data import SyntheticEpisodeSource
    from clipspm_tpu.data.episode import Episode, stack_episodes
    from clipspm_tpu.models.backbones.clip import CLIP_ARCHS
    from clipspm_tpu.models.fsar import CLIPSPMModel
    from clipspm_tpu.train.learner import Learner
    from clipspm_tpu.utils.config import ConfigNode, SPM_DEFAULT_PARAMS

    way, shot, queries = 5, 5, 1
    T, img, E = args.seq_len, args.img, args.tasks_per_batch
    arch = CLIP_ARCHS[args.arch]
    is_tiny = args.arch.startswith("test-")
    if not is_tiny:
        arch = dataclasses.replace(arch, fast_softmax=True, bf16_norms=True)
    model = CLIPSPMModel(arch=arch, way=way, shot=shot,
                         spm=SPM_DEFAULT_PARAMS["hmdb"],
                         dtype=jnp.float32 if is_tiny else jnp.bfloat16,
                         encode_chunk=0 if is_tiny else 30,
                         train_encode_chunk=0 if is_tiny or not arch.is_vit
                         else 40)
    S, Q, D = way * shot, way * queries, arch.embed_dim
    text = np.random.default_rng(1).normal(size=(16, D)).astype(np.float32)
    dt = jnp.float32 if is_tiny else jnp.bfloat16
    dummy = (jnp.zeros((S, T, img, img, 3), dt),
             jnp.zeros((Q, T, img, img, 3), dt),
             jnp.arange(S, dtype=jnp.int32) % way,
             jnp.zeros((S,), jnp.int32), jnp.zeros((Q,), jnp.int32),
             jnp.asarray(text), jnp.asarray(text))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *dummy)
    cfg = ConfigNode({
        "MODEL": {"NAME": "clipspm", "BACKBONE": args.arch, "SEED": 0},
        "TRAIN": {"WAY": way, "SHOT": shot, "TASKS_PER_BATCH": E},
        "SOLVER": {"LR": 1e-4, "WEIGHT_DECAY": 5e-5, "LR_SCH": 10 ** 6,
                   "OPTIM_METHOD": "adam", "DONATE_STATE": donate},
        "DATA": {"SEQ_LEN": T, "IMG_SIZE": img, "DATASET": "hmdb"},
    })
    learner = Learner(cfg, model, variables, text_train=text, text_test=text)

    src = SyntheticEpisodeSource(way=way, shot=shot, queries=queries,
                                 seq_len=T, img_size=img, num_classes=16)
    eps = [src.sample() for _ in range(E)]
    batch = stack_episodes([
        Episode(support_images=e.support_images,
                target_images=e.target_images,
                support_labels=e.support_labels,
                target_labels=e.support_labels[: e.target_images.shape[0]],
                real_support_labels=e.real_support_labels,
                real_target_labels=e.real_target_labels,
                batch_class_list=np.arange(way, dtype=np.int32))
        for e in eps])
    batch = jax.tree.map(jnp.asarray, batch)

    st = learner.state
    st, _ = learner._train_step(st, batch)          # compile step
    float(st.episode.astype(jnp.float32))
    r0 = rss_gb()
    t0 = time.perf_counter()
    for _ in range(args.steps):
        st, _ = learner._train_step(st, batch)
        float(st.episode.astype(jnp.float32))       # sync
    wall = time.perf_counter() - t0
    r1 = rss_gb()
    rec = {"arm": "donate" if donate else "no_donate",
           "rss_start_gb": round(r0, 2), "rss_end_gb": round(r1, 2),
           "gb_per_step": round((r1 - r0) / args.steps, 3),
           "eps_per_sec": round(args.steps * E / wall, 3)}
    print(json.dumps(rec), flush=True)
    return rec


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="ViT-B/16")
    p.add_argument("--steps", type=int, default=12)
    p.add_argument("--tasks-per-batch", type=int, default=4)
    p.add_argument("--img", type=int, default=224)
    p.add_argument("--seq-len", type=int, default=8)
    p.add_argument("--smoke", action="store_true",
                   help="CPU + test-tiny: exercises both arms in seconds "
                        "(donation is a no-op on CPU, so SAFE is expected)")
    args = p.parse_args(argv)
    if args.smoke:
        os.environ.setdefault("CLIPSPM_PLATFORM", "cpu")
        args.arch, args.img, args.seq_len = "test-tiny", 32, 2
        args.steps = min(args.steps, 6)
    from clipspm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    platform = os.environ.get("CLIPSPM_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)

    base = run_arm(False, args)
    don = run_arm(True, args)
    # a leaking backend grows by ~the donated tree's size each step; use
    # half the no-donate arm's growth + 50 MB as the noise floor
    thresh = max(0.05, 2 * abs(base["gb_per_step"]))
    leaks = don["gb_per_step"] > thresh
    print(json.dumps({
        "verdict": "LEAKS — keep SOLVER.DONATE_STATE off" if leaks
        else "SAFE — donation frees buffers on this platform",
        "donate_gb_per_step": don["gb_per_step"],
        "no_donate_gb_per_step": base["gb_per_step"],
        "threshold_gb": round(thresh, 3),
    }))
    return 1 if leaks else 0


if __name__ == "__main__":
    raise SystemExit(main())
