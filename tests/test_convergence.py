"""Convergence: every head can LEARN, not just run.

Round-1 coverage proved forward parity at random weights; this file proves
the training signal works end-to-end for each of the ten heads: tiny
backbone, class-separable synthetic episodes (each class has a distinct
mean brightness), a few hundred training episodes on CPU, then eval
accuracy must decisively beat chance (50% at 2-way).

This is the test the reference itself never had (SURVEY §4: no test suite;
its only integration signal is the 10k-episode GPU eval,
reference: run/main_run.py:256-293). A head whose loss is mis-signed, whose
stop-gradients are wrong, or whose dropout RNG is misused fails here even
though forward parity passes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipspm_tpu.data import SyntheticEpisodeSource
from clipspm_tpu.models.backbones.clip import CLIP_ARCHS
from clipspm_tpu.models.fsar import build_model
from clipspm_tpu.train.learner import Learner, TransformSpec
from clipspm_tpu.utils.config import ConfigNode, SPM_DEFAULT_PARAMS

WAY, SHOT, QUERIES, T, IMG, NCLS = 2, 1, 2, 4, 32, 4
TPB = 8          # episodes per optimizer step
EVAL_EPISODES = 40
THRESHOLD = 80.0  # percent; chance is 50.0

CLIP_HEADS = {"clipspm", "clipfsar", "cpm2c", "sten"}

# per-head MODEL overrides (mirroring each head's shipped config keys) and
# a (steps, lr) training budget tuned to the slowest learner in the family
HEAD_SPECS = {
    # clipspm needs the gentler LR: at 1e-3 the aux-distance term wins and
    # episodic accuracy stalls at chance (measured in the round-2 sweep)
    "clipspm": dict(model={}, steps=50, lr=3e-4),
    "clipfsar": dict(model={"USE_CLASSIFICATION": True,
                            "USE_CLASSIFICATION_VALUE": 1.5},
                     steps=30, lr=1e-3),
    "cpm2c": dict(model={"USE_CLASSIFICATION": True,
                         "USE_CLASSIFICATION_VALUE": 1.5,
                         "MOTION_COFF": 0.5, "NORMAL_COFF": 0.5},
                  steps=30, lr=1e-3),
    "sten": dict(model={}, steps=30, lr=1e-3),
    "otam": dict(model={}, steps=30, lr=1e-3),
    "trx": dict(model={"TEMP_SET": [2], "TRANS_LINEAR_OUT_DIM": 64,
                       "TRANS_DROPOUT": 0.1},
                steps=30, lr=1e-3),
    "strm": dict(model={"TEMP_SET": [2], "TRANS_LINEAR_OUT_DIM": 64,
                        "TRANS_DROPOUT": 0.1},
                 steps=30, lr=1e-3),
    "molo": dict(model={"USE_CLASSIFICATION": True,
                        "USE_CLASSIFICATION_VALUE": 0.6,
                        "USE_CONTRASTIVE": True,
                        "USE_CONTRASTIVE_COFF": 0.05,
                        "RECONS_COFF": 0.05},
                 steps=30, lr=1e-3),
    "soap": dict(model={"TEMP_SET": [2], "TRANS_LINEAR_OUT_DIM": 64,
                        "TRANS_DROPOUT": 0.1, "O": [2, 3], "cr": 4},
                 steps=30, lr=1e-3),
    "ta2n": dict(model={"METRIC": "cos", "DROPOUT": 0.1},
                 steps=30, lr=1e-3),
}


def make_cfg(name: str) -> ConfigNode:
    spec = HEAD_SPECS[name]
    backbone = "test-tiny" if name in CLIP_HEADS else "test-tiny-resnet"
    return ConfigNode({
        "MODEL": {"NAME": name, "BACKBONE": backbone, "SEED": 0,
                  **spec["model"]},
        "TRAIN": {"WAY": WAY, "SHOT": SHOT, "QUERY_PER_CLASS": QUERIES,
                  "TASKS_PER_BATCH": TPB,
                  "TRAIN_EPISODES": spec["steps"] * TPB,
                  "VAL_FREQ": 10 ** 6, "PRINT_FREQ": 10 ** 6},
        "TEST": {"QUERY_PER_CLASS": QUERIES, "TEST_EPISODES": EVAL_EPISODES},
        "DATA": {"DATASET": "synthetic", "IMG_SIZE": IMG, "SEQ_LEN": T,
                 "NUM_CLASS": NCLS},
        "SOLVER": {"LR": spec["lr"], "LR_SCH": 10 ** 6,
                   "OPTIM_METHOD": "adam", "WEIGHT_DECAY": 1e-5,
                   "MOMENTUM": 0.9},
        "USE_AMP": False,
        "params": SPM_DEFAULT_PARAMS["hmdb"],
    })


def build_learner(name: str) -> Learner:
    cfg = make_cfg(name)
    model = build_model(cfg)
    if name in CLIP_HEADS:
        dim = CLIP_ARCHS["test-tiny"].embed_dim
    else:
        dim = 8  # unused by non-CLIP heads; table just needs a valid shape
    S, Q = WAY * SHOT, WAY * QUERIES
    dummy = (
        jnp.zeros((S, T, IMG, IMG, 3), jnp.float32),
        jnp.zeros((Q, T, IMG, IMG, 3), jnp.float32),
        jnp.arange(S, dtype=jnp.int32) % WAY,
        jnp.zeros((S,), jnp.int32),
        jnp.zeros((Q,), jnp.int32),
        jnp.zeros((NCLS, dim), jnp.float32),
        jnp.zeros((NCLS, dim), jnp.float32),
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        *dummy, train=False)
    # near-orthogonal class-text directions (stand-in for CLIP text feats)
    text = np.asarray(
        jax.random.normal(jax.random.PRNGKey(2), (NCLS, dim)), np.float32)
    train_src = SyntheticEpisodeSource(
        way=WAY, shot=SHOT, queries=QUERIES, seq_len=T, img_size=IMG + 8,
        num_classes=NCLS, seed=0)
    test_src = SyntheticEpisodeSource(
        way=WAY, shot=SHOT, queries=QUERIES, seq_len=T, img_size=IMG + 8,
        num_classes=NCLS, seed=123)
    spec = TransformSpec(img_size=IMG, resize_to=IMG + 8, flip=True)
    return Learner(cfg, model, variables, train_source=train_src,
                   test_source=test_src, text_train=text, text_test=text,
                   transform=spec, log_fn=lambda *_: None)


@pytest.mark.parametrize("name", sorted(HEAD_SPECS))
def test_head_converges(name):
    learner = build_learner(name)
    steps = HEAD_SPECS[name]["steps"]
    it = iter(learner.train_source)
    last = None
    for _ in range(steps):
        last = learner.train_episodes([next(it) for _ in range(TPB)])
    assert np.isfinite(last["loss"]), last
    res = learner.evaluate(EVAL_EPISODES, batch_size=8)
    assert res["accuracy"] >= THRESHOLD, (
        f"{name}: eval accuracy {res['accuracy']:.1f}% after "
        f"{steps * TPB} episodes (chance 50%) — head failed to learn")
