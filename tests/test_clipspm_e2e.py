"""End-to-end slice: tiny CLIP-SPM model trains on synthetic episodes.

Covers the full loop the reference exercises only on real GPUs+data:
sample -> device transform -> backbone -> head -> loss -> optimizer step ->
eval (reference call stack: SURVEY §3.2). Runs hermetically on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipspm_tpu.data import SyntheticEpisodeSource
from clipspm_tpu.models.backbones.clip import CLIP_ARCHS
from clipspm_tpu.models.fsar import CLIPSPMModel
from clipspm_tpu.train.learner import Learner, TransformSpec
from clipspm_tpu.utils.config import ConfigNode, SPM_DEFAULT_PARAMS

WAY, SHOT, QUERIES, SEQ_LEN, IMG = 2, 1, 2, 3, 32


def tiny_cfg():
    return ConfigNode({
        "MODEL": {"NAME": "clipspm", "BACKBONE": "test-tiny", "SEED": 0},
        "TRAIN": {"WAY": WAY, "SHOT": SHOT, "QUERY_PER_CLASS": QUERIES,
                  "TASKS_PER_BATCH": 2, "TRAIN_EPISODES": 4,
                  "VAL_FREQ": 1000, "PRINT_FREQ": 1000},
        "TEST": {"QUERY_PER_CLASS": 1, "TEST_EPISODES": 4},
        "DATA": {"DATASET": "synthetic", "IMG_SIZE": IMG, "SEQ_LEN": SEQ_LEN},
        "SOLVER": {"LR": 1e-3, "LR_SCH": 10 ** 6, "OPTIM_METHOD": "adam",
                   "WEIGHT_DECAY": 1e-4, "MOMENTUM": 0.9},
        "USE_AMP": False,
        "params": SPM_DEFAULT_PARAMS["hmdb"],
    })


def build_tiny_learner(cfg):
    arch = CLIP_ARCHS["test-tiny"]
    model = CLIPSPMModel(arch=arch, way=WAY, shot=SHOT,
                         spm=dict(cfg.params))
    S, Q = WAY * SHOT, WAY * QUERIES
    D = arch.embed_dim
    dummy = (
        jnp.zeros((S, SEQ_LEN, IMG, IMG, 3), jnp.float32),
        jnp.zeros((Q, SEQ_LEN, IMG, IMG, 3), jnp.float32),
        jnp.zeros((S,), jnp.int32),
        jnp.zeros((S,), jnp.int32),
        jnp.zeros((Q,), jnp.int32),
        jnp.zeros((8, D), jnp.float32),
        jnp.zeros((8, D), jnp.float32),
    )
    variables = model.init(jax.random.PRNGKey(0), *dummy)
    n_classes = 8
    text = jax.random.normal(jax.random.PRNGKey(1), (n_classes, D))
    train_src = SyntheticEpisodeSource(way=WAY, shot=SHOT, queries=QUERIES,
                                       seq_len=SEQ_LEN, img_size=IMG + 8,
                                       num_classes=n_classes, seed=0)
    test_src = SyntheticEpisodeSource(way=WAY, shot=SHOT, queries=1,
                                      seq_len=SEQ_LEN, img_size=IMG + 8,
                                      num_classes=n_classes, seed=1)
    spec = TransformSpec(img_size=IMG, resize_to=IMG + 8, flip=True)
    return Learner(cfg, model, variables, train_source=train_src,
                   test_source=test_src, text_train=text, text_test=text,
                   transform=spec)


@pytest.fixture(scope="module")
def learner():
    return build_tiny_learner(tiny_cfg())


def test_forward_shapes_and_losses(learner):
    src = iter(learner.train_source)
    batch = [next(src), next(src)]
    metrics = learner.train_episodes(batch)
    assert np.isfinite(metrics["loss"])
    assert 0.0 <= metrics["acc"] <= 1.0
    assert int(learner.state.episode) == 2


def test_params_update_and_loss_moves(learner):
    before = jax.tree.leaves(learner.state.params)[0].copy()
    src = iter(learner.train_source)
    learner.train_episodes([next(src), next(src)])
    after = jax.tree.leaves(learner.state.params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_evaluate_protocol(learner):
    res = learner.evaluate(4)
    assert set(res) == {"accuracy", "confidence", "loss"}
    assert 0.0 <= res["accuracy"] <= 100.0
    assert np.isfinite(res["loss"])


def test_batched_eval_matches_sequential(learner):
    # same episodes through the vmapped batch path and the per-episode path
    eps = [learner.test_source.sample() for _ in range(4)]
    seq = learner.evaluate(4, source=iter(eps), batch_size=1)
    bat = learner.evaluate(4, source=iter(eps), batch_size=2)
    np.testing.assert_allclose(seq["accuracy"], bat["accuracy"], atol=1e-4)
    np.testing.assert_allclose(seq["loss"], bat["loss"], rtol=1e-4)


def test_logits_contract(learner):
    """Heads return logits [1, Q, way] (reference: models/model_clipspm.py:141)."""
    src = iter(learner.train_source)
    ep = jax.tree.map(jnp.asarray, next(src))
    outputs, _ = learner._apply(learner.state.params,
                                learner.state.batch_stats, ep,
                                jax.random.PRNGKey(0), train=False,
                                text_train=learner.state.text_train,
                                text_test=learner.state.text_test)
    assert outputs["logits"].shape == (1, WAY * QUERIES, WAY)
    assert np.isfinite(np.asarray(outputs["dists"]))
