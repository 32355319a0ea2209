"""The pipelined train loop / evaluator must be a SCHEDULING change only.

Learner.run overlaps host staging with the device step (staging thread +
depth-1 metric fetch) and evaluate() stages batches on a thread; neither may
change what is computed: the same episode stream through run() must yield
bit-identical parameters and the same per-window means as stepping
train_episodes() serially, and evaluation must be deterministic and
pad-correct.
"""

import re

import jax
import numpy as np

from clipspm_tpu.data import SyntheticEpisodeSource
from clipspm_tpu.models.backbones.clip import CLIP_ARCHS
from clipspm_tpu.models.fsar import CLIPSPMModel
from clipspm_tpu.train.learner import Learner, TransformSpec
from clipspm_tpu.utils.config import ConfigNode, SPM_DEFAULT_PARAMS


def _make(way=2, shot=1, queries=2, T=2, img=24, tpb=2, seed=5):
    cfg = ConfigNode({
        "MODEL": {"NAME": "clipspm", "BACKBONE": "test-tiny", "SEED": 0},
        "TRAIN": {"WAY": way, "SHOT": shot, "QUERY_PER_CLASS": queries,
                  "TASKS_PER_BATCH": tpb, "TRAIN_EPISODES": 8,
                  "VAL_FREQ": 10 ** 6, "PRINT_FREQ": 4},
        "TEST": {"QUERY_PER_CLASS": queries, "TEST_EPISODES": 4},
        "DATA": {"DATASET": "synthetic", "IMG_SIZE": img, "SEQ_LEN": T},
        "SOLVER": {"LR": 3e-4, "LR_SCH": 10 ** 6, "OPTIM_METHOD": "adam",
                   "WEIGHT_DECAY": 1e-4, "MOMENTUM": 0.9},
        "params": SPM_DEFAULT_PARAMS["hmdb"],
    })
    arch = CLIP_ARCHS["test-tiny"]
    model = CLIPSPMModel(arch=arch, way=way, shot=shot,
                         spm=dict(cfg.params))
    src = SyntheticEpisodeSource(way=way, shot=shot, queries=queries,
                                 seq_len=T, img_size=img + 4, num_classes=4,
                                 seed=seed)
    test_src = SyntheticEpisodeSource(way=way, shot=shot, queries=queries,
                                      seq_len=T, img_size=img + 4,
                                      num_classes=4, seed=seed + 100)
    S = way * shot
    import jax.numpy as jnp
    D = arch.embed_dim
    text = np.random.default_rng(0).normal(size=(8, D)).astype(np.float32)
    dummy = (
        jnp.zeros((S, T, img, img, 3), jnp.float32),
        jnp.zeros((way * queries, T, img, img, 3), jnp.float32),
        jnp.arange(S, dtype=jnp.int32) % way,
        jnp.zeros((S,), jnp.int32),
        jnp.zeros((way * queries,), jnp.int32),
        jnp.asarray(text), jnp.asarray(text),
    )
    variables = model.init(jax.random.PRNGKey(0), *dummy)
    transform = TransformSpec(img_size=img, resize_to=img + 4)
    return cfg, model, variables, src, test_src, text, transform


def test_run_matches_serial_stepping():
    cfg, model, variables, src, test_src, text, tf = _make()
    logs = []
    piped = Learner(cfg, model, variables, train_source=src,
                    test_source=test_src, text_train=text, text_test=text,
                    transform=tf, log_fn=logs.append)
    piped.run(train_episodes=8, print_freq=4)

    # serial twin: same init, same seeded episode stream, stepped by hand
    src2 = SyntheticEpisodeSource(way=2, shot=1, queries=2, seq_len=2,
                                  img_size=28, num_classes=4, seed=5)
    serial = Learner(cfg, model, variables, text_train=text, text_test=text,
                     transform=tf)
    it = iter(src2)
    losses = [serial.train_episodes([next(it), next(it)])["loss"]
              for _ in range(4)]

    # bit-identical parameters after the same 4 optimizer steps
    for a, b in zip(jax.tree.leaves(piped.state.params),
                    jax.tree.leaves(serial.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(piped.state.episode) == 8

    # the printed window means must be the serial losses' window means
    means = [float(m) for m in re.findall(r"Train Loss: ([\d.]+)",
                                          "\n".join(logs))]
    assert len(means) == 2, logs
    np.testing.assert_allclose(means[0], np.mean(losses[:2]), rtol=1e-6)
    np.testing.assert_allclose(means[1], np.mean(losses[2:]), rtol=1e-6)


def test_evaluate_pipelined_deterministic_and_pad_correct():
    cfg, model, variables, src, test_src, text, tf = _make()
    learner = Learner(cfg, model, variables, train_source=src,
                      test_source=test_src, text_train=text, text_test=text,
                      transform=tf)
    # n_episodes=5 with batch_size=2: final batch is padded, pad trimmed
    r1 = learner.evaluate(5, source=SyntheticEpisodeSource(
        way=2, shot=1, queries=2, seq_len=2, img_size=28, num_classes=4,
        seed=9), batch_size=2)
    r2 = learner.evaluate(5, source=SyntheticEpisodeSource(
        way=2, shot=1, queries=2, seq_len=2, img_size=28, num_classes=4,
        seed=9), batch_size=2)
    assert r1 == r2
    # exactly 5 episodes counted: CI uses n=5
    r3 = learner.evaluate(5, source=SyntheticEpisodeSource(
        way=2, shot=1, queries=2, seq_len=2, img_size=28, num_classes=4,
        seed=9), batch_size=1)
    assert np.isfinite(r3["loss"])
    # batched vs single-episode eval agree on the same episode stream
    np.testing.assert_allclose(r1["accuracy"], r3["accuracy"], atol=1e-4)
    np.testing.assert_allclose(r1["loss"], r3["loss"], atol=1e-5)
