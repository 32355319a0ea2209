"""SOLVER.ACCUM_DTYPE: bf16 gradient accumulation vs the fp32 default.

The accumulated train step (reference protocol: run/main_run.py:193-210)
sums per-episode gradients over TASKS_PER_BATCH. 'bfloat16' halves the
scan-carried accumulator bytes (the profiled 16.5% select_add slice of the
train step); the optimizer update stays fp32. This is opt-in non-parity:
the test bounds the drift against the fp32 path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipspm_tpu.data import SyntheticEpisodeSource
from clipspm_tpu.models.backbones.clip import CLIP_ARCHS
from clipspm_tpu.models.fsar import CLIPSPMModel
from clipspm_tpu.train.learner import Learner
from clipspm_tpu.utils.config import ConfigNode, SPM_DEFAULT_PARAMS

WAY, SHOT, Q, T, IMG = 2, 1, 2, 4, 32


def _learner(accum):
    cfg = ConfigNode({
        "MODEL": {"NAME": "clipspm", "BACKBONE": "test-tiny", "SEED": 0},
        "TRAIN": {"WAY": WAY, "SHOT": SHOT, "TASKS_PER_BATCH": 4},
        "SOLVER": {"LR": 1e-3, "WEIGHT_DECAY": 5e-5, "LR_SCH": 1000,
                   "OPTIM_METHOD": "adam", "ACCUM_DTYPE": accum},
        "DATA": {"SEQ_LEN": T, "IMG_SIZE": IMG, "DATASET": "hmdb"},
    })
    arch = CLIP_ARCHS["test-tiny"]
    model = CLIPSPMModel(arch=arch, way=WAY, shot=SHOT,
                         spm=SPM_DEFAULT_PARAMS["hmdb"])
    src = SyntheticEpisodeSource(way=WAY, shot=SHOT, queries=Q, seq_len=T,
                                 img_size=IMG + 8, num_classes=8, seed=3)
    D = arch.embed_dim
    # init at the POST-transform geometry (the learner's device transform
    # crops IMG+8 -> IMG before the backbone)
    dummy = (jnp.zeros((WAY * SHOT, T, IMG, IMG, 3), jnp.float32),
             jnp.zeros((WAY * Q, T, IMG, IMG, 3), jnp.float32),
             jnp.arange(WAY * SHOT, dtype=jnp.int32) % WAY,
             jnp.zeros((WAY * SHOT,), jnp.int32),
             jnp.zeros((WAY * Q,), jnp.int32),
             jnp.zeros((8, D)), jnp.zeros((8, D)))
    variables = model.init(jax.random.PRNGKey(0), *dummy)
    text = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (8, D), jnp.float32))
    return Learner(cfg, model, variables, text_train=text, text_test=text), src


def test_bf16_accum_close_to_fp32_and_rejects_garbage():
    lf, src = _learner("float32")
    lb, _ = _learner("bfloat16")
    eps = [SyntheticEpisodeSource(way=WAY, shot=SHOT, queries=Q, seq_len=T,
                                  img_size=IMG + 8, num_classes=8,
                                  seed=10 + i).sample() for i in range(4)]
    mf = lf.train_episodes(eps)
    mb = lb.train_episodes(eps)
    # same episodes, same init: metrics computed pre-update must agree
    np.testing.assert_allclose(mf["loss"], mb["loss"], rtol=1e-5)
    # post-update params close. On step 1 Adam's update is exactly
    # +/-LR per element (m/sqrt(v) = g/|g|), so a bf16 rounding that flips
    # the sign of a near-zero gradient element moves that element by up to
    # 2*LR — the hard ceiling; the aggregate drift must be far smaller.
    lr = 1e-3
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(lf.state.params),
            jax.tree_util.tree_leaves_with_path(lb.state.params)):
        assert pa == pb
        d = np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))
        assert np.max(d) <= 2.0 * lr + 1e-6, jax.tree_util.keystr(pa)
        assert np.mean(d) < 0.2 * lr, jax.tree_util.keystr(pa)

    with pytest.raises(ValueError, match="ACCUM_DTYPE"):
        _learner("float16")
