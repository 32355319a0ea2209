"""Per-model loss dispatch branches (reference: run/main_run.py:327-403)."""

import jax.numpy as jnp
import numpy as np
import pytest

from clipspm_tpu.train.losses import episodic_ce, loss_and_acc
from clipspm_tpu.utils.config import ConfigNode

WAY, Q, S, C = 3, 6, 6, 10
TPB = 16


def _logits(seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(1, Q, WAY)), jnp.float32)


LABELS = jnp.asarray([0, 1, 2, 0, 1, 2], jnp.int32)
REAL_S = jnp.asarray([1, 4, 7, 1, 4, 7], jnp.int32)
REAL_T = jnp.asarray([4, 1, 7, 4, 1, 7], jnp.int32)


def _cfg(extra_model=None, params=None):
    d = {"MODEL": {"NAME": "x"}, "TRAIN": {"TASKS_PER_BATCH": TPB}}
    cfg = ConfigNode(d)
    for k, v in (extra_model or {}).items():
        cfg.MODEL[k] = v
    if params:
        cfg.params = params
    return cfg


def test_default_branch_is_scaled_ce():
    logits = _logits()
    loss, acc = loss_and_acc("otam", {"logits": logits}, LABELS, REAL_S,
                             REAL_T, TPB)
    want = episodic_ce(logits, LABELS) / TPB
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-6)
    assert 0 <= float(acc) <= 1


def test_clipspm_adds_dists():
    logits = _logits()
    base, _ = loss_and_acc("clipspm", {"logits": logits, "dists": 0.0},
                           LABELS, REAL_S, REAL_T, TPB)
    plus, _ = loss_and_acc("clipspm", {"logits": logits,
                                       "dists": jnp.asarray(5.0)},
                           LABELS, REAL_S, REAL_T, TPB)
    np.testing.assert_allclose(float(plus) - float(base), 0.005, rtol=1e-5)


def test_strm_joint_logits():
    logits, post = _logits(1), _logits(2)
    loss, acc = loss_and_acc("strm", {"logits": logits,
                                      "logits_post_pat": post},
                             LABELS, REAL_S, REAL_T, TPB)
    want = (episodic_ce(logits + 0.1 * post, LABELS) / TPB
            + 0.1 * episodic_ce(post, LABELS) / TPB)
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-6)


def test_clipfsar_classification_term():
    cfg = _cfg({"USE_CLASSIFICATION_VALUE": 1.5})
    logits = _logits(3)
    class_logits = jnp.asarray(
        np.random.default_rng(4).normal(size=(1, S + Q, C)), jnp.float32)
    loss, _ = loss_and_acc("clipfsar", {"logits": logits,
                                        "class_logits": class_logits},
                           LABELS, REAL_S, REAL_T, TPB, cfg=cfg)
    both = jnp.concatenate([REAL_S, REAL_T])
    want = (episodic_ce(logits, LABELS)
            + 1.5 * episodic_ce(class_logits, both)) / TPB
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-6)


def test_soap_adds_t_loss():
    logits = _logits(5)
    loss, _ = loss_and_acc("soap", {"logits": logits,
                                    "t_loss": jnp.asarray(0.25)},
                           LABELS, REAL_S, REAL_T, TPB)
    want = episodic_ce(logits, LABELS) / TPB + 0.25
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-6)


def test_cpm2c_uses_model_lmd():
    cfg = _cfg({"LMD": [0.5, 1.0, 0.0]})
    local, glob = _logits(6), _logits(7)
    class_logits = jnp.asarray(
        np.random.default_rng(8).normal(size=(1, S + Q, C)), jnp.float32)
    outs = {"logits_local": local, "logits_global": glob,
            "class_logits": class_logits, "logits": local,
            "target_consist_distance": jnp.asarray(2.0)}
    both = jnp.concatenate([REAL_S, REAL_T])
    loss, acc = loss_and_acc("cpm2c", outs, LABELS, REAL_S, REAL_T, TPB,
                             cfg=cfg, train=True)
    want = (0.5 * episodic_ce(class_logits, both) / TPB
            + 1.0 * episodic_ce(local, LABELS) / TPB
            + 0.0 * episodic_ce(glob, LABELS) / TPB
            + 0.001 * 2.0)
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-6)
    # eval branch drops the consistency term
    loss_e, _ = loss_and_acc("cpm2c", outs, LABELS, REAL_S, REAL_T, TPB,
                             cfg=cfg, train=False)
    np.testing.assert_allclose(float(loss) - float(loss_e), 0.002, rtol=1e-4)


def test_molo_train_terms():
    cfg = _cfg({"USE_CLASSIFICATION_VALUE": 0.6, "USE_CONTRASTIVE_COFF": 0.05,
                "RECONS_COFF": 0.05})
    logits = _logits(9)
    rng = np.random.default_rng(10)
    outs = {"logits": logits,
            "class_logits": jnp.asarray(rng.normal(size=(1, S + Q, C)),
                                        jnp.float32),
            "logits_s2q": _logits(11), "logits_q2s": _logits(12),
            "logits_s2q_motion": _logits(13), "logits_q2s_motion": _logits(14),
            "loss_recons": jnp.asarray(0.5)}
    loss, _ = loss_and_acc("molo", outs, LABELS, REAL_S, REAL_T, TPB,
                           cfg=cfg, train=True)
    both = jnp.concatenate([REAL_S, REAL_T])
    want = ((episodic_ce(logits, LABELS) / TPB
             + 0.6 * episodic_ce(outs["class_logits"], both)) / TPB
            + 0.05 * episodic_ce(outs["logits_s2q"], LABELS) / TPB
            + 0.05 * episodic_ce(outs["logits_q2s"], LABELS) / TPB
            + 0.05 * episodic_ce(outs["logits_s2q_motion"], LABELS) / TPB
            + 0.05 * episodic_ce(outs["logits_q2s_motion"], LABELS) / TPB
            + 0.05 * 0.5)
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-6)
    # eval: only CE
    loss_e, _ = loss_and_acc("molo", outs, LABELS, REAL_S, REAL_T, TPB,
                             cfg=cfg, train=False)
    np.testing.assert_allclose(float(loss_e),
                               float(episodic_ce(logits, LABELS) / TPB),
                               rtol=1e-6)
