"""Auxiliary loss utilities vs. the reference torch implementations
(reference: utils/utils.py:148-243)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from clipspm_tpu.train.losses import (ff_mi_loss, fy_mi_loss,  # noqa: E402
                                      label_smoothing, task_confusion,
                                      yy_mi_loss)


def test_label_smoothing_matches_lsr():
    labels = np.asarray([1, 3, 0], np.int32)
    got = np.asarray(label_smoothing(jnp.asarray(labels), class_num=5,
                                     factor=0.1))
    one_hot = torch.zeros(3, 5)
    one_hot.scatter_add_(1, torch.from_numpy(labels).long().view(3, 1),
                         torch.full((3, 1), 0.9))
    want = (one_hot + 0.1 / 5).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_fy_mi_loss_matches_torch_kl():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(1, 4, 5)).astype(np.float32)
    labels = np.asarray([0, 2, 1, 4], np.int32)
    got = float(fy_mi_loss(jnp.asarray(logits), jnp.asarray(labels), way=5))
    f1 = torch.log_softmax(torch.from_numpy(logits[0]), dim=-1)
    f2 = F.one_hot(torch.from_numpy(labels).long(), num_classes=5).float()
    want = float(F.kl_div(f1, f2, reduction="batchmean"))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_yy_mi_loss_matches_torch_kl():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(1, 4, 5)).astype(np.float32)
    b = rng.normal(size=(1, 4, 5)).astype(np.float32)
    got = float(yy_mi_loss(jnp.asarray(a), jnp.asarray(b)))
    f1 = torch.log_softmax(torch.from_numpy(a[0]), dim=-1)
    f2 = torch.softmax(torch.from_numpy(b[0]), dim=-1)
    want = float(F.kl_div(f1, f2, reduction="batchmean"))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_ff_mi_loss_matches_torch_kl():
    rng = np.random.default_rng(2)
    f1 = rng.normal(size=(2, 3, 6, 4, 2, 2)).astype(np.float32)
    f2 = rng.normal(size=(2, 3, 6, 4, 2, 2)).astype(np.float32)
    got = float(ff_mi_loss(jnp.asarray(f1), jnp.asarray(f2)))
    t1 = torch.from_numpy(f1).mean(-1).mean(-1)
    t2 = torch.from_numpy(f2).mean(-1).mean(-1)
    B, T = 6, 4
    a = torch.log_softmax(t1.reshape(B, -1, T).permute(0, 2, 1), dim=-1)
    b = torch.softmax(t2.reshape(B, -1, T).permute(0, 2, 1), dim=-1)
    want = float(F.kl_div(a, b, reduction="none").sum(-1).sum(-1).mean())
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_task_confusion():
    logits = jnp.asarray(np.eye(3)[None] * 5.0, jnp.float32)
    classes = jnp.asarray([7, 11, 13], jnp.int32)
    got = np.asarray(task_confusion(logits, classes))
    np.testing.assert_array_equal(got, [7, 11, 13])
