"""Training-gradient parity for the flagship head.

Same weights, same inputs: the reference's clipspm training loss
(CE(logits)/TASKS_PER_BATCH + 0.001*dists, reference: run/main_run.py:390-394
with utils.loss semantics) is backpropagated in torch and in jax, and the
gradients of representative parameters are compared. Validates the episodic
CE, the aux-distance path, and the whole head backward.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_DIR = "/root/reference/models"
WAY, SHOT, QUERIES, T = 2, 2, 2, 4
S, Q = WAY * SHOT, WAY * QUERIES
TPB = 16


def _torch_episodic_loss(logits, labels):
    """reference utils/utils.py:174-186 (sample dim logsumexp + sum)."""
    log_py = -torch.nn.functional.cross_entropy(
        logits[0], labels, reduction="none").unsqueeze(0)
    score = torch.logsumexp(log_py, dim=0) - torch.log(
        torch.tensor([float(log_py.shape[0])]))
    return -torch.sum(score)


def test_clipspm_training_gradient_parity():
    if not os.path.isdir(REF_DIR):
        pytest.skip("reference checkout not available")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_clipspm_parity import (_Cfg, _convert, _torch_head,
                                     ref_clipspm)
    import importlib

    # build the fixture manually (avoid pytest fixture plumbing)
    import test_clipspm_parity as tcp

    mod_fixture = tcp.ref_clipspm.__wrapped__  # the undecorated function
    ref_mod, dim = mod_fixture()

    import jax
    import jax.numpy as jnp

    from clipspm_tpu.models.heads.clipspm import CLIPSPM
    from clipspm_tpu.train.losses import loss_and_acc

    model, params = tcp._torch_head(ref_mod, dim)
    model.backbone = torch.nn.Identity()
    model = model.eval()  # dropout off; gradients still flow

    rng = np.random.default_rng(0)
    su = rng.normal(size=(S, T, dim)).astype(np.float32)
    qu = rng.normal(size=(Q, T, dim)).astype(np.float32)
    labels = np.asarray([0, 1, 0, 1], np.int32)
    real_sup = np.asarray([0, 2, 0, 2], np.int32)
    real_tgt = np.asarray([2, 0, 2, 0], np.int32)

    # torch backward
    out = model({
        "context_images": torch.from_numpy(su.reshape(S * T, dim)),
        "context_labels": torch.from_numpy(labels).float(),
        "target_images": torch.from_numpy(qu.reshape(Q * T, dim)),
        "real_support_labels": torch.from_numpy(real_sup).float(),
        "real_target_labels": torch.from_numpy(real_tgt).float(),
    })
    t_loss = (_torch_episodic_loss(out["logits"],
                                   torch.from_numpy(labels).long()) / TPB
              + 0.001 * out["dists"])
    t_loss.backward()
    want_grads = {
        "motion_conv1.weight": model.motion_conv1.weight.grad.numpy(),
        "gate_text.0.weight": model.gate_text[0].weight.grad.numpy(),
        "mo_alpha1": model.mo_alpha1.grad.numpy(),
    }

    # jax backward
    text_test = model.text_features_test.detach().numpy()
    head = CLIPSPM(dim=dim, way=WAY, shot=SHOT, spm=params)
    hp = tcp._convert(model)

    def loss_fn(p):
        outs = head.apply(
            {"params": p}, jnp.asarray(su), jnp.asarray(qu),
            jnp.asarray(labels),
            jnp.asarray(text_test[real_sup][:, None, :]),
            jnp.asarray(text_test[real_tgt][:, None, :]), train=False)
        loss, _ = loss_and_acc("clipspm", outs, jnp.asarray(labels),
                               jnp.asarray(real_sup), jnp.asarray(real_tgt),
                               TPB, cfg=None, train=True)
        return loss

    jloss, grads = jax.value_and_grad(loss_fn)(
        jax.tree.map(jnp.asarray, hp))

    np.testing.assert_allclose(float(jloss), float(t_loss.detach()),
                               rtol=1e-4, atol=1e-4)
    # conv kernel: torch [out, in, k] -> flax [k, in, out]
    np.testing.assert_allclose(
        np.asarray(grads["motion_conv1"]["kernel"]),
        want_grads["motion_conv1.weight"].transpose(2, 1, 0),
        atol=5e-5, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(grads["gate_text_fc1"]["kernel"]),
        want_grads["gate_text.0.weight"].T, atol=5e-5, rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(grads["mo_alpha1"]),
        want_grads["mo_alpha1"].reshape(()), atol=1e-5, rtol=1e-3)
