"""Chunked eval-time encode (visual.encode_chunked) is a pure execution-
strategy change: outputs must match the single-batch encode exactly.

The chunk width only regroups the frame batch fed to the backbone; every
per-frame computation (convs, norms, attention) is batch-independent at
eval time, so logits must agree to float tolerance for any chunk width,
including widths that do not divide the frame count (pad path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipspm_tpu.models.backbones.clip import CLIP_ARCHS
from clipspm_tpu.models.fsar import CLIPSPMModel
from clipspm_tpu.utils.config import SPM_DEFAULT_PARAMS


WAY, SHOT, Q, T = 2, 1, 1, 4   # frames: (2*1 + 2*1) * 4 = 16


def _episode(key, img=32):
    ks = jax.random.split(key, 2)
    sup = jax.random.uniform(ks[0], (WAY * SHOT, T, img, img, 3))
    tgt = jax.random.uniform(ks[1], (WAY * Q, T, img, img, 3))
    sup_l = jnp.arange(WAY * SHOT, dtype=jnp.int32) % WAY
    real = jnp.zeros((WAY * SHOT,), jnp.int32)
    realq = jnp.zeros((WAY * Q,), jnp.int32)
    text = jax.random.normal(jax.random.PRNGKey(7), (4, 32))
    return sup, tgt, sup_l, real, realq, text, text


def _logits(chunk, train=False):
    model = CLIPSPMModel(arch=CLIP_ARCHS["test-tiny"], way=WAY, shot=SHOT,
                         spm=SPM_DEFAULT_PARAMS["hmdb"], encode_chunk=chunk)
    ep = _episode(jax.random.PRNGKey(0))
    variables = CLIPSPMModel(
        arch=CLIP_ARCHS["test-tiny"], way=WAY, shot=SHOT,
        spm=SPM_DEFAULT_PARAMS["hmdb"]).init(jax.random.PRNGKey(1), *ep)
    out = model.apply(variables, *ep, train=train,
                      rngs={"dropout": jax.random.PRNGKey(2)})
    return np.asarray(out["logits"], np.float64)


@pytest.mark.parametrize("chunk", [4, 5, 16, 64])
def test_chunked_encode_matches_batched(chunk):
    ref = _logits(0)
    np.testing.assert_allclose(_logits(chunk), ref, rtol=2e-5, atol=2e-5)


def test_chunking_disabled_in_train_mode():
    # train-mode forward ignores the chunk width (BatchNorm batch statistics
    # and remat behavior must not depend on an eval-only execution knob)
    np.testing.assert_allclose(_logits(4, train=True), _logits(0, train=True),
                               rtol=1e-6, atol=1e-6)


def test_resnet_head_chunked():
    # chunking also applies to the torchvision-ResNet heads (running-average
    # BatchNorm at eval is per-sample, so chunking is exact there too)
    from clipspm_tpu.models.heads.otam import OTAMModel

    ep = _episode(jax.random.PRNGKey(3))[:5]
    outs = []
    for chunk in (0, 4):
        model = OTAMModel(way=WAY, shot=SHOT, arch="resnet18",
                          backbone_width=8, encode_chunk=chunk)
        variables = OTAMModel(way=WAY, shot=SHOT, arch="resnet18",
                              backbone_width=8).init(
            jax.random.PRNGKey(4), *ep, jnp.zeros((4, 1)), jnp.zeros((4, 1)))
        out = model.apply(variables, *ep, jnp.zeros((4, 1)), jnp.zeros((4, 1)),
                          train=False)
        outs.append(np.asarray(out["logits"], np.float64))
    np.testing.assert_allclose(outs[1], outs[0], rtol=2e-5, atol=2e-5)
