"""Fused Pallas attention vs XLA attention (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipspm_tpu.ops.attention_pallas import _xla_attention, fused_attention


@pytest.mark.parametrize("shape", [(24, 197, 64), (7, 17, 64), (8, 16, 32)])
def test_matches_xla(shape):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=shape), jnp.float32)
    k = jnp.asarray(rng.normal(size=shape), jnp.float32)
    v = jnp.asarray(rng.normal(size=shape), jnp.float32)
    got = fused_attention(q, k, v, shape[-1] ** -0.5, True)
    want = _xla_attention(q, k, v, shape[-1] ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_gradients_match_xla():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(8, 16, 32)), jnp.float32)

    g1 = jax.grad(lambda q: fused_attention(q, q, q, 32 ** -0.5, True).sum())(q)
    g2 = jax.grad(lambda q: _xla_attention(q, q, q, 32 ** -0.5).sum())(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=2e-5, rtol=1e-4)


def test_vit_with_fused_attention_runs():
    import dataclasses

    from clipspm_tpu.models.backbones.clip import CLIP_ARCHS
    from clipspm_tpu.models.visual import make_clip_visual
    from clipspm_tpu.ops import attention_pallas

    # route the module through interpret mode on CPU
    orig = attention_pallas.fused_attention

    arch = dataclasses.replace(CLIP_ARCHS["test-tiny"], fused_attention=True)
    vit = make_clip_visual(arch)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    import unittest.mock as mock

    with mock.patch.object(
            attention_pallas, "fused_attention",
            lambda q, k, v, s, i=False: orig(q, k, v, s, True)):
        v = vit.init(jax.random.PRNGKey(0), x)
        out = vit.apply(v, x)
    assert out.shape == (2, arch.embed_dim)
    assert np.isfinite(np.asarray(out)).all()
