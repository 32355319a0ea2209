"""Pallas OTAM kernel vs. the XLA wavefront oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipspm_tpu.ops.otam import otam_cum_dist
from clipspm_tpu.ops.otam_pallas import otam_cum_dist_pallas


@pytest.mark.parametrize("lbda", [0.5, 0.1])
@pytest.mark.parametrize("shape", [(4, 5, 8, 8), (3, 8, 8), (200, 8, 8)])
def test_matches_wavefront(lbda, shape):
    rng = np.random.default_rng(0)
    dists = jnp.asarray(rng.uniform(0.0, 2.0, size=shape), jnp.float32)
    got = np.asarray(otam_cum_dist_pallas(dists, lbda, interpret=True))
    want = np.asarray(otam_cum_dist(dists, lbda))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_non_multiple_of_128_batch():
    rng = np.random.default_rng(1)
    dists = jnp.asarray(rng.uniform(0.0, 2.0, size=(130, 8, 8)), jnp.float32)
    got = np.asarray(otam_cum_dist_pallas(dists, 0.5, interpret=True))
    want = np.asarray(otam_cum_dist(dists, 0.5))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_gradients_match_wavefront():
    rng = np.random.default_rng(2)
    dists = jnp.asarray(rng.uniform(0.1, 1.9, size=(6, 8, 8)), jnp.float32)

    g_pallas = jax.grad(
        lambda d: jnp.sum(otam_cum_dist_pallas(d, 0.5, interpret=True)))(dists)
    g_ref = jax.grad(lambda d: jnp.sum(otam_cum_dist(d, 0.5)))(dists)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_ref),
                               rtol=2e-4, atol=2e-4)
