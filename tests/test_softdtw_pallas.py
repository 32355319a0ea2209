"""Pallas SoftDTW kernel vs. the XLA wavefront (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipspm_tpu.ops.softdtw import softdtw_from_dists
from clipspm_tpu.ops.softdtw_pallas import softdtw_from_dists_pallas


@pytest.mark.parametrize("gamma,bandwidth", [(1.0, 0.0), (0.1, 0.0),
                                             (0.5, 2.0)])
@pytest.mark.parametrize("shape", [(4, 8, 8), (3, 10, 6), (140, 8, 8)])
def test_matches_wavefront(gamma, bandwidth, shape):
    rng = np.random.default_rng(0)
    D = jnp.asarray(rng.uniform(0.0, 2.0, size=shape), jnp.float32)
    got = np.asarray(softdtw_from_dists_pallas(D, gamma, bandwidth,
                                               interpret=True))
    want = np.asarray(softdtw_from_dists(D, gamma, bandwidth))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_gradients_match_wavefront():
    rng = np.random.default_rng(1)
    D = jnp.asarray(rng.uniform(0.1, 1.9, size=(5, 8, 8)), jnp.float32)
    g_p = jax.grad(lambda d: jnp.sum(
        softdtw_from_dists_pallas(d, 0.5, interpret=True)))(D)
    g_r = jax.grad(lambda d: jnp.sum(softdtw_from_dists(d, 0.5)))(D)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_r),
                               rtol=2e-4, atol=2e-4)
