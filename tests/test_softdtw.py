"""SoftDTW tests vs. a float64 numpy oracle of the standard recurrence
(reference: models/OTAM.py:210-251)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipspm_tpu.ops import softdtw, softdtw_from_dists, pairwise_cos_dist


def numpy_softdtw_oracle(D, gamma, bandwidth=0.0):
    D = np.asarray(D, dtype=np.float64)
    B, N, M = D.shape
    R = np.full((B, N + 2, M + 2), np.inf)
    R[:, 0, 0] = 0.0
    for b in range(B):
        for j in range(1, M + 1):
            for i in range(1, N + 1):
                if 0 < bandwidth < abs(i - j):
                    continue
                r = np.array([-R[b, i - 1, j - 1], -R[b, i - 1, j],
                              -R[b, i, j - 1]]) / gamma
                rmax = r.max()
                R[b, i, j] = D[b, i - 1, j - 1] - gamma * (
                    np.log(np.exp(r - rmax).sum()) + rmax)
    return R[:, -2, -2]


@pytest.mark.parametrize("gamma", [1.0, 0.1])
@pytest.mark.parametrize("bandwidth", [0.0, 2.0])
def test_matches_numpy_oracle(gamma, bandwidth):
    rng = np.random.default_rng(0)
    D = rng.uniform(0.0, 2.0, size=(4, 8, 8)).astype(np.float32)
    got = np.asarray(softdtw_from_dists(jnp.asarray(D), gamma, bandwidth))
    want = numpy_softdtw_oracle(D, gamma, bandwidth)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_rectangular_tables():
    rng = np.random.default_rng(1)
    D = rng.uniform(0.0, 2.0, size=(2, 10, 6)).astype(np.float32)
    got = np.asarray(softdtw_from_dists(jnp.asarray(D), 0.5))
    want = numpy_softdtw_oracle(D, 0.5)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_normalize_self_distance_zero():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(3, 8, 16)), jnp.float32)
    d = softdtw(x, x, gamma=1.0, normalize=True)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-4)


def test_nonnormalized_matches_reference_padding_protocol():
    """The reference pads the query axis by a zero row on each side and
    averages forward/backward DPs (models/OTAM.py:414-423)."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 6, 8)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(2, 6, 8)), jnp.float32)
    got = np.asarray(softdtw(x, y, gamma=0.7))
    D_xy = np.asarray(pairwise_cos_dist(x, y))
    D_yx = np.asarray(pairwise_cos_dist(y, x))
    D_xy = np.pad(D_xy, ((0, 0), (1, 1), (0, 0)))
    D_yx = np.pad(D_yx, ((0, 0), (1, 1), (0, 0)))
    want = 0.5 * (numpy_softdtw_oracle(D_xy, 0.7)
                  + numpy_softdtw_oracle(D_yx, 0.7))
    np.testing.assert_allclose(got[:, 0], want, rtol=2e-4, atol=2e-4)


def test_gradients_finite():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, 8, 16)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(2, 8, 16)), jnp.float32)

    def loss(x):
        return jnp.sum(softdtw(x, y, gamma=0.5))

    g = np.asarray(jax.grad(loss)(x))
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0


def test_gradient_matches_finite_differences():
    rng = np.random.default_rng(5)
    D = rng.uniform(0.2, 1.8, size=(1, 5, 5)).astype(np.float32)

    def loss(d):
        return jnp.sum(softdtw_from_dists(d, 0.8))

    g = np.asarray(jax.grad(loss)(jnp.asarray(D)))
    eps = 1e-3
    for idx in [(0, 0, 0), (0, 2, 3), (0, 4, 4)]:
        dp = D.copy(); dp[idx] += eps
        dm = D.copy(); dm[idx] -= eps
        fd = (float(loss(jnp.asarray(dp))) - float(loss(jnp.asarray(dm)))) / (2 * eps)
        np.testing.assert_allclose(g[idx], fd, rtol=5e-2, atol=5e-3)
