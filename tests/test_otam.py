"""OTAM kernel tests: wavefront vs. a float64 numpy DP oracle.

The oracle re-derives the recurrence of the reference's band-restricted OTAM
(reference: models/myRes.py:821-855) in plain numpy, independent of the JAX
implementation, so both formulations are cross-checked.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipspm_tpu.ops import (frame_distance_cos, otam_cum_dist,
                             otam_cum_dist_unrolled, otam_distance)


def numpy_otam_oracle(dists, lbda):
    """Naive float64 double-loop DP mirroring models/myRes.py:821-855."""
    d = np.asarray(dists, dtype=np.float64)
    d = np.pad(d, [(0, 0)] * (d.ndim - 2) + [(0, 0), (1, 1)])
    C = np.zeros_like(d)
    L, M = d.shape[-2], d.shape[-1]
    for m in range(1, M):
        C[..., 0, m] = d[..., 0, m] + C[..., 0, m - 1]
    for l in range(1, L):
        C[..., l, 1] = d[..., l, 1] - lbda * np.log(
            np.exp(-C[..., l - 1, 0] / lbda)
            + np.exp(-C[..., l - 1, 1] / lbda)
            + np.exp(-C[..., l, 0] / lbda))
        for m in range(2, M - 1):
            C[..., l, m] = d[..., l, m] - lbda * np.log(
                np.exp(-C[..., l - 1, m - 1] / lbda)
                + np.exp(-C[..., l, m - 1] / lbda))
        C[..., l, M - 1] = d[..., l, M - 1] - lbda * np.log(
            np.exp(-C[..., l - 1, M - 2] / lbda)
            + np.exp(-C[..., l - 1, M - 1] / lbda)
            + np.exp(-C[..., l, M - 2] / lbda))
    return C[..., -1, -1]


@pytest.mark.parametrize("lbda", [0.5, 0.1])
@pytest.mark.parametrize("shape", [(3, 4, 8, 8), (2, 8, 8), (5, 6), (1, 1, 4, 7)])
def test_wavefront_matches_numpy_oracle(lbda, shape):
    rng = np.random.default_rng(0)
    dists = rng.uniform(0.0, 2.0, size=shape).astype(np.float32)
    got = np.asarray(otam_cum_dist(jnp.asarray(dists), lbda))
    want = numpy_otam_oracle(dists, lbda)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("lbda", [0.5, 0.1])
def test_wavefront_matches_unrolled(lbda):
    rng = np.random.default_rng(1)
    dists = jnp.asarray(rng.uniform(0.0, 2.0, size=(4, 5, 8, 8)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(otam_cum_dist(dists, lbda)),
        np.asarray(otam_cum_dist_unrolled(dists, lbda)),
        rtol=2e-5, atol=2e-5)


def test_large_cumulative_values_stay_finite():
    # the naive formulation underflows at lbda=0.1 for large tables; the
    # stabilized softmin must not.
    dists = jnp.full((1, 16, 16), 2.0, dtype=jnp.float32)
    out = otam_cum_dist(dists, lbda=0.1)
    assert np.isfinite(np.asarray(out)).all()


def test_gradients_finite_and_nonzero():
    rng = np.random.default_rng(2)
    dists = jnp.asarray(rng.uniform(0.1, 1.9, size=(2, 3, 8, 8)), jnp.float32)

    def loss(d):
        return jnp.sum(otam_cum_dist(d, 0.5))

    g = jax.grad(loss)(dists)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0


def test_gradient_matches_finite_differences():
    rng = np.random.default_rng(3)
    dists = rng.uniform(0.2, 1.8, size=(1, 4, 4)).astype(np.float32)

    def loss(d):
        return jnp.sum(otam_cum_dist(d, 0.5))

    g = np.asarray(jax.grad(loss)(jnp.asarray(dists)))
    eps = 1e-3
    for idx in [(0, 0, 0), (0, 1, 2), (0, 3, 3), (0, 2, 1)]:
        dp = dists.copy(); dp[idx] += eps
        dm = dists.copy(); dm[idx] -= eps
        fd = (float(loss(jnp.asarray(dp))) - float(loss(jnp.asarray(dm)))) / (2 * eps)
        np.testing.assert_allclose(g[idx], fd, rtol=5e-2, atol=5e-3)


def test_frame_distance_cos_epsilon_form():
    # the reference divides by (|x||y| + 0.01) (models/myRes.py:756-765)
    rng = np.random.default_rng(4)
    q = rng.normal(size=(3, 4, 16)).astype(np.float32)
    s = rng.normal(size=(2, 4, 16)).astype(np.float32)
    got = np.asarray(frame_distance_cos(jnp.asarray(q), jnp.asarray(s)))
    qf = q.reshape(-1, 16); sf = s.reshape(-1, 16)
    num = qf @ sf.T
    den = (np.linalg.norm(qf, axis=-1, keepdims=True)
           @ np.linalg.norm(sf, axis=-1, keepdims=True).T + 0.01)
    want = (1 - num / den).reshape(3, 4, 2, 4).transpose(0, 2, 1, 3)
    # f32 matmul accumulation order differs between XLA and numpy
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)
    assert got.shape == (3, 2, 4, 4)


def test_otam_distance_shapes_and_symmetry():
    rng = np.random.default_rng(5)
    su = jnp.asarray(rng.normal(size=(5, 8, 32)), jnp.float32)
    qu = jnp.asarray(rng.normal(size=(20, 8, 32)), jnp.float32)
    d_bi = otam_distance(su, qu, bidirectional=True)
    d_uni = otam_distance(su, qu, bidirectional=False)
    assert d_bi.shape == (20, 5)
    assert d_uni.shape == (20, 5)
    # bidirectional >= unidirectional is not guaranteed, but both positive here
    assert np.isfinite(np.asarray(d_bi)).all()
    # identical videos should have the smallest self-distance on the diagonal
    d_self = np.asarray(otam_distance(qu[:5], qu[:5]))
    assert (np.argmin(d_self, axis=1) == np.arange(5)).all()
