"""Numerically stable soft-minimum primitives shared by the DP kernels.

The reference evaluates ``-lbda * log(sum(exp(-x / lbda)))`` directly
(reference: models/myRes.py:804-817, models/OTAM.py:60-78), which underflows
for large cumulative distances at small lambda. We evaluate the max-shifted
form, which is mathematically identical:

    smin(xs) = m - lbda * log(sum(exp(-(x - m) / lbda))),  m = min(xs)
"""

from __future__ import annotations

import jax.numpy as jnp


def softmin_pair(a: jnp.ndarray, b: jnp.ndarray, lbda: float) -> jnp.ndarray:
    m = jnp.minimum(a, b)
    return m - lbda * jnp.log(
        jnp.exp(-(a - m) / lbda) + jnp.exp(-(b - m) / lbda))


def softmin3(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray,
             lbda: float) -> jnp.ndarray:
    m = jnp.minimum(jnp.minimum(a, b), c)
    return m - lbda * jnp.log(
        jnp.exp(-(a - m) / lbda)
        + jnp.exp(-(b - m) / lbda)
        + jnp.exp(-(c - m) / lbda))


def softmin_stack(xs: jnp.ndarray, lbda: float, axis: int = 0) -> jnp.ndarray:
    m = jnp.min(xs, axis=axis, keepdims=True)
    out = m.squeeze(axis) - lbda * jnp.log(
        jnp.sum(jnp.exp(-(xs - m) / lbda), axis=axis))
    return out
