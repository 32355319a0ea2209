"""Dynamic int8 matmul for the eval path (opt-in: ``MODEL.INT8_EVAL``).

The v5e MXU runs int8 at ~1.7x its bf16 rate (measured on this chip:
251 vs 145 TOP/s on 8192^3 chained matmuls, requantize included). This
module provides a drop-in ``Int8Dense`` whose parameter tree is identical
to ``nn.Dense`` ("kernel" [K, M], "bias" [M]) so the same checkpoint /
imported CLIP weights drive either path; quantization happens per call:

    y = (sx . sw) * (q(x) @ q(w)),  int32 accumulation on the MXU

with per-row symmetric activation scales ``sx = max|x_row| / 127`` and
per-output-channel weight scales ``sw = max|w_col| / 127`` — standard
dynamic weight+activation quantization (no calibration data needed).

Eval-only by construction: ``jnp.round`` has zero gradient, so the heads
select this path only when ``train=False`` (see
backbones/clip.py:ResidualAttentionBlock). Accuracy impact on real
checkpoints is NOT validated in this environment (no weights/datasets —
README "Known limitations"); the measurable proxy is the logit agreement
test in tests/test_int8_eval.py.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def int8_matmul(x: jnp.ndarray, kernel: jnp.ndarray,
                bias: jnp.ndarray | None = None) -> jnp.ndarray:
    """``x @ kernel (+ bias)`` with dynamic int8 quantization.

    x: ``[..., K]`` float; kernel: ``[K, M]`` float; returns ``[..., M]``
    in ``x.dtype``.
    """
    xf = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0,
                     1e-8)
    xq = jnp.round(xf / sx).astype(jnp.int8)
    wf = kernel.astype(jnp.float32)
    sw = jnp.maximum(jnp.max(jnp.abs(wf), axis=0, keepdims=True) / 127.0,
                     1e-8)
    wq = jnp.round(wf / sw).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx * sw
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


class Int8Dense(nn.Module):
    """``nn.Dense`` with the matmul in dynamic int8 (same param tree)."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return int8_matmul(x, kernel, bias)
