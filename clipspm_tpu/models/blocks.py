"""Shared model-building blocks used by the matching heads.

These are fresh flax implementations of the block family the reference keeps
in ``models/myRes.py:605-1100`` (Transformer_v1/v2, Attention/Attention_qkv,
FeedForward/Mlp, PreNorm wrappers, sinusoidal positional encoders) plus the
episodic metric utilities (cos_sim, class prototypes). Everything is
static-shape and dtype-polymorphic (bf16 compute on TPU, f32 params).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


def cos_sim(x: jnp.ndarray, y: jnp.ndarray, epsilon: float = 0.01) -> jnp.ndarray:
    """Cosine similarity over the last dim with epsilon in the denominator
    (reference: models/myRes.py:756-765)."""
    num = jnp.matmul(x, jnp.swapaxes(y, -1, -2))
    xn = jnp.linalg.norm(x, axis=-1, keepdims=True)
    yn = jnp.linalg.norm(y, axis=-1, keepdims=True)
    den = jnp.matmul(xn, jnp.swapaxes(yn, -1, -2)) + epsilon
    return num / den


def class_prototypes(features: jnp.ndarray, labels: jnp.ndarray,
                     way: int) -> jnp.ndarray:
    """Per-class mean of support features.

    Replaces the reference's dynamic ``unique``/``index_select`` gather
    (reference: models/model_clipspm.py:133-137) with a fixed-shape
    ``segment_sum``: episode labels are always ``0..way-1`` with a constant
    count per class, so the reduction is static for XLA.

    Args:
        features: ``[S, ...]`` support features.
        labels: ``[S]`` int episode-relative labels in ``[0, way)``.
    Returns:
        ``[way, ...]`` prototypes ordered by class id (matching the sorted
        order ``torch.unique`` produces).
    """
    labels = labels.astype(jnp.int32)
    sums = jax.ops.segment_sum(features, labels, num_segments=way)
    counts = jax.ops.segment_sum(jnp.ones((features.shape[0],), features.dtype),
                                 labels, num_segments=way)
    shape = (way,) + (1,) * (features.ndim - 1)
    return sums / counts.reshape(shape)


def group_by_class(features: jnp.ndarray, labels: jnp.ndarray,
                   way: int, shot: int) -> jnp.ndarray:
    """Gather support features into ``[way, shot, ...]`` class-major order.

    Static-shape equivalent of the reference's per-class ``index_select``
    stack (reference: models/model_clipspm.py:277-281). Within a class,
    entries follow their original order in ``features``.
    """
    labels = labels.astype(jnp.int32)
    order = jnp.argsort(labels, stable=True)
    gathered = jnp.take(features, order, axis=0)
    return gathered.reshape((way, shot) + features.shape[1:])


class FeedForward(nn.Module):
    """Linear-GELU-Dropout-Linear-Dropout (reference: models/myRes.py:984-996)."""
    dim: int
    hidden_dim: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


class Mlp(nn.Module):
    """fc1-act-drop-fc2-drop (reference: models/myRes.py:859-875)."""
    hidden_features: int
    out_features: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = nn.Dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(self.out_features, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


class AttentionQKV(nn.Module):
    """Multi-head cross-attention with separate q/k/v projections and no
    projection biases (reference: models/myRes.py:944-982)."""
    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, *, deterministic: bool = True):
        inner = self.heads * self.dim_head
        scale = self.dim_head ** -0.5
        project_out = not (self.heads == 1 and self.dim_head == self.dim)

        qp = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(q)
        kp = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(k)
        vp = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(v)

        def split(t):
            b, n, _ = t.shape
            return t.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        qh, kh, vh = split(qp), split(kp), split(vp)
        attn = jnp.einsum("bhid,bhjd->bhij", qh, kh,
                          preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(attn, axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, vh)
        b, _, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        if project_out:
            out = nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)
            out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        return out


class SelfAttention(nn.Module):
    """Fused-QKV multi-head self-attention (reference: models/myRes.py:877-905)."""
    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        inner = self.heads * self.dim_head
        scale = self.dim_head ** -0.5
        project_out = not (self.heads == 1 and self.dim_head == self.dim)
        qkv = nn.Dense(inner * 3, use_bias=False, dtype=self.dtype,
                       name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            b, n, _ = t.shape
            return t.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q), split(k), split(v)
        attn = jnp.einsum("bhid,bhjd->bhij", qh, kh,
                          preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(attn, axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, vh)
        b, _, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        if project_out:
            out = nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)
            out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        return out


class TransformerV1(nn.Module):
    """Pre-norm cross-attention block: ``attn(LN(q), LN(k), LN(v)) + q`` then
    ``FF(x) + x`` (reference: models/myRes.py:1033-1075). Layers beyond the
    first run self-attention on the running value.
    """
    dim: int
    heads: int = 8
    dim_head_k: int = 256
    mlp_dim: int = 2048
    dropout_atte: float = 0.05
    dropout_ffn: float = 0.05
    depth: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, *, deterministic: bool = True):
        x = q
        for i in range(self.depth):
            ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm_{i}")
            attn = AttentionQKV(self.dim, heads=self.heads,
                                dim_head=self.dim_head_k,
                                dropout=self.dropout_atte, dtype=self.dtype,
                                name=f"attn_{i}")
            ff = FeedForward(self.dim, self.mlp_dim, dropout=self.dropout_ffn,
                             dtype=self.dtype, name=f"ff_{i}")
            if i == 0:
                x = attn(ln(q), ln(k), ln(v), deterministic=deterministic) + q
            else:
                x = attn(ln(x), ln(x), ln(x), deterministic=deterministic) + x
            x = ff(x, deterministic=deterministic) + x
        return x


class TransformerV2(nn.Module):
    """Pre-norm self-attention block (reference: models/myRes.py:1077-1100)."""
    dim: int
    heads: int = 8
    dim_head_k: int = 256
    mlp_dim: int = 2048
    dropout_atte: float = 0.05
    dropout_ffn: float = 0.05
    depth: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        for i in range(self.depth):
            ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm_{i}")
            attn = SelfAttention(self.dim, heads=self.heads,
                                 dim_head=self.dim_head_k,
                                 dropout=self.dropout_atte, dtype=self.dtype,
                                 name=f"attn_{i}")
            ff = FeedForward(self.dim, self.mlp_dim, dropout=self.dropout_ffn,
                             dtype=self.dtype, name=f"ff_{i}")
            x = attn(ln(x), deterministic=deterministic) + x
            x = ff(x, deterministic=deterministic) + x
        return x


def sinusoidal_positions(seq_len: int, dim: int) -> np.ndarray:
    """The reference's loop-built sinusoid (reference: models/myRes.py:605-622,
    same loop as model_molo.py:173-188): even channel ``i`` uses
    ``sin(pos/10000^(2i/d))`` with ``i`` the channel index itself (not a pair
    index), odd channel ``i+1`` uses ``cos(pos/10000^(2(i+1)/d))``. Built
    vectorized instead of the reference's python loops.
    """
    pos = np.arange(seq_len, dtype=np.float64)[:, None]
    i = np.arange(0, dim, 2, dtype=np.float64)[None, :]
    table = np.zeros((seq_len, dim), dtype=np.float64)
    table[:, 0::2] = np.sin(pos / np.power(10000.0, 2 * i / dim))
    n_odd = table[:, 1::2].shape[1]
    table[:, 1::2] = np.cos(
        pos / np.power(10000.0, 2 * (i[:, :n_odd] + 1) / dim))
    return table.astype(np.float32)


class PositionalEncoder(nn.Module):
    """``x * sqrt(D / A) + B * PE`` then dropout
    (reference: models/myRes.py:605-632)."""
    dim: int
    max_len: int = 20
    scale_a: float = 10.0
    scale_b: float = 1.0
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        table = jnp.asarray(sinusoidal_positions(self.max_len, self.dim))
        x = x * jnp.sqrt(jnp.asarray(self.dim / self.scale_a, x.dtype))
        x = x + self.scale_b * table[: x.shape[-2]].astype(x.dtype)
        return nn.Dropout(self.dropout, deterministic=deterministic)(x)
