"""Experimental/dormant blocks from the reference inventory.

None of these are used by any shipped head (SURVEY §2.4: ``Attention_v3``,
``mo_1/mo_2/mo_2_2``, ``t_group``, ``GroupGLKA`` are dead code in the
reference); they are provided so the component inventory is complete and the
experiments remain reproducible. All reference line refs into
``models/myRes.py``.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .blocks import (PositionalEncoder, TransformerV1, class_prototypes,
                     cos_sim)
from .heads.otam import cosine_similarity_rows

Dtype = Any


class AttentionV3(nn.Module):
    """Un-headed qkv cross-attention (reference :907-942): no head split,
    single einsum over the full inner dim."""
    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, *, deterministic: bool = True):
        inner = self.heads * self.dim_head
        scale = self.dim_head ** -0.5
        qp = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(q)
        kp = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(k)
        vp = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(v)
        attn = jax.nn.softmax(
            jnp.einsum("bid,bjd->bij", qp, kp,
                       preferred_element_type=jnp.float32) * scale, axis=-1)
        out = jnp.einsum("bij,bjd->bid", attn.astype(vp.dtype), vp)
        if not (self.heads == 1 and self.dim_head == self.dim):
            out = nn.Dense(self.dim, dtype=self.dtype, name="to_out")(out)
            out = nn.Dropout(self.dropout,
                             deterministic=deterministic)(out)
        return out


class Mo1(nn.Module):
    """Motion-token experiment v1 (reference :479-500): a learned token
    cross-attended by time-mean video features; class-mean cosine dists."""
    dim: int = 2048
    way: int = 5
    seq_len: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, qu, su, su_labels, *, deterministic: bool = True):
        mo = self.param("mo", nn.initializers.uniform(1.0), (1, 1, self.dim))
        trans = TransformerV1(dim=self.dim, dtype=self.dtype, name="trans")
        qu_v = qu.reshape(-1, self.seq_len, self.dim).mean(1)[None]
        su_v = su.reshape(-1, self.seq_len, self.dim).mean(1)[None]
        mo_q = trans(qu_v, mo, mo, deterministic=deterministic)[0]
        mo_s = trans(su_v, mo, mo, deterministic=deterministic)[0]
        mo_s = class_prototypes(mo_s, su_labels, self.way)
        dist = 1 - cos_sim(mo_q, mo_s)
        return -jax.nn.softmax(dist, axis=-1)[None]


class Mo2(nn.Module):
    """Motion-token experiment v2 (reference :502-536): token refined by
    frame-difference cross-attention."""
    dim: int = 2048
    way: int = 5
    seq_len: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, qu, su, su_labels, *, deterministic: bool = True):
        mo = self.param("mo", nn.initializers.uniform(1.0), (1, 1, self.dim))
        t1 = TransformerV1(dim=self.dim, dropout_atte=0.2, dtype=self.dtype,
                           name="trans_1")
        t2 = TransformerV1(dim=self.dim, dropout_atte=0.2, dtype=self.dtype,
                           name="trans_2")
        qu = qu.reshape(-1, self.seq_len, self.dim)
        su = su.reshape(-1, self.seq_len, self.dim)
        mo_q = t1(qu.mean(1)[None], mo, mo,
                  deterministic=deterministic)[0][:, None, :]
        mo_s = t1(su.mean(1)[None], mo, mo,
                  deterministic=deterministic)[0][:, None, :]
        diff_q = qu[:, 1:] - qu[:, :-1]
        diff_s = su[:, 1:] - su[:, :-1]
        mo_q = t2(mo_q, diff_q, diff_q, deterministic=deterministic)[:, 0]
        mo_s = t2(mo_s, diff_s, diff_s, deterministic=deterministic)[:, 0]
        sim = cosine_similarity_rows(mo_q.astype(jnp.float32),
                                     mo_s.astype(jnp.float32))
        class_sim = class_prototypes(sim.T, su_labels, self.way).T
        return jax.nn.softmax(class_sim, axis=-1)[None]


class Mo22(nn.Module):
    """Motion-gating experiment (reference :538-568): frames scaled by a
    relu'd motion token."""
    dim: int = 2048
    seq_len: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, qu, su, *, deterministic: bool = True):
        mo = self.param("mo", nn.initializers.uniform(1.0), (1, 1, self.dim))
        t1 = TransformerV1(dim=self.dim, dropout_atte=0.2, dtype=self.dtype,
                           name="trans_1")
        t2 = TransformerV1(dim=self.dim, dropout_atte=0.2, dtype=self.dtype,
                           name="trans_2")
        qu = qu.reshape(-1, self.seq_len, self.dim)
        su = su.reshape(-1, self.seq_len, self.dim)
        mo_q = t1(qu.mean(1)[None], mo, mo,
                  deterministic=deterministic)[0][:, None, :]
        mo_s = t1(su.mean(1)[None], mo, mo,
                  deterministic=deterministic)[0][:, None, :]
        diff_q = qu[:, 1:] - qu[:, :-1]
        diff_s = su[:, 1:] - su[:, :-1]
        mo_q = nn.relu(t2(mo_q, diff_q, diff_q, deterministic=deterministic))
        mo_s = nn.relu(t2(mo_s, diff_s, diff_s, deterministic=deterministic))
        return ((qu * mo_q).reshape(-1, self.dim),
                (su * mo_s).reshape(-1, self.dim))


class TGroup(nn.Module):
    """Grouped temporal window matching (reference :665-726): replicate-pad
    frames, 4 overlapping windows of 4, conv + transformer pooling, diagonal
    window-wise cosine distance, class-mean logits."""
    dim: int = 2048
    way: int = 5
    seq_len: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, qu, su, su_labels, *, deterministic: bool = True):
        pe = PositionalEncoder(dim=self.dim, scale_a=10.0, scale_b=1.0,
                               name="pe")
        trans = TransformerV1(dim=self.dim, dropout_atte=0.2, depth=2,
                              dtype=self.dtype, name="trans")
        conv1 = nn.Conv(self.dim, (1,), use_bias=False, dtype=self.dtype,
                        name="conv2_1")
        conv2 = nn.Conv(self.dim, (3,), padding=1, use_bias=False,
                        dtype=self.dtype, name="conv2_2")
        conv3 = nn.Conv(self.dim, (2,), padding=0, kernel_dilation=2,
                        use_bias=False, dtype=self.dtype, name="conv2_3")

        def windows(x):
            x = x.reshape(-1, self.seq_len, self.dim)
            x = jnp.concatenate([x[:, :1], x, x[:, -1:]], axis=1)  # replicate
            x = pe(x, deterministic=deterministic)
            w = jnp.stack([x[:, 2 * i: 2 * i + 4] for i in range(4)], axis=1)
            return w.reshape(-1, 4, self.dim)

        def pool(w):
            local = nn.relu(conv3(nn.relu(conv2(nn.relu(conv1(w))))))
            local = local.mean(axis=1)
            glob = nn.relu(trans(w, w, w,
                                 deterministic=deterministic)).mean(axis=1)
            return w.mean(axis=1) + local + glob

        qw, sw = windows(qu), windows(su)
        qp, sp = pool(qw), pool(sw)
        nq, ns = qu.reshape(-1, self.seq_len, self.dim).shape[0], \
            su.reshape(-1, self.seq_len, self.dim).shape[0]
        dist = 1 - cos_sim(qp.astype(jnp.float32), sp.astype(jnp.float32))
        dist = dist.reshape(nq, 4, ns, 4).transpose(0, 2, 1, 3)
        dist = jnp.trace(dist, axis1=-2, axis2=-1)           # diagonal sum
        class_dists = class_prototypes(dist.T, su_labels, self.way).T
        return -class_dists[None]


class PositionalEncoderV2(PositionalEncoder):
    """Odd-dimension-safe positional encoder (reference: models/myRes.py:
    634-663). Identical to ``PositionalEncoder`` here: the vectorized table
    in :func:`clipspm_tpu.models.blocks.sinusoidal_positions` already
    truncates the trailing cosine channel that the reference's v2 loop
    guards with ``if i + 1 == d_model: continue``."""


class GroupGLKA(nn.Module):
    """Multiscale large-kernel attention (reference :418-469): gated
    depthwise large-kernel convolution branches."""
    n_feats: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [N, H, W, C]
        c = self.n_feats
        third = c // 3
        ln = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")
        scale = self.param("scale", nn.initializers.zeros, (1, 1, 1, c))
        shortcut = x
        h = ln(x.astype(jnp.float32)).astype(x.dtype)
        h = nn.Conv(2 * c, (1, 1), dtype=self.dtype, name="proj_first")(h)
        a, h = jnp.split(h, 2, axis=-1)
        a1, a2, a3 = a[..., :third], a[..., third:2 * third], a[..., 2 * third:]

        def dw(ch, k, dil, name):
            return nn.Conv(ch, (k, k), padding=(k // 2) * dil,
                           kernel_dilation=dil, feature_group_count=ch,
                           dtype=self.dtype, name=name)

        def lka(ai, k1, k2, dil, tag):
            g = dw(ai.shape[-1], k1, 1, f"lka{tag}_0")(ai)
            g = dw(ai.shape[-1], k2, dil, f"lka{tag}_1")(g)
            g = nn.Conv(ai.shape[-1], (1, 1), dtype=self.dtype,
                        name=f"lka{tag}_2")(g)
            xg = dw(ai.shape[-1], k1, 1, f"x{tag}")(ai)
            return g * xg

        a = jnp.concatenate([lka(a1, 3, 5, 2, "3"), lka(a2, 5, 7, 3, "5"),
                             lka(a3, 7, 9, 4, "7")], axis=-1)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_last")(h * a)
        return out * scale.astype(out.dtype) + shortcut
