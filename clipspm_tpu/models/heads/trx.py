"""TRX head: Temporal-Relational CrossTransformers.

(reference: models/model_TRX.py:14-192) Frame tuples of the cardinalities in
``MODEL.TEMP_SET`` (default [2, 3]: C(8,2)=28, C(8,3)=56 tuples), per-class
cross-attention building query-specific prototypes, negative scaled squared
distance as logits, averaged over cardinalities.

TPU-first: the per-class python loop + in-place logits writes (reference:
models/model_TRX.py:89-120) become one einsum over a ``[way, shot, ...]``
class-grouped tensor — no dynamic gathers, everything static.
"""

from __future__ import annotations

import math
from itertools import combinations
from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..backbones.resnet import TorchResNet
from ..blocks import group_by_class
from ..visual import encode_chunked

Dtype = Any


def trx_positional_table(max_len: int, d_model: int,
                         scale: float = 0.1) -> np.ndarray:
    """(reference: models/model_TRX.py:14-27 — sin/cos with pe_scale_factor)."""
    pos = np.arange(max_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64)
                 * -(math.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model))
    pe[:, 0::2] = np.sin(pos * div) * scale
    pe[:, 1::2] = np.cos(pos * div) * scale
    return pe.astype(np.float32)


class TemporalCrossTransformer(nn.Module):
    """(reference: models/model_TRX.py:35-124)"""
    way: int
    shot: int
    seq_len: int
    in_dim: int
    out_dim: int
    set_size: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, support, support_labels, queries, *,
                 deterministic: bool = True) -> jnp.ndarray:
        """support: [S, T, D]; queries: [Q, T, D] -> logits [Q, way]."""
        tuples = np.asarray(
            list(combinations(range(self.seq_len), self.set_size)))
        nt = len(tuples)

        pe = jnp.asarray(
            trx_positional_table(int(self.seq_len * 1.5), self.in_dim))
        drop = nn.Dropout(self.dropout, deterministic=deterministic)
        support = drop(support + pe[None, : self.seq_len].astype(support.dtype))
        queries = drop(queries + pe[None, : self.seq_len].astype(queries.dtype))

        def to_tuples(x):
            # [N, T, D] -> [N, nt, set_size*D]
            g = x[:, tuples.reshape(-1), :]
            return g.reshape(x.shape[0], nt, self.set_size * self.in_dim)

        s_t = to_tuples(support)
        q_t = to_tuples(queries)

        k_linear = nn.Dense(self.out_dim, dtype=self.dtype, name="k_linear")
        v_linear = nn.Dense(self.out_dim, dtype=self.dtype, name="v_linear")
        norm_k = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm_k")

        s_k = norm_k(k_linear(s_t)).astype(jnp.float32)
        q_k = norm_k(k_linear(q_t)).astype(jnp.float32)
        s_v = v_linear(s_t).astype(jnp.float32)
        q_v = v_linear(q_t).astype(jnp.float32)

        # class-grouped keys/values: [way, shot, nt, od]
        c_k = group_by_class(s_k, support_labels, self.way, self.shot)
        c_v = group_by_class(s_v, support_labels, self.way, self.shot)

        # scores per (class, query tuple, class-support tuple)
        scores = jnp.einsum("qtd,wsud->wqtsu", q_k, c_k,
                            preferred_element_type=jnp.float32)
        scores = scores / math.sqrt(self.out_dim)
        Qn = q_k.shape[0]
        scores = scores.reshape(self.way, Qn, nt, self.shot * nt)
        attn = jax.nn.softmax(scores, axis=-1)  # over all class tuples
        attn = attn.reshape(self.way, Qn, nt, self.shot, nt)
        proto = jnp.einsum("wqtsu,wsud->wqtd", attn, c_v)

        diff = q_v[None] - proto                      # [way, Q, nt, od]
        norm_sq = jnp.sum(diff * diff, axis=(-2, -1))
        return (-(norm_sq / nt)).T                    # [Q, way]


class TRXModel(nn.Module):
    """(reference: models/model_TRX.py:141-180)"""
    way: int
    shot: int
    seq_len: int = 8
    temp_set: Sequence[int] = (2, 3)
    out_dim: int = 1152
    arch: str = "resnet50"
    backbone_width: int = 64
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    backbone_override: Any = None
    # eval-time VMEM-friendly chunked encode (visual.encode_chunked)
    encode_chunk: int = 0

    def setup(self):
        self.backbone = self.backbone_override or TorchResNet(arch=self.arch, output="pooled",
                                    width=self.backbone_width,
                                    dtype=self.dtype, name="backbone")
        in_dim = self.backbone.feature_dim
        self.transformers = [
            TemporalCrossTransformer(
                way=self.way, shot=self.shot, seq_len=self.seq_len,
                in_dim=in_dim, out_dim=self.out_dim, set_size=s,
                dropout=self.dropout, dtype=self.dtype, name=f"tct_{s}")
            for s in self.temp_set]

    def __call__(self, support_images, target_images, support_labels,
                 real_support_labels=None, real_target_labels=None,
                 text_train=None, text_test=None, *,
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        S, T = support_images.shape[:2]
        Q = target_images.shape[0]
        both = jnp.concatenate(
            [support_images.reshape((S * T,) + support_images.shape[2:]),
             target_images.reshape((Q * T,) + target_images.shape[2:])],
            axis=0).astype(self.dtype)
        feats = encode_chunked(self.backbone, both, self.encode_chunk,
                               train=train)
        D = feats.shape[-1]
        su = feats[: S * T].reshape(S, T, D)
        qu = feats[S * T:].reshape(Q, T, D)
        return self.match_features(su, qu, support_labels,
                                   real_support_labels, real_target_labels,
                                   text_train, text_test, train=train)

    def feature_cacheable(self) -> bool:
        """Per-video pooled frame features fully determine this head's
        inputs (train/feature_cache.py)."""
        return True

    def encode(self, images, *, train: bool = False) -> jnp.ndarray:
        """``[N, T, H, W, 3]`` frames -> ``[N, T, D]`` pooled frame features
        (the cacheable pixel->feature stage of :meth:`__call__`)."""
        N, T = images.shape[:2]
        flat = images.reshape((N * T,) + images.shape[2:]).astype(self.dtype)
        feats = encode_chunked(self.backbone, flat, self.encode_chunk,
                               train=train)
        return feats.reshape(N, T, feats.shape[-1])

    def match_features(self, su, qu, support_labels,
                       real_support_labels=None, real_target_labels=None,
                       text_train=None, text_test=None, *,
                       train: bool = False) -> Dict[str, jnp.ndarray]:
        """Head over precomputed features ``su [S,T,D]`` / ``qu [Q,T,D]``
        (the post-encode tail of :meth:`__call__`)."""
        logits = [t(su, support_labels, qu, deterministic=not train)
                  for t in self.transformers]
        logits = jnp.stack(logits, axis=-1).mean(axis=-1)
        return {"logits": logits[None]}
