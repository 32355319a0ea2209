"""STEN head: minimal CLIP baseline.

(reference: models/model_sten.py:11-103) Mean-pooled frame features; class
prototypes of visual features and of single-prompt text features; logits =
softmax(cos(q, text_proto)) * softmax(cos(q, visual_proto)).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..backbones.clip import CLIPArch
from ..blocks import class_prototypes, cos_sim
from ..visual import encode_chunked, make_clip_visual

Dtype = Any


class STENModel(nn.Module):
    arch: CLIPArch
    way: int
    shot: int
    dtype: Dtype = jnp.float32
    backbone_override: Any = None
    # eval-time VMEM-friendly chunked encode (visual.encode_chunked)
    encode_chunk: int = 0
    # remat-chunked training encode (ViT only; see visual.encode_chunked)
    train_encode_chunk: int = 0   # 0=off, True/1=eval width, >1=width
    train_remat_policy: str = "full"  # "full"|"dots"|"attn"|"attn_out" (visual.encode_chunked)

    def setup(self):
        self.backbone = (self.backbone_override
                         or make_clip_visual(self.arch, dtype=self.dtype,
                                             name="backbone"))

    def __call__(self, support_images, target_images, support_labels,
                 real_support_labels, real_target_labels,
                 text_train, text_test, *,
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        S, T = support_images.shape[:2]
        Q = target_images.shape[0]
        both = jnp.concatenate(
            [support_images.reshape((S * T,) + support_images.shape[2:]),
             target_images.reshape((Q * T,) + target_images.shape[2:])],
            axis=0).astype(self.dtype)
        feats = encode_chunked(self.backbone, both, self.encode_chunk,
                               train=train,
                               train_chunk=self.train_encode_chunk,
                               remat_policy=self.train_remat_policy)
        D = feats.shape[-1]
        su = feats[: S * T].reshape(S, T, D)
        qu = feats[S * T:].reshape(Q, T, D)
        return self.match_features(su, qu, support_labels,
                                   real_support_labels, real_target_labels,
                                   text_train, text_test, train=train)

    def feature_cacheable(self) -> bool:
        return True

    def encode(self, images, *, train: bool = False) -> jnp.ndarray:
        """``[N, T, H, W, 3]`` -> ``[N, T, D]`` (train/feature_cache.py)."""
        N, T = images.shape[:2]
        flat = images.reshape((N * T,) + images.shape[2:]).astype(self.dtype)
        feats = encode_chunked(self.backbone, flat, self.encode_chunk,
                               train=train,
                               train_chunk=self.train_encode_chunk,
                               remat_policy=self.train_remat_policy)
        return feats.reshape(N, T, feats.shape[-1])

    def match_features(self, su, qu, support_labels,
                       real_support_labels, real_target_labels,
                       text_train, text_test, *,
                       train: bool = False) -> Dict[str, jnp.ndarray]:
        """Head over precomputed features (post-encode tail of
        :meth:`__call__`)."""
        su_f = su.mean(axis=1)
        qu_f = qu.mean(axis=1)

        table = text_train if train else text_test
        t_f = table[real_support_labels].astype(jnp.float32)     # [S, D]
        t_proto = class_prototypes(t_f, support_labels, self.way)
        s_proto = class_prototypes(su_f.astype(jnp.float32), support_labels,
                                   self.way)
        sim_qt = jax.nn.softmax(cos_sim(qu_f.astype(jnp.float32), t_proto),
                                axis=-1)
        sim_qs = jax.nn.softmax(cos_sim(qu_f.astype(jnp.float32), s_proto),
                                axis=-1)
        return {"logits": (sim_qt * sim_qs)[None]}
