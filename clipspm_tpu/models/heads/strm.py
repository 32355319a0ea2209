"""STRM head: spatio-temporal enrichment + TRX-style matching.

(reference: models/model_strm.py) Patch-level self-attention over 4x4
adaptive-max patches (``Self_Attn_Bot``, :315-376), MLP-Mixer-style frame
enrichment (``MLP_Mix_Enrich``, :378-415), TRX TemporalCrossTransformer on
enriched frames, plus a tuple-level min-cdist metric on pre-enrichment
features (``DistanceLoss``, :44-125) returned as ``logits_post_pat``.

The reference seeds global RNGs at import time (:15-18 — SURVEY §2.8 defect
8); here determinism comes from explicit PRNG keys only.
"""

from __future__ import annotations

from itertools import combinations
from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..backbones.resnet import TorchResNet
from ..blocks import group_by_class
from ..visual import encode_chunked
from .trx import TemporalCrossTransformer, trx_positional_table

Dtype = Any


def adaptive_max_pool_2d(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """torch AdaptiveMaxPool2d semantics on [..., H, W, C]
    (region i spans [floor(i*H/out), ceil((i+1)*H/out)))."""
    H, W = x.shape[-3], x.shape[-2]
    rows = []
    for i in range(out_h):
        h0, h1 = (i * H) // out_h, -(-((i + 1) * H) // out_h)
        cols = []
        for j in range(out_w):
            w0, w1 = (j * W) // out_w, -(-((j + 1) * W) // out_w)
            cols.append(jnp.max(x[..., h0:h1, w0:w1, :], axis=(-3, -2)))
        rows.append(jnp.stack(cols, axis=-2))
    return jnp.stack(rows, axis=-3)


class SelfAttnBot(nn.Module):
    """Patch self-attention + gamma gate + 3-layer bottleneck MLP
    (reference: models/model_strm.py:315-376)."""
    dim: int
    seq_len: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        # x: [B, N, D]
        pe = jnp.asarray(trx_positional_table(int(self.seq_len * 1.5),
                                              self.dim))
        x = x + pe[None, : x.shape[1]].astype(x.dtype)
        x = nn.Dropout(0.1, deterministic=deterministic)(x)
        residual = x
        q = nn.Dense(self.dim, dtype=self.dtype, name="query_proj")(x)
        k = nn.Dense(self.dim, dtype=self.dtype, name="key_proj")(x)
        v = nn.Dense(self.dim, dtype=self.dtype, name="value_conv")(x)
        attn = jax.nn.softmax(
            jnp.einsum("bnd,bmd->bnm", q, k,
                       preferred_element_type=jnp.float32), axis=-1)
        out = jnp.einsum("bnm,bmd->bnd", attn.astype(v.dtype), v)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        out = gamma.astype(out.dtype) * out + residual
        # 3-layer bottleneck MLP with residual (reference :296-313)
        h = nn.relu(nn.Dense(self.dim // 2, dtype=self.dtype, name="inp_fc")(out))
        h = nn.relu(nn.Dense(self.dim // 2, dtype=self.dtype, name="hid_fc")(h))
        h = nn.Dense(self.dim, dtype=self.dtype, name="out_fc")(h)
        return h + out


class MLPMixEnrich(nn.Module):
    """Token-MLP across frames + bottleneck MLP across channels
    (reference: models/model_strm.py:378-415)."""
    dim: int
    seq_len: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        pe = jnp.asarray(trx_positional_table(int(self.seq_len * 1.5),
                                              self.dim))
        x = x + pe[None, : x.shape[1]].astype(x.dtype)
        x = nn.Dropout(0.1, deterministic=deterministic)(x)
        residual1 = x
        # token MLP over the frame axis (reference :255-277)
        h = jnp.swapaxes(x, -1, -2)
        h = nn.relu(nn.Dense(self.seq_len, dtype=self.dtype, name="tok_inp")(h))
        h = nn.Dense(self.seq_len, dtype=self.dtype, name="tok_out")(h)
        out = jnp.swapaxes(h, -1, -2) + residual1
        residual2 = out
        h = nn.relu(nn.Dense(self.dim, dtype=self.dtype, name="bot_inp")(out))
        h = nn.Dense(self.dim, dtype=self.dtype, name="bot_out")(h)
        return h + residual2


class TupleDistanceLoss(nn.Module):
    """Query-class min-cdist on tuple embeddings
    (reference: models/model_strm.py:44-125), vectorized over classes."""
    way: int
    shot: int
    seq_len: int
    in_dim: int
    set_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, support, support_labels, queries, *,
                 deterministic: bool = True) -> jnp.ndarray:
        tuples = np.asarray(
            list(combinations(range(self.seq_len), self.set_size)))
        nt = len(tuples)
        drop = nn.Dropout(0.1, deterministic=deterministic)
        support = drop(support)
        queries = drop(queries)

        def to_tuples(x):
            g = x[:, tuples.reshape(-1), :]
            return g.reshape(x.shape[0], nt, self.set_size * self.in_dim)

        clsW = nn.Dense(self.in_dim // 2, dtype=self.dtype, name="clsW")
        qe = nn.relu(clsW(to_tuples(queries))).astype(jnp.float32)
        se = nn.relu(clsW(to_tuples(support))).astype(jnp.float32)
        ce = group_by_class(se, support_labels, self.way, self.shot)
        ce = ce.reshape(self.way, self.shot * nt, -1)

        # euclidean cdist [way, Q*nt, shot*nt]
        d2 = (jnp.sum(qe.reshape(-1, qe.shape[-1]) ** 2, -1)[None, :, None]
              + jnp.sum(ce ** 2, -1)[:, None, :]
              - 2.0 * jnp.einsum("qd,wsd->wqs",
                                 qe.reshape(-1, qe.shape[-1]), ce))
        dist = jnp.sqrt(jnp.maximum(d2, 1e-12))
        Qn = queries.shape[0]
        min_dist = dist.min(axis=-1).reshape(self.way, Qn, nt)
        return (-min_dist.mean(axis=-1)).T       # [Q, way]


class STRMModel(nn.Module):
    """(reference: models/model_strm.py:417-516)"""
    way: int
    shot: int
    seq_len: int = 8
    temp_set: Sequence[int] = (2,)
    out_dim: int = 1152
    arch: str = "resnet50"
    backbone_width: int = 64
    num_patches_side: int = 4
    dropout: float = 0.1
    dtype: Dtype = jnp.float32
    backbone_override: Any = None
    # eval-time VMEM-friendly chunked encode (visual.encode_chunked)
    encode_chunk: int = 0

    def setup(self):
        self.backbone = self.backbone_override or TorchResNet(arch=self.arch, output="spatial",
                                    width=self.backbone_width,
                                    dtype=self.dtype, name="backbone")
        in_dim = self.backbone.feature_dim
        n_patches = self.num_patches_side ** 2
        self.attn_pat = SelfAttnBot(dim=in_dim, seq_len=n_patches,
                                    dtype=self.dtype, name="attn_pat")
        self.fr_enrich = MLPMixEnrich(dim=in_dim, seq_len=self.seq_len,
                                      dtype=self.dtype, name="fr_enrich")
        self.transformers = [
            TemporalCrossTransformer(
                way=self.way, shot=self.shot, seq_len=self.seq_len,
                in_dim=in_dim, out_dim=self.out_dim, set_size=s,
                dropout=self.dropout, dtype=self.dtype, name=f"tct_{s}")
            for s in self.temp_set]
        self.dist_losses = [
            TupleDistanceLoss(way=self.way, shot=self.shot,
                              seq_len=self.seq_len, in_dim=in_dim,
                              set_size=s, dtype=self.dtype, name=f"tdl_{s}")
            for s in self.temp_set]

    def __call__(self, support_images, target_images, support_labels,
                 real_support_labels=None, real_target_labels=None,
                 text_train=None, text_test=None, *,
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        det = not train
        S, T = support_images.shape[:2]
        Q = target_images.shape[0]
        both = jnp.concatenate(
            [support_images.reshape((S * T,) + support_images.shape[2:]),
             target_images.reshape((Q * T,) + target_images.shape[2:])],
            axis=0).astype(self.dtype)
        fmap = encode_chunked(self.backbone, both, self.encode_chunk,
                              train=train)   # [N, h, w, D]
        fmap = adaptive_max_pool_2d(fmap, self.num_patches_side,
                                    self.num_patches_side)
        N, ph, pw, D = fmap.shape
        patches = fmap.reshape(N, ph * pw, D)
        patches = self.attn_pat(patches, deterministic=det)
        frames = patches.mean(axis=1)                          # [N, D]
        su = frames[: S * T].reshape(S, T, D)
        qu = frames[S * T:].reshape(Q, T, D)
        return self.match_features(su, qu, support_labels,
                                   real_support_labels, real_target_labels,
                                   text_train, text_test, train=train)

    def feature_cacheable(self) -> bool:
        """The patch-attended frame features are per-video (attn_pat mixes
        patches WITHIN a frame only), so they fully determine this head's
        inputs (train/feature_cache.py)."""
        return True

    def encode(self, images, *, train: bool = False) -> jnp.ndarray:
        """``[N, T, H, W, 3]`` frames -> ``[N, T, D]`` patch-attended frame
        features: backbone -> adaptive-max-pool -> patch self-attention ->
        patch mean. Everything here is per-frame (hence per-video), making
        it the cacheable pixel->feature stage of :meth:`__call__`."""
        det = not train
        N, T = images.shape[:2]
        flat = images.reshape((N * T,) + images.shape[2:]).astype(self.dtype)
        fmap = encode_chunked(self.backbone, flat, self.encode_chunk,
                              train=train)   # [N*T, h, w, D]
        fmap = adaptive_max_pool_2d(fmap, self.num_patches_side,
                                    self.num_patches_side)
        n, ph, pw, D = fmap.shape
        patches = self.attn_pat(fmap.reshape(n, ph * pw, D),
                                deterministic=det)
        return patches.mean(axis=1).reshape(N, T, D)

    def match_features(self, su, qu, support_labels,
                       real_support_labels=None, real_target_labels=None,
                       text_train=None, text_test=None, *,
                       train: bool = False) -> Dict[str, jnp.ndarray]:
        """Head over precomputed frame features ``su [S,T,D]`` /
        ``qu [Q,T,D]`` (the post-encode tail of :meth:`__call__`)."""
        det = not train
        post_pat = jnp.stack(
            [d(su, support_labels, qu, deterministic=det)
             for d in self.dist_losses], axis=-1).mean(axis=-1)

        su_fr = self.fr_enrich(su, deterministic=det)
        qu_fr = self.fr_enrich(qu, deterministic=det)
        logits = jnp.stack(
            [t(su_fr, support_labels, qu_fr, deterministic=det)
             for t in self.transformers], axis=-1).mean(axis=-1)

        return {"logits": logits[None], "logits_post_pat": post_pat[None]}
