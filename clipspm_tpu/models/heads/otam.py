"""OTAM head: ResNet features + bidirectional OTAM DP matching.

(reference: models/model_otam.py — CNN_FSHead/CNN_OTAM, plus the ``mo_3``
motion-token module it instantiates from models/myRes.py:571-600.)

TPU-first notes: the OTAM DP is the wavefront kernel with lambda=0.1 (the
head-local copy in the reference, models/model_otam.py:96-126); the
class-mean over support instances is a static segment reduction; ``mo_3``'s
python loop over 8 frames becomes an unrolled static loop over the frame
axis (T is a compile-time constant).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.otam import otam_distance
from ..backbones.resnet import TorchResNet
from ..blocks import TransformerV1, class_prototypes
from ..visual import encode_chunked

Dtype = Any


def cosine_similarity_rows(x: jnp.ndarray, y: jnp.ndarray,
                           eps: float = 1e-8) -> jnp.ndarray:
    """Plain row-wise cosine similarity matrix [N, M]
    (reference: models/myRes.py:741-754 ``cosine_dist`` — despite the name it
    returns similarity, built from torch.cosine_similarity with norm clamp).
    """
    xn = jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)
    yn = jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), eps)
    return (x / xn) @ (y / yn).T


class MoTokens(nn.Module):
    """``mo_3`` spatial motion-token module (reference:
    models/myRes.py:571-600). Consumes backbone *spatial* maps."""
    dim: int
    tokens: int = 49
    way: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, qu_sp: jnp.ndarray, su_sp: jnp.ndarray,
                 su_labels: jnp.ndarray, *, deterministic: bool = True
                 ) -> jnp.ndarray:
        """qu_sp: [Q, T, tokens, D]; su_sp: [S, T, tokens, D] -> [1, Q, way]."""
        mo = self.param("mo", nn.initializers.xavier_normal(),
                        (1, self.tokens, self.dim))
        trans_1 = TransformerV1(dim=self.dim, dropout_atte=0.2,
                                dtype=self.dtype, name="trans_1")
        trans_2 = TransformerV1(dim=self.dim, dropout_atte=0.2,
                                dtype=self.dtype, name="trans_2")

        def refine(sp):
            # scalar mean per video scales the shared token bank
            m = mo.astype(sp.dtype) * sp.mean(axis=(1, 2, 3), keepdims=True)[:, 0]
            T = sp.shape[1]
            for i in range(T):
                m = trans_1(sp[:, i], m, m, deterministic=deterministic)
            m = trans_2(m, m, m, deterministic=deterministic)
            return m.mean(axis=1)

        mo_q = refine(qu_sp)
        mo_s = refine(su_sp)
        sim = cosine_similarity_rows(mo_q.astype(jnp.float32),
                                     mo_s.astype(jnp.float32))
        class_sim = class_prototypes(sim.T, su_labels, self.way).T  # [Q, way]
        prob = jax.nn.softmax(class_sim, axis=-1)
        return prob[None]


class OTAMModel(nn.Module):
    """CNN_OTAM (reference: models/model_otam.py:130-166)."""
    way: int
    shot: int
    arch: str = "resnet50"
    backbone_width: int = 64
    dtype: Dtype = jnp.float32
    backbone_override: Any = None
    # eval-time VMEM-friendly chunked encode (visual.encode_chunked)
    encode_chunk: int = 0
    # OTAM DP backend: "scan" or "pallas" (config key MODEL.OTAM_BACKEND)
    otam_backend: str = "scan"

    def setup(self):
        self.backbone = self.backbone_override or TorchResNet(arch=self.arch, output="spatial",
                                    width=self.backbone_width,
                                    dtype=self.dtype, name="backbone")
        dim = self.backbone.feature_dim
        self.mo = MoTokens(dim=dim, tokens=49, way=self.way,
                           dtype=self.dtype, name="mo")

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
        fmap = encode_chunked(self.backbone, both, self.encode_chunk,
                              train=train)   # [N, h, w, D]
        N, h, w, D = fmap.shape
        tokens = fmap.reshape(N, h * w, D)
        su_sp = tokens[: S * T].reshape(S, T, h * w, D)
        qu_sp = tokens[S * T:].reshape(Q, T, h * w, D)
        return self.match_features(su_sp, qu_sp, support_labels,
                                   real_support_labels, real_target_labels,
                                   text_train, text_test, train=train)

    def feature_cacheable(self) -> bool:
        """Per-video spatial tokens fully determine this head's inputs
        (train/feature_cache.py)."""
        return True

    def encode(self, images, *, train: bool = False) -> jnp.ndarray:
        """``[N, T, H, W, 3]`` frames -> ``[N, T, h*w, D]`` spatial tokens.

        The cacheable pixel->feature stage of :meth:`__call__` (BN runs on
        its running statistics at eval, so per-video tokens are independent
        of episode composition)."""
        N, T = images.shape[:2]
        flat = images.reshape((N * T,) + images.shape[2:]).astype(self.dtype)
        fmap = encode_chunked(self.backbone, flat, self.encode_chunk,
                              train=train)   # [N*T, h, w, D]
        h, w, D = fmap.shape[1:]
        return fmap.reshape(N, T, h * w, D)

    def match_features(self, su_sp, qu_sp, support_labels,
                       real_support_labels=None, real_target_labels=None,
                       text_train=None, text_test=None, *,
                       train: bool = False) -> Dict[str, jnp.ndarray]:
        """Head over precomputed spatial tokens ``su_sp [S,T,hw,D]`` /
        ``qu_sp [Q,T,hw,D]`` (the post-encode tail of :meth:`__call__`)."""
        mo_logits = self.mo(qu_sp, su_sp, support_labels,
                            deterministic=not train)

        su = su_sp.mean(axis=2)   # adaptive-avg-pool -> [S, T, D]
        qu = qu_sp.mean(axis=2)
        cum = otam_distance(su.astype(jnp.float32), qu.astype(jnp.float32),
                            lbda=0.1, bidirectional=True,
                            backend=self.otam_backend)   # [Q, S]
        class_dists = class_prototypes(cum.T, support_labels, self.way).T
        return {"logits": -class_dists[None], "mo_logits": mo_logits}
