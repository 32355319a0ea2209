"""MoLo head: motion-augmented long-short contrastive matching.

(reference: models/model_molo.py:257-527) Appearance and conv-derived motion
streams with class tokens + ``Transformer_v2`` temporal attention
(:340-384), frame-to-global bidirectional s2q/q2s contrastive logits
(:440-475), min-pooled frame matching (:480-514), a U-Net-style decoder
reconstructing pixel frame-differences for a recon MSE (:315-322, 352-356,
516-520), and an optional linear classifier over dataset classes (:309-313).

TPU-first: Conv3d/Conv2d run NDHWC/NHWC; the bilinear-upsample decoder uses
an explicit align-corners interpolation matching torch ``Upsample(align_
corners=True)``; class merging is a static segment reduction.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..backbones.resnet import TorchResNet
# PositionalEncoder: the reference's model_molo.py:173-200 PE is the same
# loop-built sinusoid + x*sqrt(d/A)+B*pe formula as myRes.py:605-632 — one
# shared implementation, not two copies
from ..blocks import (PositionalEncoder, TransformerV2, class_prototypes,
                      cos_sim)
from ..visual import encode_chunked

Dtype = Any


def upsample_bilinear_align_corners(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """torch nn.Upsample(mode='bilinear', align_corners=True) on
    [..., H, W, C]."""
    H, W = x.shape[-3], x.shape[-2]
    out_h, out_w = H * scale, W * scale

    def grid(in_size, out_size):
        if out_size == 1 or in_size == 1:
            return np.zeros(out_size)
        return np.arange(out_size) * (in_size - 1) / (out_size - 1)

    ys, xs = grid(H, out_h), grid(W, out_w)
    y0 = np.clip(np.floor(ys).astype(int), 0, H - 1)
    y1 = np.clip(y0 + 1, 0, H - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, W - 1)
    x1 = np.clip(x0 + 1, 0, W - 1)
    wy = jnp.asarray((ys - y0), x.dtype)
    wx = jnp.asarray((xs - x0), x.dtype)

    top = x[..., y0, :, :]
    bot = x[..., y1, :, :]
    rows = top + wy[:, None, None] * (bot - top)
    left = rows[..., x0, :]
    right = rows[..., x1, :]
    return left + wx[:, None] * (right - left)


class Up2(nn.Module):
    """Bilinear upsample + conv3x3 + BN + ReLU (reference:
    models/model_molo.py:202-247)."""
    out_channels: int
    scale: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = upsample_bilinear_align_corners(x, self.scale)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(x)
        return nn.relu(x)


class MoLoModel(nn.Module):
    """(reference: models/model_molo.py:257-523)"""
    way: int
    shot: int
    seq_len: int = 8
    arch: str = "resnet50"
    backbone_width: int = 64
    num_class: int = 64
    use_classification: bool = True
    use_local: bool = False
    use_contrastive: bool = True
    temp_coff: float = 0.0          # 0 -> learned scales
    logit_balance: float = 0.3
    single_direct: bool = False
    heads: int = 8
    position_a: float = 10.0
    position_b: float = 1.0
    factor: int = 8
    dtype: Dtype = jnp.float32
    backbone_override: Any = None
    # eval-time VMEM-friendly chunked encode (visual.encode_chunked)
    encode_chunk: int = 0

    def setup(self):
        self.backbone = self.backbone_override or TorchResNet(arch=self.arch, output="spatial",
                                    width=self.backbone_width,
                                    dtype=self.dtype, name="backbone")
        d = self.backbone.feature_dim
        self.mid_dim = d
        self.pe = PositionalEncoder(dim=d, scale_a=self.position_a,
                                    scale_b=self.position_b, name="pe")
        self.class_token = self.param(
            "class_token", nn.initializers.normal(1.0), (1, 1, d))
        self.class_token_motion = self.param(
            "class_token_motion", nn.initializers.normal(1.0), (1, 1, d))
        self.temporal_atte_before = TransformerV2(
            dim=d, heads=self.heads, dim_head_k=d // self.heads,
            dropout_atte=0.2, dtype=self.dtype, name="temporal_atte_before")
        self.temporal_atte_before_motion = TransformerV2(
            dim=d, heads=self.heads, dim_head_k=d // self.heads,
            dropout_atte=0.2, dtype=self.dtype,
            name="temporal_atte_before_motion")
        self.motion_reduce = nn.Conv(d // self.factor, (3, 3, 3), padding=1,
                                     dtype=self.dtype, name="motion_reduce")
        self.motion_conv = nn.Conv(d // self.factor, (3, 3), padding=1,
                                   dtype=self.dtype, name="motion_conv")
        self.motion_up = nn.Conv(d, (1, 1), dtype=self.dtype,
                                 name="motion_up")
        if self.use_classification:
            self.classification_layer = nn.Dense(self.num_class,
                                                 dtype=self.dtype,
                                                 name="classification_layer")
        if not self.temp_coff and self.use_contrastive:
            self.scale = self.param("scale",
                                    lambda key, shape: jnp.ones(shape), ())
            self.scale_motion = self.param(
                "scale_motion", lambda key, shape: jnp.ones(shape), ())
        self.up1 = Up2(128, scale=2, dtype=self.dtype, name="up1")
        self.up2 = Up2(32, scale=4, dtype=self.dtype, name="up2")
        self.up3 = Up2(16, scale=4, dtype=self.dtype, name="up3")
        self.outc = nn.Conv(3, (1, 1), dtype=self.dtype, name="outc")

    def _scales(self):
        if self.temp_coff:
            return self.temp_coff, self.temp_coff
        if self.use_contrastive:
            return self.scale, self.scale_motion
        return 1.0, 1.0

    def __call__(self, support_images, target_images, support_labels,
                 real_support_labels=None, real_target_labels=None,
                 text_train=None, text_test=None, *,
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        det = not train
        S, T = support_images.shape[:2]
        Q = target_images.shape[0]
        H, W = support_images.shape[2:4]
        both_clips = jnp.concatenate([support_images, target_images],
                                     axis=0).astype(self.dtype)
        frames = both_clips.reshape((S + Q) * T, H, W, 3)
        fmap = encode_chunked(self.backbone, frames, self.encode_chunk,
                              train=train)   # [(S+Q)T, h, w, D]
        h, w, D = fmap.shape[1:]
        B = S + Q

        # ---- motion stream (reference :340-366)
        vol = fmap.reshape(B, T, h, w, D)
        mo = self.motion_reduce(vol)                   # Conv3d over (T,h,w)
        mo_conv = self.motion_conv(
            mo.reshape(B * T, h, w, D // self.factor)).reshape(
            B, T, h, w, D // self.factor)
        mo_diff = mo_conv[:, 1:] - mo[:, :-1]          # [B, T-1, h, w, C']
        mo_flat = mo_diff.reshape(B * (T - 1), h, w, D // self.factor)

        # decoder reconstructing pixel frame-diffs (reference :351-356)
        rec = self.up1(mo_flat, train=train)
        rec = self.up2(rec, train=train)
        rec = self.up3(rec, train=train)
        rec = self.outc(rec)                           # [B(T-1), H, W, 3]

        motion = nn.relu(self.motion_up(mo_flat))
        motion = motion.mean(axis=(1, 2)).reshape(B, T - 1, D)
        motion = jnp.concatenate(
            [jnp.broadcast_to(self.class_token_motion.astype(motion.dtype),
                              (B, 1, D)), motion], axis=1)
        motion = nn.relu(self.temporal_atte_before_motion(
            self.pe(motion, deterministic=det), deterministic=det))

        # ---- appearance stream (reference :371-384)
        app = fmap.mean(axis=(1, 2)).reshape(B, T, D)
        app = jnp.concatenate(
            [jnp.broadcast_to(self.class_token.astype(app.dtype),
                              (B, 1, D)), app], axis=1)
        app = nn.relu(self.temporal_atte_before(
            self.pe(app, deterministic=det), deterministic=det))

        # classification over both streams (reference :386-393); USE_LOCAL
        # classifies every token instead of the pooled video
        # (reference :388-389)
        class_logits = None
        if self.use_classification:
            if self.use_local:
                class_logits = self.classification_layer(app).reshape(
                    -1, self.num_class)
            else:
                pooled = app.mean(axis=1) + motion.mean(axis=1)
                class_logits = self.classification_layer(pooled)

        su_app = class_prototypes(app[:S], support_labels, self.way)
        su_mo = class_prototypes(motion[:S], support_labels, self.way)
        qu_app, qu_mo = app[S:], motion[S:]

        sa, sm = self._scales()

        def stream_logits(su, qu, scale):
            su_g, su_f = su[:, 0, :], su[:, 1:, :]
            qu_g, qu_f = qu[:, 0, :], qu[:, 1:, :]
            # frame-to-global contrastive (reference :440-453)
            d_s2q = (1 - cos_sim(su_f.astype(jnp.float32),
                                 qu_g.astype(jnp.float32))).sum(axis=1)
            logits_s2q = -(d_s2q * scale).T            # [Q, way]
            d_q2s = (1 - cos_sim(qu_f.astype(jnp.float32),
                                 su_g.astype(jnp.float32))).sum(axis=1)
            logits_q2s = -(d_q2s * scale)              # [Q, way]
            # min-pooled frame matching (reference :480-489)
            sim = cos_sim(
                qu_f.reshape(-1, D).astype(jnp.float32),
                su_f.reshape(-1, D).astype(jnp.float32))
            nf = qu_f.shape[1]
            dists = (1 - sim).reshape(qu_f.shape[0], nf, su_f.shape[0], nf
                                      ).transpose(0, 2, 1, 3)
            if self.single_direct:
                cum = dists.min(axis=3).sum(axis=2)
            else:
                cum = dists.min(axis=3).sum(axis=2) + dists.min(axis=2).sum(axis=2)
            return cum, logits_s2q, logits_q2s

        cum_app, s2q, q2s = stream_logits(su_app, qu_app, sa)
        cum_mo, s2q_m, q2s_m = stream_logits(su_mo, qu_mo, sm)
        class_dists = cum_app + self.logit_balance * cum_mo

        # recon target: pixel frame-diffs (reference :420-423, 516-518)
        if train:
            diffs = (both_clips[:, 1:] - both_clips[:, :-1]).reshape(
                B * (T - 1), H, W, 3)
            loss_recons = jnp.mean((rec.astype(jnp.float32)
                                    - diffs.astype(jnp.float32)) ** 2)
        else:
            loss_recons = jnp.asarray(0.0, jnp.float32)

        out = {"logits": -class_dists[None],
               "logits_s2q": s2q[None], "logits_q2s": q2s[None],
               "logits_s2q_motion": s2q_m[None],
               "logits_q2s_motion": q2s_m[None],
               "loss_recons": loss_recons}
        if class_logits is not None:
            out["class_logits"] = class_logits[None]
        return out
