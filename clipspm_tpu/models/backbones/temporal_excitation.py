"""Temporal-excitation block family (``blk``: ce / gte / lte / se).

(reference: models/myRes.py:250-412) Quarter-channel split processed by four
excitation branches: CE (clip-level frame-diff channel excitation), GTE
(global temporal excitation via temporal convs on pooled diffs), LTE (local
3-D temporal convs), SE (spatial dilated-conv excitation on the time-mean).
The reference inserts these into experimental ResNet variants
(``resnet50_1/2``, ``newBottleneck`` — models/myRes.py:9-246) that no shipped
head uses (SURVEY §2.2 B6/B7); they are provided here for inventory
completeness and future backbone experiments, operating on
``[N*T, H, W, C]`` frame batches (NHWC) with a static ``seq_len``.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def _clipify(x: jnp.ndarray, seq_len: int):
    """[N*T, H, W, C] -> [N, T, H, W, C]"""
    nt, h, w, c = x.shape
    return x.reshape(nt // seq_len, seq_len, h, w, c)


def _frame_diff_padded(clips: jnp.ndarray) -> jnp.ndarray:
    """b[t+1] - a[t], zero-padded at the end (reference: models/myRes.py:292-294)."""
    diff = clips[:, 1:] - clips[:, :-1]
    return jnp.pad(diff, ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)))


class CE(nn.Module):
    """Clip-level channel excitation (reference: models/myRes.py:272-299)."""
    channels: int
    seq_len: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        clips = _clipify(x, self.seq_len)
        res = clips
        diff = _frame_diff_padded(clips).mean(axis=(1, 2, 3), keepdims=True)
        g = nn.Conv(self.channels, (1, 1, 1), dtype=self.dtype,
                    name="fc")(diff)
        out = jax.nn.sigmoid(g) * res
        return out.reshape(x.shape)


class GTE(nn.Module):
    """Global temporal excitation (reference: models/myRes.py:301-341)."""
    channels: int
    seq_len: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=jnp.float32, name=name)
        clips = _clipify(x, self.seq_len)
        res = clips
        diff = _frame_diff_padded(clips).mean(axis=(2, 3), keepdims=True)
        h = nn.Conv(self.channels * 2, (3, 1, 1), padding=((1, 1), (0, 0),
                                                           (0, 0)),
                    use_bias=False, dtype=self.dtype, name="conv1")(diff)
        h = nn.relu(bn("bn1")(h))
        h = nn.Conv(self.channels, (3, 1, 1), padding=((1, 1), (0, 0),
                                                       (0, 0)),
                    use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = bn("bn2")(h)
        out = jax.nn.sigmoid(h) * res
        return out.reshape(x.shape)


class LTE(nn.Module):
    """Local 3-D temporal excitation (reference: models/myRes.py:343-377)."""
    channels: int
    seq_len: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=jnp.float32, name=name)
        clips = _clipify(x, self.seq_len)
        res = clips
        h = nn.Conv(self.channels * 2, (3, 1, 1), padding=((1, 1), (0, 0),
                                                           (0, 0)),
                    use_bias=False, dtype=self.dtype, name="conv1")(clips)
        h = nn.relu(bn("bn1")(h))
        h = nn.Conv(self.channels, (3, 1, 1), padding=((2, 2), (0, 0),
                                                       (0, 0)),
                    kernel_dilation=(2, 1, 1), use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = bn("bn2")(h)
        out = jax.nn.sigmoid(h) * res
        return out.reshape(x.shape)


class SE(nn.Module):
    """Spatial dilated-conv excitation (reference: models/myRes.py:379-412)."""
    channels: int
    seq_len: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=jnp.float32, name=name)
        clips = _clipify(x, self.seq_len)
        res = clips
        h = clips.mean(axis=1)                  # time-mean [N, H, W, C]
        h = nn.Conv(self.channels * 2, (3, 3), padding=2, kernel_dilation=2,
                    use_bias=False, dtype=self.dtype, name="conv1")(h)
        h = nn.relu(bn("bn1")(h))
        h = nn.Conv(self.channels, (3, 3), padding=2, kernel_dilation=2,
                    use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = bn("bn2")(h)
        out = jax.nn.sigmoid(h)[:, None] * res
        return out.reshape(x.shape)


class Blk(nn.Module):
    """Quarter-channel split over the four branches
    (reference: models/myRes.py:250-270)."""
    in_channels: int
    seq_len: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        c = x.shape[-1]
        q = c // 4
        f1 = CE(q, self.seq_len, self.dtype, name="ce")(
            x[..., :q], train=train)
        f2 = GTE(q, self.seq_len, self.dtype, name="gte")(
            x[..., q:2 * q], train=train)
        f3 = LTE(q, self.seq_len, self.dtype, name="lte")(
            x[..., 2 * q:3 * q], train=train)
        f4 = SE(c - 3 * q, self.seq_len, self.dtype, name="se")(
            x[..., 3 * q:], train=train)
        return jnp.concatenate([f1, f2, f3, f4], axis=-1)
