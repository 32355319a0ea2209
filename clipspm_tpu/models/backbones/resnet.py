"""Torchvision-style ResNet in flax (NHWC), for the non-CLIP heads.

The reference builds ``torchvision.models.resnet50`` truncated before the
classifier — ``children()[:-2]`` keeps the spatial map (used by otam/strm/
molo/soap/ta2n; e.g. reference: models/model_otam.py:59-61),
``children()[:-1]`` keeps global average pooling (trx; reference:
models/model_TRX.py:157). Here one flax module covers both via
``output="spatial" | "pooled"``.

Standard torchvision v1 topology: 7x7/2 stem conv + BN + ReLU + 3x3/2
maxpool, then four bottleneck stages ([3,4,6,3] for RN50) with the stride
carried by the 3x3 conv. Weights import from a local torchvision checkpoint
via ``convert_torchvision_resnet`` (no network).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

Dtype = Any

RESNET_LAYERS = {
    "resnet18": (2, 2, 2, 2),
    "resnet34": (3, 4, 6, 3),
    "resnet50": (3, 4, 6, 3),
}
BASIC_BLOCK_ARCHS = ("resnet18", "resnet34")


class TVBottleneck(nn.Module):
    """torchvision Bottleneck: 1x1 -> 3x3(stride) -> 1x1, expansion 4.

    ``temporal=True`` is the reference's experimental ``newBottleneck``
    (reference: models/myRes.py:30-79): a temporal-excitation ``Blk`` + BN +
    ReLU spliced in after the 3x3 conv.
    """
    planes: int
    stride: int = 1
    temporal: bool = False
    seq_len: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        out_ch = self.planes * 4
        in_ch = x.shape[-1]
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=jnp.float32, name=name)
        h = nn.relu(bn("bn1")(nn.Conv(self.planes, (1, 1), use_bias=False,
                                      dtype=self.dtype, name="conv1")(x)))
        h = nn.relu(bn("bn2")(nn.Conv(self.planes, (3, 3),
                                      strides=self.stride, padding=1,
                                      use_bias=False, dtype=self.dtype,
                                      name="conv2")(h)))
        if self.temporal:
            from .temporal_excitation import Blk
            h = Blk(self.planes, seq_len=self.seq_len, dtype=self.dtype,
                    name="blk")(h, train=train)
            h = nn.relu(bn("bn4")(h))
        h = bn("bn3")(nn.Conv(out_ch, (1, 1), use_bias=False,
                              dtype=self.dtype, name="conv3")(h))
        identity = x
        if self.stride != 1 or in_ch != out_ch:
            identity = nn.Conv(out_ch, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype,
                               name="down_conv")(x)
            identity = bn("down_bn")(identity)
        return nn.relu(h + identity)


class TVBasicBlock(nn.Module):
    """torchvision BasicBlock: 3x3(stride) -> 3x3, expansion 1."""
    planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        in_ch = x.shape[-1]
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=jnp.float32, name=name)
        h = nn.relu(bn("bn1")(nn.Conv(self.planes, (3, 3),
                                      strides=self.stride, padding=1,
                                      use_bias=False, dtype=self.dtype,
                                      name="conv1")(x)))
        h = bn("bn2")(nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                              dtype=self.dtype, name="conv2")(h))
        identity = x
        if self.stride != 1 or in_ch != self.planes:
            identity = nn.Conv(self.planes, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype,
                               name="down_conv")(x)
            identity = bn("down_bn")(identity)
        return nn.relu(h + identity)


class TorchResNet(nn.Module):
    """ResNet trunk; ``output``: "spatial" -> [N, H/32, W/32, C],
    "pooled" -> [N, C].

    ``temporal_blocks`` reproduces the reference's experimental temporal
    ResNets (dead code, kept for inventory): ``"bottleneck"`` is
    ``resnet50_1`` (reference: models/myRes.py:9-16 — a ``Blk`` inside every
    bottleneck), ``"stage"`` is ``resnet50_2``/``newResNet_2`` (reference:
    models/myRes.py:18-26,225-246 — ``Blk(512)`` after stage 2 and
    ``Blk(1024)`` after stage 3).
    """
    arch: str = "resnet50"
    output: str = "spatial"
    width: int = 64
    temporal_blocks: str = "none"
    seq_len: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        layers = RESNET_LAYERS[self.arch]
        basic = self.arch in BASIC_BLOCK_ARCHS
        bn = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, dtype=jnp.float32, name="bn1")
        x = nn.relu(bn(nn.Conv(self.width, (7, 7), strides=2, padding=3,
                               use_bias=False, dtype=self.dtype,
                               name="conv1")(x)))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, blocks in enumerate(layers):
            planes = self.width * (2 ** stage)
            for b in range(blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                if basic:
                    x = TVBasicBlock(planes, stride, dtype=self.dtype,
                                     name=f"layer{stage + 1}_{b}")(
                        x, train=train)
                else:
                    x = TVBottleneck(
                        planes, stride,
                        temporal=self.temporal_blocks == "bottleneck",
                        seq_len=self.seq_len, dtype=self.dtype,
                        name=f"layer{stage + 1}_{b}")(x, train=train)
            if self.temporal_blocks == "stage" and stage in (1, 2):
                from .temporal_excitation import Blk
                x = Blk(x.shape[-1], seq_len=self.seq_len, dtype=self.dtype,
                        name=f"blk_{stage}")(x, train=train)
        if self.output == "pooled":
            x = x.mean(axis=(1, 2))
        return x

    @property
    def feature_dim(self) -> int:
        mult = 1 if self.arch in BASIC_BLOCK_ARCHS else 4
        return self.width * 8 * mult


def convert_torchvision_resnet(sd: Dict[str, Any], arch: str = "resnet50"
                               ) -> Dict[str, Any]:
    """torchvision state_dict -> flax variables for ``TorchResNet``."""
    def t(x):
        return np.asarray(x.detach().cpu().numpy()
                          if hasattr(x, "detach") else x).astype(np.float32)

    def conv_k(w):
        return t(w).transpose(2, 3, 1, 0)

    def bn(key):
        return ({"scale": t(sd[f"{key}.weight"]), "bias": t(sd[f"{key}.bias"])},
                {"mean": t(sd[f"{key}.running_mean"]),
                 "var": t(sd[f"{key}.running_var"])})

    params: Dict[str, Any] = {"conv1": {"kernel": conv_k(sd["conv1.weight"])}}
    stats: Dict[str, Any] = {}
    params["bn1"], stats["bn1"] = bn("bn1")
    n_convs = 2 if arch in BASIC_BLOCK_ARCHS else 3
    for stage, blocks in enumerate(RESNET_LAYERS[arch]):
        for b in range(blocks):
            key = f"layer{stage + 1}.{b}"
            blk_p: Dict[str, Any] = {}
            blk_s: Dict[str, Any] = {}
            for i in range(1, n_convs + 1):
                blk_p[f"conv{i}"] = {"kernel": conv_k(sd[f"{key}.conv{i}.weight"])}
                blk_p[f"bn{i}"], blk_s[f"bn{i}"] = bn(f"{key}.bn{i}")
            if f"{key}.downsample.0.weight" in sd:
                blk_p["down_conv"] = {
                    "kernel": conv_k(sd[f"{key}.downsample.0.weight"])}
                blk_p["down_bn"], blk_s["down_bn"] = bn(f"{key}.downsample.1")
            params[f"layer{stage + 1}_{b}"] = blk_p
            stats[f"layer{stage + 1}_{b}"] = blk_s
    return {"params": params, "batch_stats": stats}
