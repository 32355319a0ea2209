"""Visual-tower construction helpers (leaf module: no head imports)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .backbones.clip import CLIPArch, ModifiedResNet, VisionTransformer


class IdentityBackbone(nn.Module):
    """Feature pass-through for parity tests: treats the 'image' tensor as
    pre-extracted features [N, ..., D] -> [N, D]."""

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        return x.reshape(x.shape[0], -1)


def make_clip_visual(arch: CLIPArch, dtype=jnp.float32,
                     name: str = "visual") -> nn.Module:
    if arch.is_vit:
        return VisionTransformer(
            input_resolution=arch.image_resolution,
            patch_size=arch.vision_patch_size, width=arch.vision_width,
            layers=arch.vision_layers, heads=arch.vision_heads,
            output_dim=arch.embed_dim, fast_softmax=arch.fast_softmax,
            fused_attention=arch.fused_attention,
            fp32_norms=not arch.bf16_norms,
            dtype=dtype, name=name)
    return ModifiedResNet(
        layers=arch.vision_layers, output_dim=arch.embed_dim,
        heads=arch.vision_heads, input_resolution=arch.image_resolution,
        width=arch.vision_width, spatial=arch.spatial,
        fp32_norms=not arch.bf16_norms, dtype=dtype, name=name)
