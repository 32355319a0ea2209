"""Frame/text encoders: CLIP (RN50, ViT-B/16), torchvision-style ResNet."""

from .clip import (CLIP_ARCHS, CLIPArch, CLIPModel, ModifiedResNet,
                   VisionTransformer, build_clip, init_clip_params)
from .tokenizer import SimpleTokenizer, tokenize

__all__ = [
    "CLIPArch", "CLIP_ARCHS", "CLIPModel", "ModifiedResNet",
    "VisionTransformer", "build_clip", "init_clip_params",
    "SimpleTokenizer", "tokenize",
]
