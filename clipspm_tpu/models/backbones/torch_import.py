"""OpenAI CLIP checkpoint importer (torch state_dict -> flax variables).

Mirrors the shape-inference of the reference's ``build_model``
(reference: models/clip_fsar.py:233-270) and converts every tensor into this
package's flax layout (NHWC conv kernels, [in, out] dense kernels). Torch is
only required here, never on the training/serving path.
"""

from __future__ import annotations

import hashlib
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

from .clip import CLIPArch

# SHA256 digests of the official OpenAI CLIP releases, from the
# SHA-addressed download URLs the reference pins (reference:
# models/clip_fsar.py:827-837). Keyed by release filename.
CLIP_CHECKPOINT_SHA256 = {
    "RN50.pt":
        "afeb0e10f9e5a86da6080e35cf09123aca3b358a0c3e3b6c78a7b63bc04b6762",
    "RN101.pt":
        "8fa8567bab74a42d41c5915025a8e4538c3bdbe8804a470a72f30b0d94fab599",
    "RN50x4.pt":
        "7e526bd135e493cef0776de27d5f42653e6b4c8bf9e0f653bb11773263205fdd",
    "RN50x16.pt":
        "52378b407f34354e150460fe41077663dd5b39c54cd0bfd2b27167a4a06ec9aa",
    "RN50x64.pt":
        "be1cfb55d75a9666199fb2206c106743da0f6468c9d327f3e0d0a543a9919d9c",
    "ViT-B-32.pt":
        "40d365715913c9da98579312b702a82c18be219cc2a73407c4526f58eba950af",
    "ViT-B-16.pt":
        "5806e77cd80f8b59890b7e101eabd078d9fb84e6937f9e85e4ecb61988df416f",
    "ViT-L-14.pt":
        "b8cca3fd41ae0c99ba7e8951adf17d267cdb84cd88be6f7c2e0eca1737a03836",
    "ViT-L-14-336px.pt":
        "3035c92b350959924f9f00213499208652fc7ea050643e8b385c2dac08641f02",
}


def verify_checkpoint_sha256(
        path: str,
        registry: Optional[Dict[str, str]] = None) -> Optional[bool]:
    """Check ``path`` against the official release digest for its filename.

    Returns True on a match, None when the filename is not a known release
    (custom/finetuned checkpoints are not hash-pinned), and raises on a
    mismatch — a truncated download or a wrong file silently produces
    garbage accuracy, which is the failure mode the reference's
    SHA-addressed URLs prevent (reference: models/clip_fsar.py:855-858).
    """
    registry = CLIP_CHECKPOINT_SHA256 if registry is None else registry
    expected = registry.get(os.path.basename(path))
    if expected is None:
        return None
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for block in iter(lambda: f.read(1 << 20), b""):
            h.update(block)
    got = h.hexdigest()
    if got != expected:
        raise RuntimeError(
            f"checkpoint integrity failure: {path} has SHA256 {got[:16]}..., "
            f"expected {expected[:16]}... for the official "
            f"{os.path.basename(path)} release — the file is corrupt or not "
            "the OpenAI release. Re-download it, or — if a custom "
            "checkpoint is intended — rename the file, pass verify=False "
            "(API), or set CLIPSPM_SKIP_WEIGHT_VERIFY=1 (CLI).")
    return True


def _t(x) -> np.ndarray:
    arr = np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)
    return arr.astype(np.float32)


def infer_arch_from_state_dict(sd: Dict[str, Any]) -> CLIPArch:
    """Shape inference identical in effect to models/clip_fsar.py:233-256."""
    vit = "visual.proj" in sd
    if vit:
        vision_width = sd["visual.conv1.weight"].shape[0]
        vision_layers = len([k for k in sd
                             if k.startswith("visual.")
                             and k.endswith(".attn.in_proj_weight")])
        vision_patch_size = sd["visual.conv1.weight"].shape[-1]
        grid = round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5)
        image_resolution = vision_patch_size * grid
    else:
        counts = [len({k.split(".")[2] for k in sd
                       if k.startswith(f"visual.layer{b}")})
                  for b in (1, 2, 3, 4)]
        vision_layers = tuple(counts)
        vision_width = sd["visual.layer1.0.conv1.weight"].shape[0]
        out_width = round(
            (sd["visual.attnpool.positional_embedding"].shape[0] - 1) ** 0.5)
        vision_patch_size = None
        image_resolution = out_width * 32

    return CLIPArch(
        embed_dim=sd["text_projection"].shape[1],
        image_resolution=image_resolution,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=vision_patch_size,
        context_length=sd["positional_embedding"].shape[0],
        vocab_size=sd["token_embedding.weight"].shape[0],
        transformer_width=sd["ln_final.weight"].shape[0],
        transformer_heads=max(1, sd["ln_final.weight"].shape[0] // 64),
        transformer_layers=len({k.split(".")[2] for k in sd
                                if k.startswith("transformer.resblocks")}),
    )


def _conv_kernel(w) -> np.ndarray:
    # torch [out, in, kh, kw] -> flax NHWC [kh, kw, in, out]
    return _t(w).transpose(2, 3, 1, 0)


def _dense(w) -> np.ndarray:
    # torch [out, in] -> flax [in, out]
    return _t(w).T


def _ln(dst: Dict, prefix: str, sd: Dict, key: str) -> None:
    dst[prefix] = {"ln": {"scale": _t(sd[f"{key}.weight"]),
                          "bias": _t(sd[f"{key}.bias"])}}


def _resblock(sd: Dict, key: str) -> Dict:
    return {
        "ln_1": {"ln": {"scale": _t(sd[f"{key}.ln_1.weight"]),
                        "bias": _t(sd[f"{key}.ln_1.bias"])}},
        "ln_2": {"ln": {"scale": _t(sd[f"{key}.ln_2.weight"]),
                        "bias": _t(sd[f"{key}.ln_2.bias"])}},
        "in_proj": {"kernel": _dense(sd[f"{key}.attn.in_proj_weight"]),
                    "bias": _t(sd[f"{key}.attn.in_proj_bias"])},
        "out_proj": {"kernel": _dense(sd[f"{key}.attn.out_proj.weight"]),
                     "bias": _t(sd[f"{key}.attn.out_proj.bias"])},
        "c_fc": {"kernel": _dense(sd[f"{key}.mlp.c_fc.weight"]),
                 "bias": _t(sd[f"{key}.mlp.c_fc.bias"])},
        "c_proj": {"kernel": _dense(sd[f"{key}.mlp.c_proj.weight"]),
                   "bias": _t(sd[f"{key}.mlp.c_proj.bias"])},
    }


def _bn(sd: Dict, key: str) -> Tuple[Dict, Dict]:
    params = {"scale": _t(sd[f"{key}.weight"]), "bias": _t(sd[f"{key}.bias"])}
    stats = {"mean": _t(sd[f"{key}.running_mean"]),
             "var": _t(sd[f"{key}.running_var"])}
    return params, stats


def convert_clip_state_dict(
        sd: Dict[str, Any]) -> Tuple[CLIPArch, Dict[str, Any]]:
    """Returns (arch, flax variables {params, batch_stats})."""
    arch = infer_arch_from_state_dict(sd)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    visual: Dict[str, Any] = {}
    visual_stats: Dict[str, Any] = {}
    if arch.is_vit:
        visual["conv1"] = {"kernel": _conv_kernel(sd["visual.conv1.weight"])}
        visual["class_embedding"] = _t(sd["visual.class_embedding"])
        visual["positional_embedding"] = _t(sd["visual.positional_embedding"])
        visual["proj"] = _t(sd["visual.proj"])
        _ln(visual, "ln_pre", sd, "visual.ln_pre")
        _ln(visual, "ln_post", sd, "visual.ln_post")
        tr: Dict[str, Any] = {}
        for i in range(arch.vision_layers):
            tr[f"resblock_{i}"] = _resblock(sd, f"visual.transformer.resblocks.{i}")
        visual["transformer"] = tr
    else:
        for i in (1, 2, 3):
            visual[f"conv{i}"] = {"kernel": _conv_kernel(sd[f"visual.conv{i}.weight"])}
            p, s = _bn(sd, f"visual.bn{i}")
            visual[f"bn{i}"] = p
            visual_stats[f"bn{i}"] = s
        for stage, blocks in enumerate(arch.vision_layers):
            for b in range(blocks):
                key = f"visual.layer{stage + 1}.{b}"
                blk: Dict[str, Any] = {}
                blk_stats: Dict[str, Any] = {}
                for i in (1, 2, 3):
                    blk[f"conv{i}"] = {"kernel": _conv_kernel(sd[f"{key}.conv{i}.weight"])}
                    p, s = _bn(sd, f"{key}.bn{i}")
                    blk[f"bn{i}"] = p
                    blk_stats[f"bn{i}"] = s
                if f"{key}.downsample.0.weight" in sd:
                    blk["down_conv"] = {
                        "kernel": _conv_kernel(sd[f"{key}.downsample.0.weight"])}
                    p, s = _bn(sd, f"{key}.downsample.1")
                    blk["down_bn"] = p
                    blk_stats["down_bn"] = s
                visual[f"layer{stage + 1}_{b}"] = blk
                visual_stats[f"layer{stage + 1}_{b}"] = blk_stats
        pool: Dict[str, Any] = {
            "positional_embedding": _t(sd["visual.attnpool.positional_embedding"])}
        for proj in ("q_proj", "k_proj", "v_proj", "c_proj"):
            pool[proj] = {"kernel": _dense(sd[f"visual.attnpool.{proj}.weight"]),
                          "bias": _t(sd[f"visual.attnpool.{proj}.bias"])}
        visual["attnpool"] = pool

    params["visual"] = visual
    if visual_stats:
        stats["visual"] = visual_stats

    text_tr: Dict[str, Any] = {}
    for i in range(arch.transformer_layers):
        text_tr[f"resblock_{i}"] = _resblock(sd, f"transformer.resblocks.{i}")
    params["transformer"] = text_tr
    params["token_embedding"] = {"embedding": _t(sd["token_embedding.weight"])}
    params["positional_embedding"] = _t(sd["positional_embedding"])
    _ln(params, "ln_final", sd, "ln_final")
    params["text_projection"] = _t(sd["text_projection"])
    params["logit_scale"] = _t(sd["logit_scale"])

    variables: Dict[str, Any] = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    return arch, variables


def load_clip_checkpoint(path: str,
                         verify: bool = True) -> Tuple[CLIPArch, Dict[str, Any]]:
    """Load an OpenAI CLIP ``.pt`` (state dict or TorchScript archive).

    ``verify=True`` (default) hash-checks files named like an official
    release against CLIP_CHECKPOINT_SHA256 before deserialising."""
    import torch

    if verify:
        verify_checkpoint_sha256(path)
    try:
        model = torch.jit.load(path, map_location="cpu").eval()
        sd = model.state_dict()
    except RuntimeError:
        sd = torch.load(path, map_location="cpu")
    for key in ("input_resolution", "context_length", "vocab_size"):
        sd.pop(key, None)
    return convert_clip_state_dict(sd)
