"""OpenAI CLIP checkpoint importer (torch state_dict -> flax variables).

Mirrors the shape-inference of the reference's ``build_model``
(reference: models/clip_fsar.py:233-270) and converts every tensor into this
package's flax layout (NHWC conv kernels, [in, out] dense kernels). Torch is
only required here, never on the training/serving path.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from .clip import CLIPArch


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


def load_clip_checkpoint(path: str) -> Tuple[CLIPArch, Dict[str, Any]]:
    """Load an OpenAI CLIP ``.pt`` (state dict or TorchScript archive)."""
    import torch

    try:
        model = torch.jit.load(path, map_location="cpu").eval()
        sd = model.state_dict()
    except RuntimeError:
        sd = torch.load(path, map_location="cpu")
    for key in ("input_resolution", "context_length", "vocab_size"):
        sd.pop(key, None)
    return convert_clip_state_dict(sd)
