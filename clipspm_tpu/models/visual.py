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


def encode_chunked(backbone: nn.Module, frames: jnp.ndarray, chunk: int, *,
                   train: bool = False,
                   train_chunk: int = 0,
                   remat_policy: str = "full") -> jnp.ndarray:
    """Encode ``[N, ...]`` frames through ``backbone`` in VMEM-friendly chunks.

    On v5e the ViT-B/16 encode gets *slower* per frame as the batch grows
    (measured: 3310 fps at 120 frames, 3068 at 240, 2657 at 960) because
    large activation tensors spill to HBM between fused ops. Scanning the
    frame batch in small chunks keeps each chunk's activations VMEM-resident
    while weights stream once per chunk — measured 4150 fps at chunk=30 on
    the production 240-frame episode encode (~35% faster end-to-end eval).

    By default chunking is eval-only: in training mode (or chunk<=0 /
    chunk>=N) this falls through to one batched call. ``train_chunk=True``
    chunks the *training* forward too, with the scan body rematerialised:
    without remat the scan stacks every chunk's residuals (measured 44.9 G
    for the 240-frame ViT-B/16 backward — the attention scores alone are
    K x [chunk, 12, 197, 197]) and the TPU compile rejects it; with remat
    the backward holds ONE chunk's residuals and recomputes per chunk, so
    peak HBM drops ~K-fold for a ~1/3 FLOPs overhead on the backward.
    Only valid for backbones with no BatchNorm batch statistics and no
    dropout inside (CLIP ViT qualifies: per-chunk semantics are identical).

    ``train_chunk``: 0 disables train-mode chunking; ``True``/1 reuses the
    eval ``chunk`` width; an int > 1 is an explicit train width. The optima
    differ — measured ViT-B/16 240-frame train step on v5e: 3.17 eps/s at
    width 40 vs 2.92 at the eval-optimal 30 (remat recompute amortizes
    better over slightly larger chunks; 60 regresses to 2.93, VMEM spill).

    ``remat_policy`` trades backward-pass HBM for recompute FLOPs:
    - "full" (default): recompute everything per chunk — minimum memory,
      backward pays a full extra forward (the safe fit on a 15.75 G chip).
    - "dots": ``jax.checkpoint_policies.dots_with_no_batch_dims_saveable``
      — the projection/MLP matmul outputs (where ~95% of the recompute
      FLOPs are: qkv/proj/fc/out dots; the batched attention-score dots
      are NOT saved) are kept across chunks, so the backward recomputes
      only elementwise chains + attention. Costs ~33 MB x layers per
      saved chunk-frame block (ViT-B/16 240-frame step: ~7.9 G extra,
      chunk-width-INDEPENDENT — measured RESOURCE_EXHAUSTED on a 15.75 G
      v5e at widths 16/24/30/40 even with state donation; use on >=32 G
      parts).
    - "attn": ``save_only_these_names("attn_probs", "attn_out")`` — keeps
      only the post-softmax attention probabilities and the attention
      output (the ``checkpoint_name`` tags in
      backbones/clip.py:ResidualAttentionBlock). The backward then skips
      re-doing the memory-bound attention chain (qk^T scores + softmax —
      the slice the train profile blames) and recomputes only the
      MXU-friendly projection/MLP dots. ViT-B/16 240-frame step: ~3.5 G
      extra (probs 2.7 G + out 0.9 G, chunk-width-independent) vs the
      dots policy's 7.9 G.
    - "attn_out": saves only the attention outputs (~0.9 G) — the minimal
      variant if "attn" does not fit.
    - "mlp": "attn_out" plus the MLP gelu outputs (``mlp_gelu`` tag, 4x
      d_model per token: ~3.6 G at the 240-frame ViT-B/16 step) — the
      backward additionally skips re-doing the c_fc matmul + gelu, the
      largest recompute block left under "attn_out"; worth it only if the
      extra residency does not degrade XLA's schedule (measure per part).
    """
    N = frames.shape[0]
    if train:
        chunk = chunk if train_chunk in (True, 1) else int(train_chunk)
    if not chunk or chunk >= N:
        return backbone(frames, train=train)
    pad = (-N) % chunk
    if pad:
        frames = jnp.concatenate([frames, frames[:pad]], axis=0)
    K = frames.shape[0] // chunk
    fr = frames.reshape((K, chunk) + frames.shape[1:])
    body = lambda bb, _, c: (None, bb(c, train=train))
    if train:
        # prevent_cse=False is safe (and faster) inside scan: the scan body
        # is already a single compiled region, so XLA cannot CSE across the
        # remat boundary
        import jax

        policies = {"full": None,
                    "dots": jax.checkpoint_policies
                    .dots_with_no_batch_dims_saveable,
                    "attn": jax.checkpoint_policies
                    .save_only_these_names("attn_probs", "attn_out"),
                    "attn_out": jax.checkpoint_policies
                    .save_only_these_names("attn_out"),
                    "mlp": jax.checkpoint_policies
                    .save_only_these_names("attn_out", "mlp_gelu")}
        if remat_policy not in policies:
            raise ValueError(
                f"unknown remat_policy {remat_policy!r}; "
                f"expected one of {sorted(policies)}")
        body = nn.remat(body, prevent_cse=False,
                        policy=policies[remat_policy])
    scan = nn.scan(body,
                   variable_broadcast=["params", "batch_stats"],
                   split_rngs={"params": False, "dropout": False},
                   in_axes=0, out_axes=0, length=K)
    _, feats = scan(backbone, None, fr)
    feats = feats.reshape((K * chunk,) + feats.shape[2:])
    return feats[:N] if pad else feats


def make_clip_visual(arch: CLIPArch, dtype=jnp.float32,
                     name: str = "visual") -> nn.Module:
    if arch.is_vit:
        return VisionTransformer(
            input_resolution=arch.image_resolution,
            patch_size=arch.vision_patch_size, width=arch.vision_width,
            layers=arch.vision_layers, heads=arch.vision_heads,
            output_dim=arch.embed_dim, fast_softmax=arch.fast_softmax,
            fp32_norms=not arch.bf16_norms,
            int8_eval=arch.int8_eval,
            dtype=dtype, name=name)
    return ModifiedResNet(
        layers=arch.vision_layers, output_dim=arch.embed_dim,
        heads=arch.vision_heads, input_resolution=arch.image_resolution,
        width=arch.vision_width, spatial=arch.spatial,
        fp32_norms=not arch.bf16_norms, dtype=dtype, name=name)
