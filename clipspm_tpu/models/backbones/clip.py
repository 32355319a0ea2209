"""CLIP backbones (RN50 ModifiedResNet + ViT-B/16 + text transformer) in flax.

Fresh TPU-first implementation of the CLIP architecture family the reference
vendors from OpenAI (reference: models/clip_fsar.py:396-821): NHWC layouts,
bf16-friendly compute with fp32 LayerNorms (the reference's fp16-safe
LayerNorm, models/clip_fsar.py:610-616), static shapes throughout, and
batched text encoding (one jitted call over all prompts instead of the
reference's per-class python loop, models/model_clipspm.py:53-70).

Weights load from OpenAI checkpoints via ``torch_import.py`` (shape-inferred
the same way as reference build_model, models/clip_fsar.py:233-270) or start
randomly initialised when no checkpoint is available.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


@dataclasses.dataclass(frozen=True)
class CLIPArch:
    """Architecture hyperparameters, mirroring the constructor signature the
    reference infers from checkpoint shapes (models/clip_fsar.py:691-706)."""
    embed_dim: int
    image_resolution: int
    vision_layers: Union[Tuple[int, int, int, int], int]
    vision_width: int
    vision_patch_size: Optional[int]
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12
    spatial: Union[bool, str] = False
    # bf16 softmax in the transformer attention (max-shifted, still stable);
    # ~10%% faster ViT step on v5e; default off for strict fp32-softmax parity
    #
    # Note there is deliberately NO fused/Pallas attention option: at the
    # CLIP sequence lengths (L=197 vision / 77 text) XLA's own attention
    # fusion beats every hand kernel we measured on v5e — a flash-style
    # Pallas kernel with zero-copy [B,H,L,hd] blocks and megacore-parallel
    # grid was still ~16% slower end-to-end (88.8 ms vs 76.5 ms for the
    # 12-layer stack at B=240; round-2 measurements). Flash attention pays
    # off when the L x L score tile dominates HBM traffic, i.e. at sequence
    # lengths far beyond this workload. The eval-time throughput lever here
    # is batch shaping instead (see visual.encode_chunked).
    fast_softmax: bool = False
    # LayerNorms/BatchNorms in the compute dtype instead of fp32 (safe for
    # bf16 — see FP32LayerNorm; +5% E2E ViT eval, ~15% RN50 tower); default
    # off for strict fp32-norm parity
    bf16_norms: bool = False
    # dynamic-int8 projection/MLP matmuls at EVAL only (ops/quant.py; the
    # v5e MXU runs int8 ~1.7x its bf16 rate). Default off: accuracy on real
    # checkpoints is unvalidated in this environment — see README "Known
    # limitations". Training always keeps the float path (zero-gradient
    # rounding), and the param tree is unchanged either way.
    int8_eval: bool = False

    @property
    def is_vit(self) -> bool:
        return isinstance(self.vision_layers, int)

    @property
    def vision_heads(self) -> int:
        if self.is_vit:
            return self.vision_width // 64
        return self.vision_width * 32 // 64


CLIP_ARCHS = {
    # The full OpenAI family the reference's registry names
    # (reference: models/clip_fsar.py:184-196 _MODELS); RN50 and ViT-B/16 are
    # the two the shipped configs use.
    # RN50: 1024-d embed (reference: models/model_clipspm.py:23 mid_dim=1024)
    "RN50": CLIPArch(1024, 224, (3, 4, 6, 3), 64, None),
    "RN101": CLIPArch(512, 224, (3, 4, 23, 3), 64, None),
    "RN50x4": CLIPArch(640, 288, (4, 6, 10, 6), 80, None,
                       transformer_width=640, transformer_heads=10),
    "RN50x16": CLIPArch(768, 384, (6, 8, 18, 8), 96, None,
                        transformer_width=768, transformer_heads=12),
    "RN50x64": CLIPArch(1024, 448, (3, 15, 36, 10), 128, None,
                        transformer_width=1024, transformer_heads=16),
    "ViT-B/32": CLIPArch(512, 224, 12, 768, 32),
    # ViT-B/16: 512-d embed (reference: models/model_clipspm.py:33 mid_dim=512)
    "ViT-B/16": CLIPArch(512, 224, 12, 768, 16),
    "ViT-L/14": CLIPArch(768, 224, 24, 1024, 14, transformer_width=768,
                         transformer_heads=12),
    "ViT-L/14@336px": CLIPArch(768, 336, 24, 1024, 14, transformer_width=768,
                               transformer_heads=12),
    # tiny configs for hermetic CPU tests; vocab >= 514 so a byte-level BPE
    # tokenizer (256 bytes + 256 word-final + specials) can address it
    "test-tiny": CLIPArch(32, 32, 2, 64, 8, context_length=16, vocab_size=600,
                          transformer_width=32, transformer_heads=2,
                          transformer_layers=2),
    "test-tiny-rn": CLIPArch(64, 32, (1, 1, 1, 1), 8, None, context_length=16,
                             vocab_size=600, transformer_width=32,
                             transformer_heads=2, transformer_layers=2),
}


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """x * sigmoid(1.702 x) (reference: models/clip_fsar.py:618-620)."""
    return x * jax.nn.sigmoid(1.702 * x)


class FP32LayerNorm(nn.Module):
    """LayerNorm computed in fp32 and cast back (reference:
    models/clip_fsar.py:610-616).

    ``fp32=False`` normalizes in the input dtype instead — safe for bf16
    (the reference's fp32 guard exists for fp16's narrow *range*, which bf16
    shares with fp32) and avoids the fp32 activation round-trip around every
    norm: measured +5% end-to-end episode eval on v5e (bench.py), embeddings
    identical at bf16 resolution. Param tree is identical either way.
    """
    fp32: bool = True

    @nn.compact
    def __call__(self, x):
        if not self.fp32:
            return nn.LayerNorm(epsilon=1e-5, dtype=x.dtype, name="ln")(x)
        orig = x.dtype
        out = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                           name="ln")(x.astype(jnp.float32))
        return out.astype(orig)


# ---------------------------------------------------------------------------
# ModifiedResNet visual tower
# ---------------------------------------------------------------------------

class Bottleneck(nn.Module):
    """CLIP anti-aliased bottleneck: all convs stride 1; avgpool performs the
    downsampling after conv2 and before the downsample conv
    (reference: models/clip_fsar.py:502-547)."""
    planes: int
    stride: int = 1
    fp32_norms: bool = True
    dtype: Dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        out_ch = self.planes * self.expansion
        in_ch = x.shape[-1]
        # fp32_norms=False runs the (eval-affine) BN in the compute dtype
        # (params stay fp32, cast at use): ~15% faster RN50 encode on v5e
        bn_dt = jnp.float32 if self.fp32_norms else self.dtype
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=bn_dt, name=name)
        conv = lambda ch, k, name: nn.Conv(ch, (k, k), use_bias=False,
                                           padding=[(k // 2, k // 2)] * 2,
                                           dtype=self.dtype, name=name)
        h = nn.relu(bn("bn1")(conv(self.planes, 1, "conv1")(x)))
        h = nn.relu(bn("bn2")(conv(self.planes, 3, "conv2")(h)))
        if self.stride > 1:
            h = nn.avg_pool(h, (self.stride,) * 2, strides=(self.stride,) * 2)
        h = bn("bn3")(conv(out_ch, 1, "conv3")(h))

        identity = x
        if self.stride > 1 or in_ch != out_ch:
            identity = nn.avg_pool(x, (self.stride,) * 2,
                                   strides=(self.stride,) * 2) \
                if self.stride > 1 else x
            identity = conv(out_ch, 1, "down_conv")(identity)
            identity = bn("down_bn")(identity)
        return nn.relu(h + identity)


class AttentionPool2d(nn.Module):
    """Learned-positional-embedding MHA pooling (reference:
    models/clip_fsar.py:396-500). ``spatial``: False -> pooled vector;
    "v2" -> [cls] + value-projected token map; True -> full token
    self-attention map.
    """
    spacial_dim: int
    embed_dim: int
    num_heads: int
    output_dim: int
    spatial: Union[bool, str] = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: [N, H, W, C] -> tokens [N, HW+1, C] with mean token prepended
        N, H, W, C = x.shape
        tokens = x.reshape(N, H * W, C)
        mean_tok = tokens.mean(axis=1, keepdims=True)
        tokens = jnp.concatenate([mean_tok, tokens], axis=1)
        pos = self.param(
            "positional_embedding",
            lambda key, shape: jax.random.normal(key, shape) / self.embed_dim ** 0.5,
            (self.spacial_dim ** 2 + 1, self.embed_dim))
        tokens = tokens + pos[None].astype(tokens.dtype)

        q_proj = nn.Dense(self.embed_dim, dtype=self.dtype, name="q_proj")
        k_proj = nn.Dense(self.embed_dim, dtype=self.dtype, name="k_proj")
        v_proj = nn.Dense(self.embed_dim, dtype=self.dtype, name="v_proj")
        c_proj = nn.Dense(self.output_dim, dtype=self.dtype, name="c_proj")

        def mha(query, keys, values):
            hd = self.embed_dim // self.num_heads
            scale = hd ** -0.5

            def split(t):
                return t.reshape(t.shape[0], t.shape[1], self.num_heads,
                                 hd).transpose(0, 2, 1, 3)

            qh, kh, vh = split(query), split(keys), split(values)
            attn = jnp.einsum("bhid,bhjd->bhij", qh, kh,
                              preferred_element_type=jnp.float32) * scale
            attn = jax.nn.softmax(attn, axis=-1).astype(vh.dtype)
            out = jnp.einsum("bhij,bhjd->bhid", attn, vh)
            out = out.transpose(0, 2, 1, 3).reshape(
                query.shape[0], query.shape[1], self.embed_dim)
            return c_proj(out)

        k = k_proj(tokens)
        v = v_proj(tokens)
        if self.spatial == "v2":
            cls = mha(q_proj(tokens[:, :1]), k, v)
            tok_map = c_proj(v[:, 1:])
            return jnp.concatenate([cls, tok_map], axis=1)
        if self.spatial:
            return mha(q_proj(tokens), k, v)
        return mha(q_proj(tokens[:, :1]), k, v)[:, 0]


class ModifiedResNet(nn.Module):
    """3-conv stem + avgpool + 4 stages + attention pooling
    (reference: models/clip_fsar.py:549-608)."""
    layers: Tuple[int, int, int, int]
    output_dim: int
    heads: int
    input_resolution: int = 224
    width: int = 64
    spatial: Union[bool, str] = False
    fp32_norms: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        bn_dt = jnp.float32 if self.fp32_norms else self.dtype
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=bn_dt, name=name)
        w = self.width
        x = nn.relu(bn("bn1")(nn.Conv(w // 2, (3, 3), strides=2, padding=1,
                                      use_bias=False, dtype=self.dtype,
                                      name="conv1")(x)))
        x = nn.relu(bn("bn2")(nn.Conv(w // 2, (3, 3), padding=1,
                                      use_bias=False, dtype=self.dtype,
                                      name="conv2")(x)))
        x = nn.relu(bn("bn3")(nn.Conv(w, (3, 3), padding=1, use_bias=False,
                                      dtype=self.dtype, name="conv3")(x)))
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))

        for stage, (blocks, planes, stride) in enumerate(zip(
                self.layers, (w, w * 2, w * 4, w * 8), (1, 2, 2, 2))):
            for b in range(blocks):
                x = Bottleneck(planes, stride if b == 0 else 1,
                               fp32_norms=self.fp32_norms, dtype=self.dtype,
                               name=f"layer{stage + 1}_{b}")(x, train=train)

        return AttentionPool2d(self.input_resolution // 32, w * 32,
                               self.heads, self.output_dim, self.spatial,
                               dtype=self.dtype, name="attnpool")(x)


# ---------------------------------------------------------------------------
# Transformer (shared by ViT visual tower and the text tower)
# ---------------------------------------------------------------------------

class ResidualAttentionBlock(nn.Module):
    """Pre-LN MHA + QuickGELU MLP with fused in-projection, mirroring torch
    nn.MultiheadAttention parameterisation for weight import
    (reference: models/clip_fsar.py:622-643)."""
    d_model: int
    n_head: int
    causal: bool = False
    fast_softmax: bool = False
    fp32_norms: bool = True
    # int8 projection/MLP matmuls (dynamic quant, ops/quant.py) — EVAL
    # ONLY: round() has zero gradient, so the caller passes int8=False
    # whenever the result is differentiated. Same param tree either way.
    int8: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.int8:
            from ...ops.quant import Int8Dense as Dense
        else:
            Dense = nn.Dense
        h = FP32LayerNorm(self.fp32_norms, name="ln_1")(x)
        qkv = Dense(3 * self.d_model, dtype=self.dtype, name="in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = self.d_model // self.n_head

        def split(t):
            return t.reshape(t.shape[0], t.shape[1], self.n_head,
                             hd).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q), split(k), split(v)
        attn = jnp.einsum("bhid,bhjd->bhij", qh, kh,
                          preferred_element_type=jnp.float32) * hd ** -0.5
        if self.causal:
            L = x.shape[1]
            mask = jnp.tril(jnp.ones((L, L), dtype=bool))
            attn = jnp.where(mask[None, None], attn, -jnp.inf)
        if self.fast_softmax:
            m = jax.lax.stop_gradient(attn.max(-1, keepdims=True))
            e = jnp.exp(attn - m).astype(vh.dtype)
            attn = e / e.sum(-1, keepdims=True)
        else:
            attn = jax.nn.softmax(attn, axis=-1).astype(vh.dtype)
        # named checkpoints for the "attn" remat policy (visual.py
        # encode_chunked): identity tags, free unless a
        # save_only_these_names policy is active
        from jax.ad_checkpoint import checkpoint_name

        attn = checkpoint_name(attn, "attn_probs")
        out = jnp.einsum("bhij,bhjd->bhid", attn, vh)
        out = out.transpose(0, 2, 1, 3).reshape(x.shape[0], x.shape[1],
                                                self.d_model)
        out = checkpoint_name(out, "attn_out")
        out = Dense(self.d_model, dtype=self.dtype, name="out_proj")(out)
        x = x + out

        h = FP32LayerNorm(self.fp32_norms, name="ln_2")(x)
        h = Dense(4 * self.d_model, dtype=self.dtype, name="c_fc")(h)
        h = quick_gelu(h)
        # tag for the "mlp" remat policy: saving the gelu output lets the
        # backward skip re-doing the c_fc matmul + gelu (the largest single
        # recompute block left under "attn_out") at 4*d_model per token
        h = checkpoint_name(h, "mlp_gelu")
        h = Dense(self.d_model, dtype=self.dtype, name="c_proj")(h)
        return x + h


class TransformerStack(nn.Module):
    """(reference: models/clip_fsar.py:645-653)"""
    width: int
    layers: int
    heads: int
    causal: bool = False
    fast_softmax: bool = False
    fp32_norms: bool = True
    int8: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, int8: bool | None = None):
        use_int8 = self.int8 if int8 is None else int8
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.width, self.heads,
                                       causal=self.causal,
                                       fast_softmax=self.fast_softmax,
                                       fp32_norms=self.fp32_norms,
                                       int8=use_int8,
                                       dtype=self.dtype,
                                       name=f"resblock_{i}")(x)
        return x


class VisionTransformer(nn.Module):
    """patch conv -> [cls]+pos -> pre-LN transformer -> ln_post+proj
    (reference: models/clip_fsar.py:655-689)."""
    input_resolution: int
    patch_size: int
    width: int
    layers: int
    heads: int
    output_dim: int
    fast_softmax: bool = False
    fp32_norms: bool = True
    # dynamic-int8 projection/MLP matmuls at EVAL (train keeps bf16/fp32 —
    # quantization has zero gradient); see ops/quant.py + CLIPArch.int8_eval
    int8_eval: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        # x: [N, H, W, 3]
        p = self.patch_size
        x = nn.Conv(self.width, (p, p), strides=p, use_bias=False,
                    padding="VALID", dtype=self.dtype, name="conv1")(x)
        N, gh, gw, C = x.shape
        x = x.reshape(N, gh * gw, C)
        scale = self.width ** -0.5
        cls = self.param("class_embedding",
                         lambda key, shape: scale * jax.random.normal(key, shape),
                         (self.width,))
        pos = self.param("positional_embedding",
                         lambda key, shape: scale * jax.random.normal(key, shape),
                         (gh * gw + 1, self.width))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (N, 1, self.width)), x], axis=1)
        x = x + pos[None].astype(x.dtype)
        x = FP32LayerNorm(self.fp32_norms, name="ln_pre")(x)
        x = TransformerStack(self.width, self.layers, self.heads,
                             fast_softmax=self.fast_softmax,
                             fp32_norms=self.fp32_norms,
                             dtype=self.dtype, name="transformer")(
            x, int8=self.int8_eval and not train)
        x = FP32LayerNorm(self.fp32_norms, name="ln_post")(x[:, 0])
        proj = self.param("proj",
                          lambda key, shape: scale * jax.random.normal(key, shape),
                          (self.width, self.output_dim))
        return x @ proj.astype(x.dtype)


# ---------------------------------------------------------------------------
# Full CLIP
# ---------------------------------------------------------------------------

class CLIPModel(nn.Module):
    """Joint image/text model (reference: models/clip_fsar.py:691-821)."""
    arch: CLIPArch
    dtype: Dtype = jnp.float32

    def setup(self):
        a = self.arch
        if a.is_vit:
            self.visual = VisionTransformer(
                input_resolution=a.image_resolution,
                patch_size=a.vision_patch_size, width=a.vision_width,
                layers=a.vision_layers, heads=a.vision_heads,
                output_dim=a.embed_dim, fast_softmax=a.fast_softmax,
                fp32_norms=not a.bf16_norms, dtype=self.dtype)
        else:
            self.visual = ModifiedResNet(
                layers=a.vision_layers, output_dim=a.embed_dim,
                heads=a.vision_heads, input_resolution=a.image_resolution,
                width=a.vision_width, spatial=a.spatial,
                fp32_norms=not a.bf16_norms, dtype=self.dtype)
        self.transformer = TransformerStack(
            a.transformer_width, a.transformer_layers, a.transformer_heads,
            causal=True, dtype=self.dtype)
        self.token_embedding = nn.Embed(a.vocab_size, a.transformer_width,
                                        dtype=self.dtype)
        self.positional_embedding = self.param(
            "positional_embedding",
            lambda key, shape: 0.01 * jax.random.normal(key, shape),
            (a.context_length, a.transformer_width))
        self.ln_final = FP32LayerNorm()
        self.text_projection = self.param(
            "text_projection",
            lambda key, shape: a.transformer_width ** -0.5
            * jax.random.normal(key, shape),
            (a.transformer_width, a.embed_dim))
        self.logit_scale = self.param(
            "logit_scale", lambda key, shape: jnp.full(shape, np.log(1 / 0.07)),
            ())

    def encode_image(self, image, *, train: bool = False):
        """image: [N, H, W, 3] -> [N, embed_dim] (or token map if spatial)."""
        return self.visual(image, train=train)

    def encode_text(self, text):
        """text: [B, context_length] int tokens -> [B, embed_dim]
        (reference: models/clip_fsar.py:793-805). Batched: one call encodes
        every prompt at once."""
        x = self.token_embedding(text.astype(jnp.int32))
        x = x + self.positional_embedding[None, : x.shape[1]].astype(x.dtype)
        x = self.transformer(x)
        x = self.ln_final(x)
        # pool the EOT token (highest token id in each row)
        eot = jnp.argmax(text, axis=-1)
        pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
        return pooled @ self.text_projection.astype(pooled.dtype)

    def __call__(self, image, text, *, train: bool = False):
        img = self.encode_image(image, train=train)
        txt = self.encode_text(text)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        logits_per_image = scale * img @ txt.T
        return logits_per_image, logits_per_image.T


def available_models() -> list:
    """Named CLIP architectures (reference: models/clip_fsar.py:216-218
    ``available_models``). Weights load from a local checkpoint via
    ``torch_import.load_clip_checkpoint`` — no network download here."""
    return [n for n in CLIP_ARCHS if not n.startswith("test-")]


def build_clip(name_or_arch: Union[str, CLIPArch],
               dtype: Dtype = jnp.float32,
               spatial: Union[bool, str] = False) -> CLIPModel:
    arch = (CLIP_ARCHS[name_or_arch]
            if isinstance(name_or_arch, str) else name_or_arch)
    if spatial:
        arch = dataclasses.replace(arch, spatial=spatial)
    return CLIPModel(arch=arch, dtype=dtype)


def init_clip_params(model: CLIPModel, rng: jax.Array):
    """Initialise parameter/batch-stats trees with dummy static-shape inputs."""
    a = model.arch
    img = jnp.zeros((1, a.image_resolution, a.image_resolution, 3),
                    model.dtype)
    txt = jnp.zeros((1, a.context_length), jnp.int32)
    # jitted: eager init costs one tunnel round-trip PER OP on a remote
    # backend (minutes for the full CLIP tower); jitted it is one dispatch
    variables = jax.jit(model.init)({"params": rng}, img, txt)
    return variables
