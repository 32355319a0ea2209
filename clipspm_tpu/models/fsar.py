"""Full FSAR models: backbone + matching head behind one jittable call.

The reference dispatches head classes by ``cfg.MODEL.NAME`` inside the
trainer (reference: run/main_run.py:110-137) and each head owns its backbone.
Here a model is one flax Module: the backbone encodes the concatenated
support+query frame stream once, and the head consumes per-frame features.
Text tables are inputs (gathered per episode by the caller), so the whole
forward is a pure function of (params, episode) — jit/vmap/shard-map ready.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional

import flax.linen as nn
import jax.numpy as jnp

from .backbones.clip import CLIP_ARCHS, CLIPArch
from .visual import (IdentityBackbone, encode_chunked,  # noqa: F401 (re-export)
                     make_clip_visual)
from .heads.clipspm import CLIPSPM

Dtype = Any


class CLIPSPMModel(nn.Module):
    """CLIP visual tower + CLIPSPM head (reference: models/model_clipspm.py).

    Uniform model call signature (shared by every head; shapes:
    S=way*shot, Q=way*queries, T=seq_len, C=num classes in split):
        support_images: [S, T, H, W, 3] float (0-1)
        target_images: [Q, T, H, W, 3]
        support_labels: [S] int32 episode-relative
        real_support_labels: [S] int32 dataset-level (text-table rows)
        real_target_labels: [Q] int32
        text_train: [C_train, D] text feature table (zeros for non-CLIP heads)
        text_test: [C_test, D]
    The train/test table choice follows the reference's ``self.training``
    switch (reference: models/model_clipspm.py:116-121).
    Returns dict(logits=[1, Q, way], dists=scalar).
    """
    arch: CLIPArch
    way: int
    shot: int
    spm: Mapping[str, float]
    single_direct: bool = False
    dtype: Dtype = jnp.float32
    # eval-time VMEM-friendly chunked encode (see visual.encode_chunked)
    encode_chunk: int = 0
    # chunk the training encode too (ViT only: no BN/dropout in the tower);
    # scan-carried residuals cut backward peak HBM ~N/chunk-fold
    train_encode_chunk: int = 0   # 0=off, True/1=eval width, >1=width
    # backward memory/recompute trade for the chunked train encode
    # ("full" | "dots" — see visual.encode_chunked)
    train_remat_policy: str = "full"
    otam_backend: str = "scan"

    def setup(self):
        self.backbone = make_clip_visual(self.arch, dtype=self.dtype,
                                         name="backbone")
        self.head = CLIPSPM(dim=self.arch.embed_dim, way=self.way,
                            shot=self.shot, spm=self.spm,
                            single_direct=self.single_direct,
                            otam_backend=self.otam_backend,
                            dtype=self.dtype, name="head")

    def __call__(self, support_images, target_images, support_labels,
                 real_support_labels, real_target_labels,
                 text_train, text_test, *,
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        S, T = support_images.shape[:2]
        Q = target_images.shape[0]
        both = jnp.concatenate(
            [support_images.reshape((S * T,) + support_images.shape[2:]),
             target_images.reshape((Q * T,) + target_images.shape[2:])],
            axis=0).astype(self.dtype)
        feats = encode_chunked(self.backbone, both, self.encode_chunk,
                               train=train,
                               train_chunk=self.train_encode_chunk,
                               remat_policy=self.train_remat_policy)
        dim = feats.shape[-1]
        su = feats[: S * T].reshape(S, T, dim)
        qu = feats[S * T:].reshape(Q, T, dim)
        return self.match_features(su, qu, support_labels,
                                   real_support_labels, real_target_labels,
                                   text_train, text_test, train=train)

    def feature_cacheable(self) -> bool:
        """Per-video features fully determine this head's inputs
        (train/feature_cache.py)."""
        return True

    def encode(self, images, *, train: bool = False) -> jnp.ndarray:
        """``[N, T, H, W, 3]`` frames -> ``[N, T, D]`` per-frame features.

        The cacheable pixel->feature stage of :meth:`__call__`; at eval the
        transform + frame-index policy is deterministic per video, so these
        features can be computed once per unique video and reused across
        episodes (train/feature_cache.py)."""
        N, T = images.shape[:2]
        flat = images.reshape((N * T,) + images.shape[2:]).astype(self.dtype)
        feats = encode_chunked(self.backbone, flat, self.encode_chunk,
                               train=train,
                               train_chunk=self.train_encode_chunk,
                               remat_policy=self.train_remat_policy)
        return feats.reshape(N, T, feats.shape[-1])

    def match_features(self, su, qu, support_labels,
                       real_support_labels, real_target_labels,
                       text_train, text_test, *,
                       train: bool = False) -> Dict[str, jnp.ndarray]:
        """Head over precomputed features ``su [S,T,D]`` / ``qu [Q,T,D]``
        (the post-encode tail of :meth:`__call__`)."""
        table = text_train if train else text_test
        context_support = table[real_support_labels][:, None, :]
        target_context = table[real_target_labels][:, None, :]
        return self.head(su, qu, support_labels, context_support,
                         target_context, train=train)


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def build_model(cfg, arch_override: Optional[str] = None) -> nn.Module:
    """Construct the model named by ``cfg.MODEL.NAME``
    (reference: run/main_run.py:110-131)."""
    name = cfg.MODEL.NAME
    backbone = arch_override or cfg.MODEL.BACKBONE
    dtype = jnp.bfloat16 if cfg.get("USE_AMP", False) else jnp.float32

    def clip_arch():
        arch = CLIP_ARCHS[backbone]
        if cfg.MODEL.get("FAST_SOFTMAX", False):
            arch = dataclasses.replace(arch, fast_softmax=True)
        if cfg.MODEL.get("BF16_NORMS", False):
            arch = dataclasses.replace(arch, bf16_norms=True)
        if cfg.MODEL.get("INT8_EVAL", False):
            if not arch.is_vit:
                raise ValueError(
                    "MODEL.INT8_EVAL currently covers the ViT tower's "
                    "projection/MLP matmuls only (the RN50 conv tower has "
                    "no int8 path)")
            arch = dataclasses.replace(arch, int8_eval=True)
        return arch

    way, shot = int(cfg.TRAIN.WAY), int(cfg.TRAIN.SHOT)
    seq_len = int(cfg.DATA.SEQ_LEN)
    # Chunked-encode defaults (see visual.encode_chunked). For full-size CLIP
    # ViT backbones the defaults are ON so the out-of-box config both runs
    # fast (30-frame VMEM-resident eval chunks, ~35% faster eval) and FITS
    # (the unchunked 240-frame ViT-B/16 train backward wants 44.9 G of
    # residuals — more HBM than a v5e chip has; the remat-chunked train
    # encode is gradient-exact, tests/test_train_encode_chunk.py). Both are
    # config-overridable; non-CLIP (BatchNorm) backbones default off, and
    # train chunking is rejected for them (scan-broadcast batch stats
    # cannot update, and per-chunk BN batch statistics would differ).
    is_full_vit = (backbone in CLIP_ARCHS and CLIP_ARCHS[backbone].is_vit
                   and backbone != "test-tiny")
    chunk_cfg = cfg.MODEL.get("ENCODE_CHUNK", None)
    if chunk_cfg is None:
        chunk = 30 if is_full_vit else 0
    elif chunk_cfg is True:
        # "enable at the default width" — without this, YAML `true` would
        # parse as width 1: a 240-step scan of single-frame backbone calls
        chunk = 30
    else:
        chunk = int(chunk_cfg or 0)
    # train width default 40: the train-step optimum differs from eval's 30
    # (measured 3.17 vs 2.92 eps/s on v5e — remat recompute amortizes
    # better over slightly larger chunks). TRAIN_ENCODE_CHUNK: false/0=off,
    # true/1=reuse ENCODE_CHUNK, >1=explicit width.
    tec_cfg = cfg.MODEL.get("TRAIN_ENCODE_CHUNK", None)
    train_chunk = (40 if is_full_vit else 0) if tec_cfg is None else int(
        tec_cfg or 0)
    if train_chunk == 1 and not chunk:
        # TRAIN_ENCODE_CHUNK: true means "reuse the eval width" — but with
        # ENCODE_CHUNK: 0 there is no eval width to reuse, and silently
        # disabling train chunking would re-expose the 44.9 G unchunked
        # backward the user explicitly opted out of. Fall back to the
        # measured 40-frame train default instead.
        train_chunk = 40
    if train_chunk and not (backbone in CLIP_ARCHS
                            and CLIP_ARCHS[backbone].is_vit):
        raise ValueError(
            "MODEL.TRAIN_ENCODE_CHUNK requires a CLIP ViT backbone: "
            f"{backbone!r} has BatchNorm batch statistics, which cannot be "
            "updated inside the chunked-encode scan and would make per-chunk "
            "training semantics differ from the unchunked step")
    otam_backend = str(cfg.MODEL.get("OTAM_BACKEND", "scan") or "scan")
    # backward memory/recompute trade for the chunked train encode (see
    # visual.encode_chunked). Default "attn_out": saves the per-chunk
    # attention outputs (~0.9 G at the 240-frame ViT-B/16 step) so the
    # backward skips recomputing the memory-bound qk^T+softmax chain —
    # measured 3.74 vs 3.48 eps/s (+7.7%) over "full" at the production
    # accumulated step on v5e, numerics identical (remat policies change
    # recompute scheduling, not math — tests/test_train_encode_chunk.py).
    # Only consulted when train chunking is active (ViT towers).
    remat_policy = str(cfg.MODEL.get("TRAIN_REMAT_POLICY", "attn_out")
                       or "attn_out")
    # test-size resnet trunks use a narrow width
    rn_width = 8 if backbone == "test-tiny-resnet" else 64
    rn_arch = "resnet18" if backbone == "test-tiny-resnet" else backbone

    if name == "clipspm":
        arch = clip_arch()
        return CLIPSPMModel(
            arch=arch, way=way, shot=shot, encode_chunk=chunk,
            train_encode_chunk=train_chunk,
            train_remat_policy=remat_policy,
            otam_backend=otam_backend,
            spm=dict(cfg.params), dtype=dtype,
            single_direct=bool(cfg.MODEL.get("SINGLE_DIRECT", False)))
    if name == "clipfsar":
        from .heads.clipfsar import CLIPFSARModel

        m = cfg.MODEL
        return CLIPFSARModel(
            arch=clip_arch(), way=way, shot=shot, dtype=dtype,
            encode_chunk=chunk, train_encode_chunk=train_chunk,
            train_remat_policy=remat_policy,
            otam_backend=otam_backend,
            transformer_depth=int(m.get("TRANSFORMER_DEPTH", 1) or 1),
            use_classification=bool(m.get("USE_CLASSIFICATION", True)),
            single_direct=bool(m.get("SINGLE_DIRECT", False)),
            merge_before=bool(m.get("MERGE_BEFORE", False)),
            eval_text=bool(m.get("EVAL_TEXT", False)),
            combine=bool(m.get("COMBINE", False)),
            text_coff=float(m.get("TEXT_COFF", 0) or 0.9))
    if name == "sten":
        from .heads.sten import STENModel

        return STENModel(arch=clip_arch(), way=way, shot=shot,
                         dtype=dtype, encode_chunk=chunk,
                         train_encode_chunk=train_chunk,
                         train_remat_policy=remat_policy)
    if name == "otam":
        from .heads.otam import OTAMModel

        return OTAMModel(way=way, shot=shot, arch=rn_arch,
                         backbone_width=rn_width, dtype=dtype,
                         encode_chunk=chunk, otam_backend=otam_backend)
    if name == "trx":
        from .heads.trx import TRXModel

        return TRXModel(way=way, shot=shot, seq_len=seq_len, encode_chunk=chunk,
                        temp_set=tuple(cfg.MODEL.get("TEMP_SET", (2, 3))),
                        out_dim=int(cfg.MODEL.get("TRANS_LINEAR_OUT_DIM",
                                                  1152)),
                        arch=rn_arch, backbone_width=rn_width,
                        dropout=float(cfg.MODEL.get("TRANS_DROPOUT", 0.1)),
                        dtype=dtype)
    if name == "strm":
        from .heads.strm import STRMModel

        return STRMModel(way=way, shot=shot, seq_len=seq_len,
                         encode_chunk=chunk,
                         temp_set=tuple(cfg.MODEL.get("TEMP_SET", (2,))),
                         out_dim=int(cfg.MODEL.get("TRANS_LINEAR_OUT_DIM",
                                                   1152)),
                         arch=rn_arch, backbone_width=rn_width,
                         dropout=float(cfg.MODEL.get("TRANS_DROPOUT", 0.1)),
                         dtype=dtype)
    if name == "molo":
        from .heads.molo import MoLoModel

        m = cfg.MODEL
        return MoLoModel(
            way=way, shot=shot, seq_len=seq_len, arch=rn_arch,
            encode_chunk=chunk,
            backbone_width=rn_width, dtype=dtype,
            num_class=int(cfg.DATA.get("NUM_CLASS", 64)),
            use_classification=bool(m.get("USE_CLASSIFICATION", True)),
            use_local=bool(m.get("USE_LOCAL", False)),
            use_contrastive=bool(m.get("USE_CONTRASTIVE", True)),
            temp_coff=float(m.get("TEMP_COFF", 0) or 0),
            logit_balance=float(m.get("LOGIT_BALANCE_COFF", 0) or 0.3),
            single_direct=bool(m.get("SINGLE_DIRECT", False)),
            heads=int(m.get("HEAD", 0) or 8),
            position_a=float(m.get("POSITION_A", 10.0)),
            position_b=float(m.get("POSITION_B", 1.0)))
    if name == "soap":
        from .heads.soap import SOAPModel

        return SOAPModel(way=way, shot=shot, seq_len=seq_len, encode_chunk=chunk,
                         temp_set=tuple(cfg.MODEL.get("TEMP_SET", (2,))),
                         out_dim=int(cfg.MODEL.get("TRANS_LINEAR_OUT_DIM",
                                                   1152)),
                         horizons=tuple(cfg.MODEL.get("O", (2, 3))),
                         cr=int(cfg.MODEL.get("cr", 16)),
                         arch=rn_arch, backbone_width=rn_width,
                         dropout=float(cfg.MODEL.get("TRANS_DROPOUT", 0.1)),
                         dtype=dtype)
    if name == "cpm2c":
        from .heads.cpm2c import CPM2CModel

        m = cfg.MODEL
        return CPM2CModel(
            arch=clip_arch(), way=way, shot=shot, encode_chunk=chunk,
            train_encode_chunk=train_chunk,
            otam_backend=otam_backend,
            params=dict(cfg.params), dtype=dtype,
            motion_coeff=float(m.get("MOTION_COFF", 0.5)),
            normal_coeff=float(m.get("NORMAL_COFF", 0.5)),
            transformer_depth=int(m.get("TRANSFORMER_DEPTH", 1) or 1),
            use_classification=bool(m.get("USE_CLASSIFICATION", True)),
            use_contrastive=bool(m.get("USE_CONTRASTIVE", False)),
            single_direct=bool(m.get("SINGLE_DIRECT", False)),
            merge_before=bool(m.get("MERGE_BEFORE", False)))
    if name == "ta2n":
        from .heads.ta2n import TA2NModel

        m = cfg.MODEL
        return TA2NModel(
            way=way, shot=shot, seq_len=seq_len, arch=rn_arch,
            encode_chunk=chunk,
            backbone_width=rn_width, dtype=dtype,
            dropout=float(m.get("DROPOUT", 0.5)),
            dist_norm=bool(m.get("DIST_NORM", False)),
            metric=str(m.get("METRIC", "cos")))
    raise NotImplementedError(f"model {name!r} not yet implemented")
