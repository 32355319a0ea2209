"""CPM2C head: cross-modal prototype modulation with motion consistency.

(reference: models/model_cpm2c.py) Multiscale motion fusion (k=1 / k=3 /
dilated-3 temporal convs + 1x1 fuse, :166-197), gated text/vision fusion with
class-token "fake" variants through a joint ``context2`` transformer
(``text_eh_temporal_transformer``, :330-417), motion+appearance consistency
distances (:253-279), global token distances (:282-290), OTAM local frame
alignment (:292-299), video->text classification logits (:419-431), and the
(bypassed-in-reference) visual prompt generators ``meta_net``/``meta_net_2``
(:474-492) plus the 6-layer ``TemporalTransformer`` video adapter (:433-459),
both available behind flags.

The reference requires NNI-tuned ``cfg.params`` keys that run/run.py never
supplies (SURVEY §2.8 defect 9); ``CPM2C_DEFAULT_PARAMS`` fills them with
neutral defaults so the model is constructible out of the box.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.otam import otam_distance
from ..backbones.clip import CLIPArch
from ..blocks import TransformerV1, class_prototypes, cos_sim
from ..visual import encode_chunked, make_clip_visual

Dtype = Any

# neutral defaults for the NNI-tuned hyperparameters the reference expects in
# cfg.params (reference: models/model_cpm2c.py:102-138, run/main_run.py:372)
CPM2C_DEFAULT_PARAMS: Dict[str, float] = dict(
    mid_dim_text=1.5, mid_dim_vision=0.5, negative_slope=0.01, alpha=0.2,
    motion_residual_ratio=0.5, lambdas0=1.0, lambdas1=1.0, lambdas2=0.0,
    lambdas3=0.0, prompt_patch=16, hid_dim=64, prompt_patch_2=3,
    prompt_patch_22=3, hid_dim_2=8, prompts_2_weight=0.1,
    support_prompt_ratio=0.1, target_prompt_ratio=0.1,
)


def _consist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """mean over items of squared frobenius norm (reference:
    models/model_cpm2c.py:254-274)."""
    diff = (a - b).astype(jnp.float32)
    return jnp.mean(jnp.sum(diff * diff, axis=(-2, -1)))


class CPM2CModel(nn.Module):
    arch: CLIPArch
    way: int
    shot: int
    params: Mapping[str, float]
    motion_coeff: float = 0.5
    normal_coeff: float = 0.5
    transformer_depth: int = 1
    use_classification: bool = True
    use_contrastive: bool = False
    single_direct: bool = False
    merge_before: bool = False
    use_visual_prompts: bool = False
    use_video_adapter: bool = False
    dtype: Dtype = jnp.float32
    backbone_override: Any = None
    # eval-time VMEM-friendly chunked encode (visual.encode_chunked)
    encode_chunk: int = 0
    # remat-chunked training encode (ViT only; see visual.encode_chunked)
    train_encode_chunk: int = 0   # 0=off, True/1=eval width, >1=width
    train_remat_policy: str = "full"  # "full"|"dots"|"attn"|"attn_out" (visual.encode_chunked)
    # OTAM DP backend: "scan" or "pallas" (config key MODEL.OTAM_BACKEND)
    otam_backend: str = "scan"

    def setup(self):
        d = self.arch.embed_dim
        p = {**CPM2C_DEFAULT_PARAMS, **dict(self.params)}
        self.p = p
        self.backbone = (self.backbone_override
                         or make_clip_visual(self.arch, dtype=self.dtype,
                                             name="backbone"))
        self.context2 = TransformerV1(dim=d, heads=8, dim_head_k=d // 8,
                                      dropout_atte=0.2,
                                      depth=self.transformer_depth,
                                      dtype=self.dtype, name="context2")
        self.scale = self.param("scale", lambda key, shape: jnp.ones(shape),
                                ())
        self.class_token = self.param(
            "class_token", nn.initializers.normal(1.0), (1, 1, d))
        self.class_token_motion = self.param(
            "class_token_motion", nn.initializers.normal(1.0), (1, 1, d))
        # gating MLPs (reference :103-114)
        self.gate_text_fc1 = nn.Dense(int(d * p["mid_dim_text"]),
                                      dtype=self.dtype, name="gate_text_fc1")
        self.gate_text_fc2 = nn.Dense(d, dtype=self.dtype,
                                      name="gate_text_fc2")
        self.gate_vision_fc1 = nn.Dense(int(d * p["mid_dim_vision"]),
                                        dtype=self.dtype,
                                        name="gate_vision_fc1")
        self.gate_vision_fc2 = nn.Dense(d, dtype=self.dtype,
                                        name="gate_vision_fc2")
        # multiscale motion convs (reference :135-138)
        self.motion_conv1_1 = nn.Conv(d, (1,), dtype=self.dtype,
                                      name="motion_conv1_1")
        self.motion_conv1_3 = nn.Conv(d, (3,), padding=1, dtype=self.dtype,
                                      name="motion_conv1_3")
        self.motion_conv1_5 = nn.Conv(d, (3,), padding=2, kernel_dilation=2,
                                      dtype=self.dtype, name="motion_conv1_5")
        self.scale_conv = nn.Conv(d, (1,), dtype=self.dtype,
                                  name="scale_conv")
        # visual prompt generators (reference :116-132; bypassed by default)
        self.meta_fc1 = nn.Dense(int(p["hid_dim"]), dtype=self.dtype,
                                 name="meta_fc1")
        self.meta_fc2 = nn.Dense(3 * int(p["prompt_patch"]) ** 2,
                                 dtype=self.dtype, name="meta_fc2")
        n2, n22 = int(p["prompt_patch_2"]), int(p["prompt_patch_22"])
        self.meta_conv1 = nn.Conv(int(p["hid_dim_2"]), (n2, n2),
                                  padding=(n2 - 1) // 2, dtype=self.dtype,
                                  name="meta_conv1")
        self.meta_conv2 = nn.Conv(3, (n22, n22), padding=(n22 - 1) // 2,
                                  dtype=self.dtype, name="meta_conv2")
        if self.use_video_adapter:
            # 6-layer CLIP-style temporal transformer video->text adapter
            # with frame position embeddings (reference :94-99, :433-459,
            # :494-544; bypassed in the shipped forward)
            from ..backbones.clip import TransformerStack

            self.frame_position_embeddings = nn.Embed(
                77, d, dtype=self.dtype, name="frame_position_embeddings")
            self.temporal_transformer = TransformerStack(
                d, 6, max(1, 512 // 64), dtype=self.dtype,
                name="temporal_transformer")

    # -- submodules ----------------------------------------------------------

    def _gate_fuse(self, frames, token):
        """Gated text/vision fusion (reference :339-343)."""
        gt = nn.leaky_relu(self.gate_text_fc1(token),
                           negative_slope=self.p["negative_slope"])
        gt = jax.nn.sigmoid(self.gate_text_fc2(gt))
        gv = nn.leaky_relu(self.gate_vision_fc1(frames),
                           negative_slope=self.p["negative_slope"])
        gv = jax.nn.sigmoid(self.gate_vision_fc2(gv))
        return token * gt * self.p["alpha"] + frames * gv

    def _fuse_and_transform(self, frames, token, *, det):
        fused = self._gate_fuse(frames, token)
        x = jnp.concatenate([jnp.broadcast_to(token, (frames.shape[0], 1,
                                                      frames.shape[-1])),
                             fused], axis=1)
        return self.context2(x, x, x, deterministic=det)

    def _multiscale_motion(self, feats):
        """(reference :166-197) feats: [N, T, D] -> [N, T-1, D] motion."""
        f1 = self.motion_conv1_1(feats)
        f3 = self.motion_conv1_3(feats)
        f5 = self.motion_conv1_5(feats)
        fused = self.scale_conv(jnp.concatenate([f1, f3, f5], axis=-1))
        conv = fused * self.p["motion_residual_ratio"] + feats
        fwd = conv[:, 1:, :] - feats[:, :-1, :]
        bwd = conv[:, :-1, :] - feats[:, 1:, :]
        return 0.5 * (fwd + bwd)

    def _text_eh(self, context_support, su, qu, su_l, token, tcs, *, det):
        """(reference :330-417)"""
        d = su.shape[-1]
        token = token.astype(su.dtype)
        # real target (consistency reference)
        qu_contra = self._fuse_and_transform(qu, tcs, det=det)
        # fake support (consistency reference)
        su_contra = self._fuse_and_transform(su, token, det=det)
        # fake target (the features used downstream)
        qu_out = self._fuse_and_transform(qu, token, det=det)
        # real support
        if self.merge_before:
            su_m = class_prototypes(su, su_l, self.way)
            cs_m = class_prototypes(context_support, su_l, self.way)
            su_out = self._fuse_and_transform(su_m, cs_m, det=det)
            su_pro = su_out
        else:
            su_out = self._fuse_and_transform(su, context_support, det=det)
            su_pro = class_prototypes(su_out, su_l, self.way)
        return su_out, qu_out, su_pro, su_contra, qu_contra

    def _otam(self, support, query):
        return otam_distance(support.astype(jnp.float32),
                             query.astype(jnp.float32), lbda=0.5,
                             bidirectional=not self.single_direct,
                             backend=self.otam_backend)

    def _global_distance(self, su_g, su_l, qu):
        """(reference :319-328) su_g: [S, D]; qu: [Q, T+1, D] -> [way, Q]."""
        dists = 1 - cos_sim(qu.astype(jnp.float32),
                            su_g.astype(jnp.float32))      # [Q, T+1, S]
        per_support = dists.sum(axis=1)                     # [Q, S]
        per_class = class_prototypes(per_support.T, su_l, self.way) \
            * jnp.asarray(su_g.shape[0] / self.way, jnp.float32)
        # reference *sums* over class members (index_select + sum), hence the
        # rescale of the segment mean by members-per-class
        if self.use_contrastive:
            per_class = per_class * self.scale
        return per_class                                     # [way, Q]

    def get_prompts(self, x):
        """Visual prompt generators (reference :474-492); x: [N, H, W, 3]."""
        N, H, W, C = x.shape
        n = int(self.p["prompt_patch"])
        hp, wp = H // n, W // n
        patches = x.reshape(N, hp, n, wp, n, C).transpose(0, 1, 3, 2, 4, 5)
        patches = patches.reshape(N * hp * wp, n * n * C)
        local = self.meta_fc2(nn.relu(self.meta_fc1(patches)))
        local = local.reshape(N, hp, wp, n, n, C).transpose(0, 1, 3, 2, 4, 5)
        local = local.reshape(N, H, W, C)
        glob = self.meta_conv2(nn.relu(self.meta_conv1(x)))
        return local + self.p["prompts_2_weight"] * glob

    # -- forward -------------------------------------------------------------

    def __call__(self, support_images, target_images, support_labels,
                 real_support_labels, real_target_labels,
                 text_train, text_test, *,
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        det = not train
        S, T = support_images.shape[:2]
        Q = target_images.shape[0]
        if self.use_visual_prompts:
            sup_f = support_images.reshape((S * T,) + support_images.shape[2:])
            tgt_f = target_images.reshape((Q * T,) + target_images.shape[2:])
            sup_f = sup_f + self.get_prompts(sup_f) \
                * self.p["support_prompt_ratio"]
            tgt_f = tgt_f + self.get_prompts(tgt_f) \
                * self.p["target_prompt_ratio"]
            support_images = sup_f.reshape(support_images.shape)
            target_images = tgt_f.reshape(target_images.shape)

        both = jnp.concatenate(
            [support_images.reshape((S * T,) + support_images.shape[2:]),
             target_images.reshape((Q * T,) + target_images.shape[2:])],
            axis=0).astype(self.dtype)
        feats = encode_chunked(self.backbone, both, self.encode_chunk,
                               train=train,
                               train_chunk=self.train_encode_chunk,
                               remat_policy=self.train_remat_policy)
        D = feats.shape[-1]
        su = feats[: S * T].reshape(S, T, D)
        qu = feats[S * T:].reshape(Q, T, D)
        return self.match_features(su, qu, support_labels,
                                   real_support_labels, real_target_labels,
                                   text_train, text_test, train=train)

    def feature_cacheable(self) -> bool:
        """Visual prompts are applied to PIXELS with role-dependent ratios
        (``support_prompt_ratio`` vs ``target_prompt_ratio``, reference:
        models/model_cpm2c.py:474-492), so with them active one video's
        features differ by role and cannot be cached per-video."""
        return not self.use_visual_prompts

    def encode(self, images, *, train: bool = False) -> jnp.ndarray:
        """``[N, T, H, W, 3]`` -> ``[N, T, D]`` (train/feature_cache.py)."""
        if self.use_visual_prompts:
            raise ValueError(
                "cpm2c with MODEL.USE_VISUAL_PROMPTS applies role-dependent "
                "pixel prompts before the backbone — per-video features are "
                "not cacheable (see feature_cacheable)")
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
        """Head over precomputed features (post-encode tail of
        :meth:`__call__`)."""
        det = not train
        table = text_train if train else text_test
        cs = table[real_support_labels][:, None, :].astype(self.dtype)
        tcs = table[real_target_labels][:, None, :].astype(self.dtype)

        su_mo = self._multiscale_motion(su)
        qu_mo = self._multiscale_motion(qu)

        # video->text classification against the *active* split's table
        # (reference :419-431 — unlike clipfsar, which always uses train)
        class_logits = None
        if self.use_classification:
            feats = jnp.concatenate([su, qu], axis=0)
            if self.use_video_adapter:
                # residual temporal transformer over frames (reference
                # :440-455) before pooling
                pos = self.frame_position_embeddings(
                    jnp.arange(feats.shape[1], dtype=jnp.int32))
                h = feats + pos[None].astype(feats.dtype)
                h = self.temporal_transformer(h) + feats
                pooled = h.mean(axis=1)
            else:
                pooled = feats.mean(axis=1)
            class_logits = cos_sim(pooled.astype(jnp.float32),
                                   table.astype(jnp.float32)) * self.scale

        su_mo2, qu_mo2, su_mo_pro, su_mo_c, qu_mo_c = self._text_eh(
            cs, su_mo, qu_mo, support_labels, self.class_token_motion, tcs,
            det=det)
        su2, qu2, su_pro, su_c, qu_c = self._text_eh(
            cs, su, qu, support_labels, self.class_token, tcs, det=det)

        consist_motion = _consist(qu_mo2, qu_mo_c) + _consist(su_mo2, su_mo_c)
        consist = _consist(qu2, qu_c) + _consist(su2, su_c)
        consist_total = (self.normal_coeff * consist
                         + self.motion_coeff * consist_motion)

        g_motion = self._global_distance(su_mo2[:, 0, :], support_labels,
                                         qu_mo2)
        g_normal = self._global_distance(su2[:, 0, :], support_labels, qu2)
        class_dists_g = (self.normal_coeff * g_normal
                         + self.motion_coeff * g_motion).T      # [Q, way]

        cum = self._otam(su_pro[:, 1:, :], qu2[:, 1:, :])
        cum_mo = self._otam(su_mo_pro[:, 1:, :], qu_mo2[:, 1:, :])
        class_dists_l = self.normal_coeff * cum + self.motion_coeff * cum_mo

        out = {
            "logits_local": -class_dists_l[None],
            "logits_global": -class_dists_g[None],
            "target_consist_distance": consist_total,
            "logits": -class_dists_l[None],   # default accuracy stream
        }
        if class_logits is not None:
            out["class_logits"] = class_logits[None]
        return out
