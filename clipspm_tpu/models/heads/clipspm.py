"""CLIP-SPM head: HSMR motion refinement + SPM semantic prototype modulation
+ PADM dual modulation.

TPU-first re-implementation of the paper model (reference:
models/model_clipspm.py). Differences from the reference that are *design*,
not semantics:

- the backbone runs once over the concatenated support+query frame batch
  (one large MXU-friendly matmul stream) instead of two calls
  (reference: models/model_clipspm.py:146-167);
- class prototypes/grouping use static-shape segment reductions instead of
  ``torch.unique`` + ``index_select`` python loops
  (reference: models/model_clipspm.py:133-137, 277-281);
- text features for the episode are gathered by the caller from a
  precomputed (templates x classes)-batched text-encoder table and passed in
  as inputs (reference recomputes per-class text captures at module init,
  models/model_clipspm.py:44-70);
- the OTAM DP is the batched wavefront kernel (ops/otam.py).

Semantic parity notes (kept faithful to the *shipped* reference code):
- ``consist`` / ``text`` distances are computed but enter the aux loss with
  weight 0 — in the reference the weighted combinations are commented out and
  both are literal 0 (reference: models/model_clipspm.py:258-267); enable
  them with ``use_consist_text=True`` which restores the commented formulas.
- logits = ``-(0.5 * class_dists + task_dist)`` (reference:
  models/model_clipspm.py:141).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.otam import otam_distance
from ..blocks import TransformerV1, FeedForward, class_prototypes, group_by_class

Dtype = Any


def _dis(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Mean squared L2 norm of (x - y) over the trailing feature dims
    (reference: models/model_clipspm.py:341-346)."""
    diff = (x - y).astype(jnp.float32)
    axes = (-2, -1) if diff.ndim >= 3 else (-1,)
    norm_sq = jnp.sum(diff * diff, axis=axes)
    return jnp.mean(norm_sq)


class CLIPSPM(nn.Module):
    """The clipspm matching head. Operates on per-frame backbone features.

    Attributes:
        dim: feature width (1024 for RN50, 512 for ViT-B/16; reference:
            models/model_clipspm.py:23,33).
        way/shot: episode layout (static).
        spm: per-dataset hyperparameters (mid_dim_vision/text,
            negative_slope, alpha, consist_1, text_dis, motion_alpha;
            reference: run/run.py:10-17).
    """
    dim: int
    way: int
    shot: int
    spm: Mapping[str, float]
    single_direct: bool = False
    use_consist_text: bool = False
    # OTAM DP backend: "scan" (anti-diagonal lax.scan wavefront) or "pallas"
    # (ops/otam_pallas.py VMEM kernel); config key MODEL.OTAM_BACKEND
    otam_backend: str = "scan"
    dtype: Dtype = jnp.float32

    def setup(self):
        d = self.dim
        p = self.spm
        self.motion_conv1 = nn.Conv(d, (3,), padding=1, dtype=self.dtype,
                                    name="motion_conv1")
        self.motion_conv2 = nn.Conv(d, (3,), padding=1, dtype=self.dtype,
                                    name="motion_conv2")
        self.token_tr = FeedForward(d, 2048, dropout=0.05, dtype=self.dtype,
                                    name="token_tr")
        self.context1 = TransformerV1(dim=d, heads=8, dim_head_k=256,
                                      dropout_atte=0.2, dtype=self.dtype,
                                      name="context1")
        self.context2 = TransformerV1(dim=d, heads=8, dim_head_k=256,
                                      dropout_atte=0.2, dtype=self.dtype,
                                      name="context2")
        self.mo_alpha1 = self.param("mo_alpha1",
                                    lambda key, shape: jnp.ones(shape), ())
        self.scale = self.param("scale",
                                lambda key, shape: jnp.ones(shape), ())
        # gating MLPs (reference: models/model_clipspm.py:88-99)
        self.gate_text_fc1 = nn.Dense(int(d * p["mid_dim_text"]),
                                      dtype=self.dtype, name="gate_text_fc1")
        self.gate_text_fc2 = nn.Dense(d, dtype=self.dtype,
                                      name="gate_text_fc2")
        self.gate_vision_fc1 = nn.Dense(int(d * p["mid_dim_vision"]),
                                        dtype=self.dtype,
                                        name="gate_vision_fc1")
        self.gate_vision_fc2 = nn.Dense(d, dtype=self.dtype,
                                        name="gate_vision_fc2")

    # -- submodules ---------------------------------------------------------

    def _gate_text(self, x):
        h = nn.leaky_relu(self.gate_text_fc1(x),
                          negative_slope=self.spm["negative_slope"])
        return jax.nn.sigmoid(self.gate_text_fc2(h))

    def _gate_vision(self, x):
        h = nn.leaky_relu(self.gate_vision_fc1(x),
                          negative_slope=self.spm["negative_slope"])
        return jax.nn.sigmoid(self.gate_vision_fc2(h))

    def _se_te(self, frames, token, *, deterministic):
        """Gated text/vision fusion + joint transformer
        (reference: models/model_clipspm.py:296-314).

        frames: [N, T, D]; token: [N, 1, D] -> (frames', token') same shapes.
        """
        gate_t = self._gate_text(token)
        gate_v = self._gate_vision(frames)
        fused = token * gate_t * self.spm["alpha"] + frames * gate_v
        x = jnp.concatenate([token, fused], axis=1)
        x = self.context2(x, x, x, deterministic=deterministic)
        return x[:, 1:, :], x[:, :1, :]

    def _motion_feats(self, feats):
        """Forward/backward temporal-conv motion diffs, time-mean pooled
        (reference: models/model_clipspm.py:169-191). feats: [N, T, D] -> [N, D].
        """
        conv = self.motion_conv2(self.motion_conv1(feats))
        fwd = conv[:, 1:, :] - feats[:, :-1, :]
        bwd = conv[:, :-1, :] - feats[:, 1:, :]
        motion = 0.5 * (fwd + bwd)
        return motion.mean(axis=1)

    def _mo(self, su, qu, *, deterministic):
        """HSMR motion-consistency distance (reference:
        models/model_clipspm.py:193-206)."""
        su_mo = self._motion_feats(su)
        qu_mo = self._motion_feats(qu)
        qu_m, qu_tok = self._se_te(qu, qu_mo[:, None, :],
                                   deterministic=deterministic)
        su_m, su_tok = self._se_te(su, su_mo[:, None, :],
                                   deterministic=deterministic)
        new_sm = self._motion_feats(su_m)
        new_qm = self._motion_feats(qu_m)
        return _dis(new_qm, qu_tok[:, 0, :]) + _dis(new_sm, su_tok[:, 0, :])

    def _otam(self, support, query):
        return otam_distance(support.astype(jnp.float32),
                             query.astype(jnp.float32),
                             lbda=0.5, bidirectional=not self.single_direct,
                             backend=self.otam_backend)

    def _sem(self, su, qu, su_l, context_support, target_context_support, *,
             deterministic):
        """SPM semantic prototype modulation (reference:
        models/model_clipspm.py:208-240)."""
        # episode-level text token: mean over all support+target text feats
        token = jnp.concatenate([target_context_support, context_support],
                                axis=0).mean(axis=0, keepdims=True)  # [1,1,D]
        scale_su = su.mean(axis=(1, 2), keepdims=True)   # [S,1,1]
        scale_qu = qu.mean(axis=(1, 2), keepdims=True)   # [Q,1,1]
        support_token = self.token_tr(token * scale_su,
                                      deterministic=deterministic)
        target_token = self.token_tr(token * scale_qu,
                                     deterministic=deterministic)

        qu_real, tok_q_real = self._se_te(qu, target_context_support,
                                          deterministic=deterministic)
        su_fake, tok_s_fake = self._se_te(su, support_token,
                                          deterministic=deterministic)
        qu_fake, tok_q_fake = self._se_te(qu, target_token,
                                          deterministic=deterministic)
        su_real, tok_s_real = self._se_te(su, context_support,
                                          deterministic=deterministic)

        su_pro = class_prototypes(su_real, su_l, self.way)
        return (su_real, qu_fake, su_pro, su_fake, qu_real, support_token,
                target_token, tok_q_real, tok_q_fake, tok_s_real, tok_s_fake)

    def _cpt_sem(self, su, qu, su_l, context_support, target_context_support,
                 *, deterministic):
        """(reference: models/model_clipspm.py:242-273)"""
        (su_real, qu_fake, su_pro, su_fake, qu_real, su_token, qu_token,
         tok_q_real, tok_q_fake, tok_s_real, tok_s_fake) = self._sem(
            su, qu, su_l, context_support, target_context_support,
            deterministic=deterministic)

        if self.use_consist_text:
            # restores the commented-out weighted combinations
            # (reference: models/model_clipspm.py:262,267)
            token_dis = _dis(target_context_support, qu_token)
            token_dis_1 = _dis(context_support, su_token)
            token_dis_2 = _dis(tok_q_real, tok_q_fake)
            token_dis_3 = _dis(tok_s_real, tok_s_fake)
            text_distance = ((token_dis + token_dis_2) * self.spm["text_dis"]
                             + (token_dis_1 + token_dis_3)
                             * (0.5 - self.spm["text_dis"]))
            c1 = _dis(jnp.concatenate([tok_q_real, qu_real], axis=1),
                      jnp.concatenate([tok_q_fake, qu_fake], axis=1))
            c2 = _dis(jnp.concatenate([tok_s_real, su_real], axis=1),
                      jnp.concatenate([tok_s_fake, su_fake], axis=1))
            consist_distance = (c1 * self.spm["consist_1"]
                                + c2 * (1 - self.spm["consist_1"]))
        else:
            # shipped behavior: both terms are literal zero
            # (reference: models/model_clipspm.py:258-259)
            text_distance = jnp.asarray(0.0, jnp.float32)
            consist_distance = jnp.asarray(0.0, jnp.float32)

        class_dists = self._otam(su_pro, qu_fake)
        return (su_real, qu_fake, tok_s_real, tok_q_fake, class_dists,
                consist_distance, text_distance)

    def _task_m(self, su, qu, su_l, *, deterministic):
        """PADM task-level prototype/anchor modulation (reference:
        models/model_clipspm.py:275-294)."""
        way = self.way
        suu = group_by_class(su, su_l, way, self.shot)      # [way, shot, T, D]
        qu_rep = jnp.broadcast_to(qu[None], (way,) + qu.shape)
        token_s = jnp.concatenate([suu, qu_rep], axis=1).mean(axis=1)  # [way,T,D]
        token_q = token_s.mean(axis=0, keepdims=True)                  # [1,T,D]

        su_t = jnp.concatenate([token_s, su], axis=0).transpose(1, 0, 2)
        qu_t = jnp.concatenate([token_q, qu], axis=0).transpose(1, 0, 2)
        _su = self.context1(su_t, su_t, su_t,
                            deterministic=deterministic).transpose(1, 0, 2)
        _qu = self.context1(qu_t, qu_t, qu_t,
                            deterministic=deterministic).transpose(1, 0, 2)
        return _su[way:], _qu[1:], _su[:way], _qu[:1]

    # -- forward -------------------------------------------------------------

    def __call__(self, support_features: jnp.ndarray,
                 target_features: jnp.ndarray,
                 support_labels: jnp.ndarray,
                 context_support: jnp.ndarray,
                 target_context_support: jnp.ndarray,
                 *, train: bool = False) -> Dict[str, jnp.ndarray]:
        """(reference: models/model_clipspm.py:111-144)

        Args:
            support_features: ``[S, T, D]`` backbone frame features.
            target_features: ``[Q, T, D]``.
            support_labels: ``[S]`` relative labels.
            context_support: ``[S, 1, D]`` text features of support classes.
            target_context_support: ``[Q, 1, D]`` text features of query
                classes (train-time signal; only reaches aux distances).
        Returns:
            dict(logits=[1, Q, way], dists=scalar aux distance).
        """
        det = not train
        su = support_features.astype(self.dtype)
        qu = target_features.astype(self.dtype)
        cs = context_support.astype(self.dtype)
        tcs = target_context_support.astype(self.dtype)

        mo_dist = self._mo(su, qu, deterministic=det)

        (su2, qu2, su_t2, qu_t2, class_dists, consist_d, text_d) = \
            self._cpt_sem(su, qu, support_labels, cs, tcs, deterministic=det)
        dists = consist_d + text_d + self.mo_alpha1 * mo_dist

        su3, qu3, su_t3, qu_t3 = self._task_m(su2, qu2, support_labels,
                                              deterministic=det)

        su_pro = class_prototypes(su3, support_labels, self.way)
        task_dist = self._otam(su_pro, qu3) + self._otam(su_t3, qu_t3)

        logits = -(0.5 * class_dists + task_dist)
        return {"logits": logits[None], "dists": dists}
