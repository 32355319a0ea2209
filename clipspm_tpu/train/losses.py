"""Episodic losses and metrics + per-model loss dispatch.

Parity targets:
- ``episodic_ce``: the reference's ``loss`` is a logsumexp over a sample dim
  (always size 1 in practice) followed by a **sum** over queries — not a mean
  (reference: utils/utils.py:174-186).
- ``aggregate_accuracy``: argmax after logsumexp over the sample dim
  (reference: utils/utils.py:259-264).
- ``loss_and_acc``: the per-model branch table the reference keeps in the
  trainer (reference: run/main_run.py:327-403). Heads stay loss-free; the
  dispatch lives here so each head's output dict matches its reference twin.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def _ce_per_query(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """[Q, way] x [Q] -> [Q] cross-entropy (no reduction)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32),
                                axis=-1)[:, 0]


def episodic_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """(reference: utils/utils.py:174-186)

    Args:
        logits: ``[n_samples, Q, way]`` (n_samples is 1 everywhere in the
            reference protocol).
        labels: ``[Q]`` int labels.
    Returns: scalar — sum over queries of the sample-averaged CE.
    """
    n = logits.shape[0]
    log_py = -jax.vmap(_ce_per_query, in_axes=(0, None))(logits, labels)
    score = jax.nn.logsumexp(log_py, axis=0) - jnp.log(float(n))
    return -jnp.sum(score)


def aggregate_accuracy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """(reference: utils/utils.py:259-264)"""
    avg = jax.nn.logsumexp(logits.astype(jnp.float32), axis=0)
    pred = jnp.argmax(avg, axis=-1)
    return jnp.mean((pred == labels.astype(pred.dtype)).astype(jnp.float32))


def task_confusion(logits: jnp.ndarray, batch_class_list: jnp.ndarray
                   ) -> jnp.ndarray:
    """Map episode-relative predictions to dataset-level class ids
    (reference: utils/utils.py:266-269)."""
    preds = jnp.argmax(jax.nn.logsumexp(logits, axis=0), axis=-1)
    return batch_class_list[preds]


def label_smoothing(labels: jnp.ndarray, class_num: int = 100,
                    factor: float = 0.1) -> jnp.ndarray:
    """LSR one-hot smoothing (reference: utils/utils.py:148-158)."""
    one_hot = jax.nn.one_hot(labels, class_num) * (1 - factor)
    return one_hot + factor / class_num


def ff_mi_loss(f1: jnp.ndarray, f2: jnp.ndarray,
               temperature: float = 1.0) -> jnp.ndarray:
    """Feature-feature mutual-information KL (reference: utils/utils.py:189-210).

    f1/f2: [N, M, C, T, H, W] pre/post-alignment feature volumes.
    """
    B = f1.shape[0] * f1.shape[1]
    T = f1.shape[-3]
    a = f1.mean(axis=(-1, -2)).reshape(B, -1, T).transpose(0, 2, 1)
    b = f2.mean(axis=(-1, -2)).reshape(B, -1, T).transpose(0, 2, 1)
    logp = jax.nn.log_softmax(jax.lax.stop_gradient(a) / temperature, axis=-1)
    q = jax.nn.softmax(b / temperature, axis=-1)
    kl = q * (jnp.log(jnp.maximum(q, 1e-12)) - logp)
    return kl.sum(axis=-1).sum(axis=-1).mean()


def fy_mi_loss(logits: jnp.ndarray, labels: jnp.ndarray,
               way: int = 5) -> jnp.ndarray:
    """Logit-label KL (reference: utils/utils.py:213-230)."""
    logp = jax.nn.log_softmax(jax.lax.stop_gradient(logits[0]), axis=-1)
    target = jax.nn.one_hot(labels, way)
    kl = target * (jnp.log(jnp.maximum(target, 1e-12)) - logp)
    return kl.sum(axis=-1).mean()


def yy_mi_loss(sampled_logits: jnp.ndarray,
               dense_logits: jnp.ndarray) -> jnp.ndarray:
    """KL between sampled-frame and dense-frame logits
    (reference: utils/utils.py:232-243)."""
    logp = jax.nn.log_softmax(jax.lax.stop_gradient(sampled_logits[0]),
                              axis=-1)
    q = jax.nn.softmax(dense_logits[0], axis=-1)
    kl = q * (jnp.log(jnp.maximum(q, 1e-12)) - logp)
    return kl.sum(axis=-1).mean()


def loss_and_acc(model_name: str, outputs: Dict[str, jnp.ndarray],
                 target_labels: jnp.ndarray,
                 real_support_labels: jnp.ndarray,
                 real_target_labels: jnp.ndarray,
                 tasks_per_batch: int, cfg=None,
                 train: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-model loss dispatch (reference: run/main_run.py:327-403).

    Returns (loss, accuracy) for one episode. The 1/tasks_per_batch factor is
    part of the loss (the reference accumulates un-normalized gradients over
    tasks_per_batch episodes; reference: run/main_run.py:339,391).
    """
    tpb = float(tasks_per_batch)
    logits = outputs.get("logits")
    lmd = 0.1

    if model_name == "strm":
        post_pat = outputs["logits_post_pat"]
        joint = logits + lmd * post_pat
        loss = (episodic_ce(joint, target_labels) / tpb
                + lmd * episodic_ce(post_pat, target_labels) / tpb)
        acc = aggregate_accuracy(joint, target_labels)
        return loss, acc

    if model_name == "molo":
        loss = episodic_ce(logits, target_labels) / tpb
        acc = aggregate_accuracy(logits, target_labels)
        if train:
            both_real = jnp.concatenate([real_support_labels,
                                         real_target_labels], axis=0)
            # USE_LOCAL emits per-token logits ((S+Q)(T+1) rows); the
            # reference loss crashes on the shape mismatch (defect 14 in
            # COMPONENTS.md) — repair: repeat each video label per token
            n_logits = outputs["class_logits"].shape[1]
            if n_logits != both_real.shape[0]:
                both_real = jnp.repeat(both_real,
                                       n_logits // both_real.shape[0])
            cls_v = float(cfg.MODEL.USE_CLASSIFICATION_VALUE)
            contr = float(cfg.MODEL.USE_CONTRASTIVE_COFF)
            recons = float(cfg.MODEL.RECONS_COFF)
            # (reference: run/main_run.py:355-361 — the outer /tpb applies
            # to CE + classification jointly, so the MAIN CE is divided by
            # tpb TWICE. That is the reference's own behavior — its
            # line-continuation puts the second /tpb on the parenthesized
            # sum — replicated verbatim for gradient parity; see
            # COMPONENTS.md defect 15)
            loss = ((episodic_ce(logits, target_labels) / tpb
                     + cls_v * episodic_ce(outputs["class_logits"], both_real))
                    / tpb
                    + contr * episodic_ce(outputs["logits_s2q"], target_labels) / tpb
                    + contr * episodic_ce(outputs["logits_q2s"], target_labels) / tpb
                    + contr * episodic_ce(outputs["logits_s2q_motion"], target_labels) / tpb
                    + contr * episodic_ce(outputs["logits_q2s_motion"], target_labels) / tpb
                    + recons * outputs["loss_recons"])
        return loss, acc

    if model_name == "clipfsar":
        both_real = jnp.concatenate([real_support_labels,
                                     real_target_labels], axis=0)
        cls_v = float(cfg.MODEL.USE_CLASSIFICATION_VALUE)
        loss = (episodic_ce(logits, target_labels)
                + cls_v * episodic_ce(outputs["class_logits"], both_real)) / tpb
        return loss, aggregate_accuracy(logits, target_labels)

    if model_name == "cpm2c":
        # the reference loss reads NNI-injected cfg.params lambdas
        # (run/main_run.py:372) while the shipped configs carry MODEL.LMD
        # (configs/cpm2c/*.yaml) — honor MODEL.LMD when present
        if cfg is not None and "LMD" in cfg.MODEL:
            lmd_cfg = list(cfg.MODEL.LMD)
            lambdas = (lmd_cfg + [0.0] * 4)[:4]
        else:
            p = cfg.params
            lambdas = [p.get("lambdas0", 1.0), p.get("lambdas1", 1.0),
                       p.get("lambdas2", 0.0), p.get("lambdas3", 0.0)]
        both_real = jnp.concatenate([real_support_labels,
                                     real_target_labels], axis=0)
        total_logits = (lambdas[1] * outputs["logits_local"]
                        + lambdas[2] * outputs["logits_global"])
        loss = (lambdas[0] * episodic_ce(outputs["class_logits"], both_real) / tpb
                + lambdas[1] * episodic_ce(outputs["logits_local"], target_labels) / tpb
                + lambdas[2] * episodic_ce(outputs["logits_global"], target_labels) / tpb)
        if train:
            loss = loss + 0.001 * outputs["target_consist_distance"]
        return loss, aggregate_accuracy(total_logits, target_labels)

    if model_name == "soap":
        loss = episodic_ce(logits, target_labels) / tpb + outputs["t_loss"]
        return loss, aggregate_accuracy(logits, target_labels)

    if model_name == "clipspm":
        loss = (episodic_ce(logits, target_labels) / tpb
                + 0.001 * outputs["dists"])
        return loss, aggregate_accuracy(logits, target_labels)

    # default: otam / trx / sten / ta2n (reference: run/main_run.py:396-401)
    loss = episodic_ce(logits, target_labels) / tpb
    return loss, aggregate_accuracy(logits, target_labels)
