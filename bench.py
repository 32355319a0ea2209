"""Benchmark: episodes/sec/chip on the flagship eval path.

Measures the BASELINE.json north-star metric — 5-way 5-shot 8-frame episodic
inference (device transform + CLIP backbone + CLIP-SPM head + logits) on one
chip, bf16, randomly initialised weights, synthetic episodes (pre-staged on
device so the number isolates the compute path).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline``: the reference publishes no throughput numbers (BASELINE.md)
and its CLIP heads cannot run in this environment (hard ``.cuda()`` calls +
checkpoint download at init; reference: models/model_clipspm.py:19,26). The
baseline is therefore this repo's first recorded measurement
(bench_baseline.json, written on first run) so later rounds report progress
against round 1.

Flags: ``--quick`` (fewer iters); env ``BENCH_TRAIN=1`` adds a train-step
throughput measurement (off by default: the backward compile takes minutes
through the remote AOT compiler on cold caches).
"""

import json
import os
import sys
import time

import numpy as np


def _sync(x):
    # block_until_ready is a no-op on tunneled remote platforms; fetching a
    # scalar is a true sync
    return float(x.sum())


def _bench_train(jax, jnp, model, variables, episodes, n_staged, text, img,
                 Q, key, n_iters):
    from clipspm_tpu.data.transforms import episode_device_transform
    from clipspm_tpu.train.losses import loss_and_acc

    @jax.jit
    def train_grad(variables, sup_u8, tgt_u8, sup_labels, real_sup, real_tgt,
                   key):
        def loss_fn(params):
            sup = episode_device_transform(sup_u8, key, train=True,
                                           img_size=img, resize_to=256,
                                           dtype=jnp.bfloat16)
            tgt = episode_device_transform(tgt_u8, key, train=True,
                                           img_size=img, resize_to=256,
                                           dtype=jnp.bfloat16)
            out = model.apply({"params": params}, sup, tgt, sup_labels,
                              real_sup, real_tgt, text, text, train=True,
                              rngs={"dropout": key})
            loss, _ = loss_and_acc("clipspm", out, sup_labels[:Q] * 0,
                                   real_sup, real_tgt, 16, train=True)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        return loss + sum(jnp.sum(g) * 0 for g in jax.tree.leaves(grads))

    _sync(train_grad(variables, *episodes[0], key))
    n_t = max(3, n_iters // 3)
    t0 = time.perf_counter()
    for i in range(n_t):
        _sync(train_grad(variables, *episodes[i % n_staged], key))
    return n_t / (time.perf_counter() - t0)


def main():
    quick = "--quick" in sys.argv
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    import jax
    import jax.numpy as jnp
    from clipspm_tpu.data import SyntheticEpisodeSource
    from clipspm_tpu.data.transforms import episode_device_transform
    from clipspm_tpu.models.backbones.clip import CLIP_ARCHS
    from clipspm_tpu.models.fsar import CLIPSPMModel
    from clipspm_tpu.utils.config import SPM_DEFAULT_PARAMS

    import dataclasses

    way, shot, queries, T, img = 5, 5, 1, 8, 224
    # fast_softmax: bf16 attention softmax (max-shifted), ~10%% faster on v5e
    # bf16_norms: LayerNorms in bf16 (no fp32 round-trip), 1.67x faster ViT
    # encode; embeddings identical to fp32-LN at bf16 resolution
    arch = dataclasses.replace(CLIP_ARCHS["ViT-B/16"], fast_softmax=True,
                               bf16_norms=True)
    model = CLIPSPMModel(arch=arch, way=way, shot=shot,
                         spm=SPM_DEFAULT_PARAMS["hmdb"], dtype=jnp.bfloat16)
    S, Q, D = way * shot, way * queries, arch.embed_dim

    rng = jax.random.PRNGKey(0)
    text = jax.random.normal(jax.random.PRNGKey(1), (16, D), jnp.bfloat16)
    dummy = (
        jnp.zeros((S, T, img, img, 3), jnp.bfloat16),
        jnp.zeros((Q, T, img, img, 3), jnp.bfloat16),
        jnp.arange(S, dtype=jnp.int32) % way,
        jnp.zeros((S,), jnp.int32),
        jnp.zeros((Q,), jnp.int32),
        text, text,
    )
    variables = model.init(rng, *dummy)

    @jax.jit
    def eval_episode(variables, sup_u8, tgt_u8, sup_labels, real_sup,
                     real_tgt, key):
        sup = episode_device_transform(sup_u8, key, train=False,
                                       img_size=img, resize_to=256,
                                       dtype=jnp.bfloat16)
        tgt = episode_device_transform(tgt_u8, key, train=False,
                                       img_size=img, resize_to=256,
                                       dtype=jnp.bfloat16)
        out = model.apply(variables, sup, tgt, sup_labels, real_sup,
                          real_tgt, text, text, train=False)
        return out["logits"]

    src = SyntheticEpisodeSource(way=way, shot=shot, queries=queries,
                                 seq_len=T, img_size=256, num_classes=16)
    n_staged = 4
    episodes = []
    for _ in range(n_staged):
        ep = src.sample()
        episodes.append(tuple(jax.device_put(x) for x in (
            ep.support_images, ep.target_images, ep.support_labels,
            ep.real_support_labels, ep.real_target_labels)))

    key = jax.random.PRNGKey(2)
    _sync(eval_episode(variables, *episodes[0], key))   # warmup/compile

    n_iters = 10 if quick else 50
    lat = []
    t0 = time.perf_counter()
    for i in range(n_iters):
        t1 = time.perf_counter()
        _sync(eval_episode(variables, *episodes[i % n_staged], key))
        lat.append(time.perf_counter() - t1)
    total = time.perf_counter() - t0
    eps_per_sec = n_iters / total
    p50_ms = float(np.median(lat) * 1e3)
    frames_per_sec = eps_per_sec * (S + Q) * T

    # batched multi-episode eval (BASELINE config #5): E episodes vmapped
    # into one device step — amortizes per-call dispatch latency
    E = 4 if quick else 8
    batched = jax.jit(jax.vmap(eval_episode, in_axes=(None,) + (0,) * 5
                               + (None,)))
    staged = [jax.device_put(jnp.stack([episodes[i % n_staged][j]
                                        for i in range(E)]))
              for j in range(5)]
    _sync(batched(variables, *staged, key))
    n_b = max(2, n_iters // E)
    t0 = time.perf_counter()
    for _ in range(n_b):
        _sync(batched(variables, *staged, key))
    batched_eps_per_sec = n_b * E / (time.perf_counter() - t0)

    extras = {"p50_episode_latency_ms": round(p50_ms, 2),
              "frames_per_sec": round(frames_per_sec, 1),
              "batched_eval_eps_per_sec": round(batched_eps_per_sec, 3),
              "device": str(jax.devices()[0])}
    if os.environ.get("BENCH_TRAIN") == "1":
        extras["train_eps_per_sec"] = round(
            _bench_train(jax, jnp, model, variables, episodes, n_staged,
                         text, img, Q, key, n_iters), 3)

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "bench_baseline.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)["value"]
    else:
        baseline = eps_per_sec
        with open(baseline_path, "w") as f:
            json.dump({"metric": "episodes/sec/chip", "value": eps_per_sec,
                       "recorded": time.strftime("%Y-%m-%d"),
                       "note": "first measured value (round 1); reference "
                               "publishes no throughput numbers"}, f)

    print(json.dumps({
        "metric": "episodes/sec/chip (5w5s 8f ViT-B/16 eval)",
        "value": round(eps_per_sec, 3),
        "unit": "episodes/s",
        "vs_baseline": round(eps_per_sec / baseline, 3),
        "extras": extras,
    }))


if __name__ == "__main__":
    main()
