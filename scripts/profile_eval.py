"""Profile the production batched-eval (or train) step: op-family breakdown.

Captures a ``jax.profiler`` trace of ONE warm dispatch on the default
device — the `lax.map` batched eval (E episodes, chunked encode) or, with
``--train``, the single-episode gradient step (remat-chunked encode) —
then parses the trace and aggregates device-op durations by HLO fusion
family. This is the measurement behind the README "Benchmarks" breakdowns
and complements the trainer's own trace hook (``CLIPSPM_PROFILE_DIR``,
utils/metrics.py:profile_trace).

Usage: ``timeout 900 python scripts/profile_eval.py [--train] [E]``
(default E=16 for eval; E is ignored for --train).
"""

import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from clipspm_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def capture(E: int, out_dir: str, train: bool = False) -> float:
    import dataclasses

    import jax
    import jax.numpy as jnp

    from clipspm_tpu.data import SyntheticEpisodeSource
    from clipspm_tpu.data.transforms import episode_device_transform
    from clipspm_tpu.models.backbones.clip import CLIP_ARCHS
    from clipspm_tpu.models.fsar import CLIPSPMModel
    from clipspm_tpu.utils.config import SPM_DEFAULT_PARAMS

    way, shot, queries, T, img = 5, 5, 1, 8, 224
    arch = dataclasses.replace(CLIP_ARCHS["ViT-B/16"], fast_softmax=True,
                               bf16_norms=True)
    model = CLIPSPMModel(arch=arch, way=way, shot=shot,
                         spm=SPM_DEFAULT_PARAMS["hmdb"], dtype=jnp.bfloat16,
                         encode_chunk=30, train_encode_chunk=40)
    S, Q, D = way * shot, way * queries, arch.embed_dim
    text = jax.random.normal(jax.random.PRNGKey(1), (16, D), jnp.bfloat16)
    key = jax.random.PRNGKey(2)
    dummy = (jnp.zeros((S, T, img, img, 3), jnp.bfloat16),
             jnp.zeros((Q, T, img, img, 3), jnp.bfloat16),
             jnp.arange(S, dtype=jnp.int32) % way,
             jnp.zeros((S,), jnp.int32), jnp.zeros((Q,), jnp.int32),
             text, text)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *dummy)

    def eval_episode(v, sup_u8, tgt_u8, sl, rs, rt):
        sup = episode_device_transform(sup_u8, key, train=False,
                                       img_size=img, resize_to=256,
                                       dtype=jnp.bfloat16)
        tgt = episode_device_transform(tgt_u8, key, train=False,
                                       img_size=img, resize_to=256,
                                       dtype=jnp.bfloat16)
        return model.apply(v, sup, tgt, sl, rs, rt, text, text,
                           train=False)["logits"]

    batched = jax.jit(lambda v, b: jax.lax.map(
        lambda ep: eval_episode(v, *ep), b))
    src = SyntheticEpisodeSource(way=way, shot=shot, queries=queries,
                                 seq_len=T, img_size=256, num_classes=16)
    eps = []
    for _ in range(2):
        ep = src.sample()
        eps.append(tuple(jax.device_put(x) for x in (
            ep.support_images, ep.target_images, ep.support_labels,
            ep.real_support_labels, ep.real_target_labels)))
    if train:
        from clipspm_tpu.train.losses import loss_and_acc

        @jax.jit
        def train_grad(v, sup_u8, tgt_u8, sl, rs, rt):
            def loss_fn(params):
                sup = episode_device_transform(sup_u8, key, train=True,
                                               img_size=img, resize_to=256,
                                               dtype=jnp.bfloat16)
                tgt = episode_device_transform(tgt_u8, key, train=True,
                                               img_size=img, resize_to=256,
                                               dtype=jnp.bfloat16)
                out = model.apply({"params": params}, sup, tgt, sl, rs, rt,
                                  text, text, train=True,
                                  rngs={"dropout": key})
                loss, _ = loss_and_acc("clipspm", out, sl[:Q] * 0, rs, rt,
                                       16, train=True)
                return loss
            loss, grads = jax.value_and_grad(loss_fn)(v["params"])
            return loss + sum(jnp.sum(g) * 0 for g in jax.tree.leaves(grads))

        float(train_grad(variables, *eps[0]))        # compile + warm
        with jax.profiler.trace(out_dir):
            float(train_grad(variables, *eps[1]))    # the traced step
        return 1

    staged = [tuple(jax.device_put(jnp.stack(
        [eps[(i + s) % 2][j] for i in range(E)])) for j in range(5))
        for s in range(2)]
    float(batched(variables, staged[0]).sum())       # compile + warm
    with jax.profiler.trace(out_dir):
        float(batched(variables, staged[1]).sum())   # the traced dispatch
    return E


def report(out_dir: str, E: int) -> None:
    traces = sorted(glob.glob(
        os.path.join(out_dir, "plugins/profile/*/*.trace.json.gz")))
    if not traces:
        raise SystemExit(f"no trace written under {out_dir}")
    with gzip.open(traces[-1]) as f:
        data = json.load(f)
    ev = data["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    # containers (jit_*, while bodies) nest the leaf fusions — skip them so
    # durations are not double-counted
    skip = re.compile(r"^(jit_|while|body|condition|region)")
    groups, counts = collections.Counter(), collections.Counter()
    for e in ev:
        if (e.get("ph") == "X" and "dur" in e
                and "TPU" in pids.get(e.get("pid"), "")):
            n = e["name"]
            if skip.match(n):
                continue
            g = re.sub(r"[.\d]+$", "", n)
            if not g:        # numeric-only names are program containers
                continue
            groups[g] += e["dur"]
            counts[g] += 1
    tot = sum(groups.values())
    if not tot:
        raise SystemExit(
            "no TPU device ops in the trace — the program ran on a "
            "non-TPU backend (check jax.devices()); refusing to print a "
            "meaningless 0 ms profile")
    print(f"device leaf-op total: {tot / 1e3:.1f} ms for E={E} "
          f"({tot / 1e3 / E:.2f} ms/episode)")
    for g, d in groups.most_common(12):
        print(f"{d / 1e3:9.2f} ms  {100 * d / tot:5.1f}%  x{counts[g]:<6} {g}")


def main():
    argv = [a for a in sys.argv[1:] if a != "--train"]
    train = "--train" in sys.argv[1:]
    E = int(argv[0]) if argv else 16
    out = os.environ.get("CLIPSPM_PROFILE_DIR",
                         "/tmp/train_profile" if train else "/tmp/eval_profile")
    E = capture(E, out, train=train)
    report(out, E)


if __name__ == "__main__":
    main()
