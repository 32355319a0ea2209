"""Isolate the cached-eval head-stage slowdown (round 5).

Observed: the CLI 10k head sweep (40 x 250-episode dispatches over a
[1300,8,512] table) ran at 1225 eps/s in one run and 15-96 eps/s in
others, while the SAME program's table-encode stage was healthy — and
bench's in-process head stage measured 1367 eps/s minutes later. This
script reproduces the head stage in a fresh process in two arms:

  (default)       random table, head dispatches only
  --after-encode  build the table through the REAL encode path first
                  (decode-shaped uint8 batches staged through
                  device_put_chunked), then the head dispatches

Per-batch wall is printed for the first 5 and every 10th dispatch, so a
uniform-slow vs first-slow vs drifting pattern is visible.

VERDICT (measured 2026-08-19): both arms run the head at >250k eps/s
enqueue+drain in a fresh process — the slow CLI head sweeps (15-96
eps/s) were runs that straddled a TUNNEL OUTAGE WINDOW (each was
immediately followed by the next client's backend init hanging and
subprocess probes reporting the tunnel down for minutes). No framework
defect; bench.py bounds the sub-run so an outage cannot starve the main
stages' retry budget, and carries the round's previous successful
measurement, labeled, next to the failure.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from clipspm_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--after-encode", action="store_true")
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--eval-batch", type=int, default=250)
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from clipspm_tpu.data.transforms import episode_device_transform
    from clipspm_tpu.models.backbones.clip import CLIP_ARCHS
    from clipspm_tpu.models.fsar import CLIPSPMModel
    from clipspm_tpu.train.losses import loss_and_acc
    from clipspm_tpu.utils.config import ConfigNode, SPM_DEFAULT_PARAMS

    way, shot, T, D = 5, 5, 8, 512
    V, E = 1300, args.eval_batch
    arch = dataclasses.replace(CLIP_ARCHS["ViT-B/16"], fast_softmax=True,
                               bf16_norms=True)
    model = CLIPSPMModel(arch=arch, way=way, shot=shot,
                         spm=SPM_DEFAULT_PARAMS["hmdb"], dtype=jnp.bfloat16,
                         encode_chunk=30, train_encode_chunk=40)
    S, Q = way * shot, way * 1
    text = jax.random.normal(jax.random.PRNGKey(1), (16, D), jnp.bfloat16)
    dummy = (jnp.zeros((S, T, 224, 224, 3), jnp.bfloat16),
             jnp.zeros((Q, T, 224, 224, 3), jnp.bfloat16),
             jnp.arange(S, dtype=jnp.int32) % way,
             jnp.zeros((S,), jnp.int32), jnp.zeros((Q,), jnp.int32),
             text, text)
    t0 = time.perf_counter()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *dummy)
    params = variables["params"]
    print(f"init {time.perf_counter() - t0:.1f}s", flush=True)

    if args.after_encode:
        from clipspm_tpu.train.learner import device_put_chunked

        def encode_clips(p, clips_u8):
            x = episode_device_transform(clips_u8, jax.random.PRNGKey(0),
                                         train=False, img_size=224,
                                         resize_to=224, flip=False,
                                         normalize=False)
            return model.apply({"params": p}, x, train=False,
                               method="encode")

        enc = jax.jit(encode_clips)
        B = 60
        rows = []
        t0 = time.perf_counter()
        rng = np.random.default_rng(0)
        for i in range(0, V, B):
            clips = device_put_chunked(
                rng.integers(0, 255, (B, T, 224, 224, 3), dtype=np.uint8))
            rows.append(enc(params, clips))
        table = jnp.concatenate(rows, axis=0)[:V]
        table.block_until_ready()
        print(f"encode {time.perf_counter() - t0:.1f}s "
              f"({V * T / (time.perf_counter() - t0):.0f} fps)", flush=True)
    else:
        table = jax.random.normal(jax.random.PRNGKey(2), (V, T, D),
                                  jnp.bfloat16)
        table.block_until_ready()

    cfg = ConfigNode({"MODEL": {"NAME": "clipspm"},
                      "TRAIN": {"WAY": way, "SHOT": shot}})

    def head_batch(p, tb, su, qu, sl, rs, rt, tl, ttr, tte, rng_):
        def one(a):
            si, qi, sl_, rs_, rt_, tl_ = a
            s = jnp.take(tb, si, axis=0)
            q = jnp.take(tb, qi, axis=0)
            out = model.apply({"params": p}, s, q, sl_, rs_, rt_, ttr, tte,
                              train=False, method="match_features",
                              rngs={"dropout": rng_})
            return loss_and_acc("clipspm", out, tl_, rs_, rt_, 1,
                                cfg=cfg, train=False)
        return jax.lax.map(one, (su, qu, sl, rs, rt, tl))

    hb = jax.jit(head_batch)
    rng = np.random.default_rng(1)

    def batch():
        return (rng.integers(0, V, (E, S)).astype(np.int32),
                rng.integers(0, V, (E, Q)).astype(np.int32),
                np.tile(np.arange(way, dtype=np.int32).repeat(shot),
                        (E, 1)),
                rng.integers(0, 64, (E, S)).astype(np.int32),
                rng.integers(0, 64, (E, Q)).astype(np.int32),
                np.tile(np.arange(way, dtype=np.int32), (E, 1))[:, :Q],
                )

    k = jax.random.PRNGKey(3)
    t0 = time.perf_counter()
    m = hb(params, table, *batch(), text, text, k)
    jax.block_until_ready(m)
    print(f"head compile+1st {time.perf_counter() - t0:.1f}s", flush=True)

    outs = []
    t_all = time.perf_counter()
    for i in range(args.batches):
        t0 = time.perf_counter()
        m = hb(params, table, *batch(), text, text, k)
        dt_dispatch = time.perf_counter() - t0
        outs.append((m, dt_dispatch))
        if i < 5 or i % 10 == 0:
            print(f"  dispatch[{i}] enqueue {dt_dispatch * 1e3:.0f}ms",
                  flush=True)
    for i, (m, _) in enumerate(outs):
        t0 = time.perf_counter()
        jax.block_until_ready(m)
        if i < 5 or i % 10 == 0:
            print(f"  drain[{i}] {(time.perf_counter() - t0) * 1e3:.0f}ms",
                  flush=True)
    wall = time.perf_counter() - t_all
    print(f"head {args.batches}x{E}: {wall:.1f}s "
          f"({args.batches * E / wall:.0f} eps/s)", flush=True)


if __name__ == "__main__":
    main()
