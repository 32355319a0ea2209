"""TPU smoke: every head compiles and runs at PRODUCTION shape on the chip.

The CPU test suite proves correctness at tiny shapes; this script proves
deployability — each of the ten heads (reference: run/main_run.py:110-137
dispatch) is built via ``build_model`` at its shipped production
configuration (5-way 5-shot, 8 frames, 224^2, real backbone), jitted, and
executed on the real TPU. Per head it reports compile time and steady-state
episode latency. CLIP heads run both the flagship ViT-B/16 and (clipfsar)
the RN50 ModifiedResNet tower so both CLIP towers are exercised at full
size.

Usage: ``timeout 3600 python scripts/tpu_smoke.py [--train] [head ...]``
(default: all ten, eval forward). ``--train`` additionally runs one jitted
gradient step per head (the reference training signal via
``train/losses.py:loss_and_acc`` dispatch) — proving every head's backward
fits and runs at production shape, not just its forward. Results table
recorded in README "Benchmarks".
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from clipspm_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

CLIP_HEADS = {"clipspm", "clipfsar", "cpm2c", "sten"}

# production MODEL keys per head, mirroring the shipped reference configs
# (configs/<head>/hmdb.yaml)
HEAD_MODEL = {
    "clipspm": {"BACKBONE": "ViT-B/16", "FAST_SOFTMAX": True,
                "BF16_NORMS": True},
    "clipfsar": {"BACKBONE": "RN50", "USE_CLASSIFICATION": True,
                 "USE_CLASSIFICATION_VALUE": 1.5},
    "cpm2c": {"BACKBONE": "ViT-B/16", "USE_CLASSIFICATION": True,
              "USE_CLASSIFICATION_VALUE": 1.5,
              "MOTION_COFF": 0.5, "NORMAL_COFF": 0.5},
    "sten": {"BACKBONE": "ViT-B/16"},
    "otam": {"BACKBONE": "resnet50"},
    "trx": {"BACKBONE": "resnet50", "TEMP_SET": [2, 3],
            "TRANS_LINEAR_OUT_DIM": 1152, "TRANS_DROPOUT": 0.1},
    "strm": {"BACKBONE": "resnet50", "TEMP_SET": [2],
             "TRANS_LINEAR_OUT_DIM": 1152, "TRANS_DROPOUT": 0.1},
    "molo": {"BACKBONE": "resnet50", "USE_CLASSIFICATION": True,
             "USE_CLASSIFICATION_VALUE": 0.6, "USE_CONTRASTIVE": True,
             "USE_CONTRASTIVE_COFF": 0.05, "USE_RECONS": True,
             "RECONS_COFF": 0.05},
    "soap": {"BACKBONE": "resnet50", "TEMP_SET": [2],
             "TRANS_LINEAR_OUT_DIM": 1152, "TRANS_DROPOUT": 0.1,
             "O": [2, 3], "cr": 16},
    "ta2n": {"BACKBONE": "resnet50", "METRIC": "cos", "DROPOUT": 0.1},
}


def smoke_one(name: str, way=5, shot=5, queries=1, T=8, img=224,
              train=False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from clipspm_tpu.models.fsar import build_model
    from clipspm_tpu.train.losses import loss_and_acc
    from clipspm_tpu.utils.config import ConfigNode, SPM_DEFAULT_PARAMS

    cfg = ConfigNode({
        "MODEL": dict({"NAME": name, "SEED": 0}, **HEAD_MODEL[name]),
        "TRAIN": {"WAY": way, "SHOT": shot, "QUERY_PER_CLASS": queries},
        "DATA": {"SEQ_LEN": T, "IMG_SIZE": img, "DATASET": "hmdb",
                 "NUM_CLASS": 64},
        "USE_AMP": True,
    })
    cfg.params = dict(SPM_DEFAULT_PARAMS["hmdb"])
    model = build_model(cfg)
    S, Q = way * shot, way * queries
    D = model.arch.embed_dim if name in CLIP_HEADS else 2048

    rng = np.random.default_rng(0)
    args = (
        jnp.asarray(rng.uniform(size=(S, T, img, img, 3)), jnp.bfloat16),
        jnp.asarray(rng.uniform(size=(Q, T, img, img, 3)), jnp.bfloat16),
        jnp.arange(S, dtype=jnp.int32) % way,
        jnp.zeros((S,), jnp.int32),
        jnp.zeros((Q,), jnp.int32),
        jnp.asarray(rng.normal(size=(16, D)), jnp.bfloat16),
        jnp.asarray(rng.normal(size=(16, D)), jnp.bfloat16),
    )
    t0 = time.perf_counter()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), *args)
    init_s = time.perf_counter() - t0

    fwd = jax.jit(lambda v, *a: model.apply(v, *a, train=False)["logits"])
    t0 = time.perf_counter()
    logits = fwd(variables, *args)
    ok = bool(np.isfinite(np.asarray(logits, np.float32)).all())
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(4):
        t0 = time.perf_counter()
        float(fwd(variables, *args).astype(jnp.float32).sum())
        ts.append(time.perf_counter() - t0)
    lat = float(np.median(ts[1:]))
    out = {"head": name, "backbone": HEAD_MODEL[name]["BACKBONE"],
           "finite": ok, "init_s": round(init_s, 1),
           "compile_s": round(compile_s, 1),
           "episode_ms": round(lat * 1e3, 1),
           "eps_per_sec": round(1.0 / lat, 2)}
    if not train:
        return out

    tgt_labels = jnp.arange(way * queries, dtype=jnp.int32) % way

    @jax.jit
    def grad_step(variables, *a):
        def loss_fn(params):
            v = dict(variables, params=params)
            kw = dict(train=True, rngs={"dropout": jax.random.PRNGKey(0)})
            if "batch_stats" in variables:
                o, _ = model.apply(v, *a, mutable=["batch_stats"], **kw)
            else:
                o = model.apply(v, *a, **kw)
            loss, _ = loss_and_acc(name, o, tgt_labels, a[3], a[4], 16,
                                   cfg=cfg, train=True)
            return loss
        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        return loss + sum(jnp.sum(g) * 0 for g in jax.tree.leaves(grads))

    t0 = time.perf_counter()
    l0 = float(grad_step(variables, *args))
    out["train_compile_s"] = round(time.perf_counter() - t0, 1)
    out["train_loss_finite"] = bool(np.isfinite(l0))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(grad_step(variables, *args))
        ts.append(time.perf_counter() - t0)
    out["train_episode_ms"] = round(float(np.median(ts)) * 1e3, 1)
    out["train_eps_per_sec"] = round(1e3 / out["train_episode_ms"], 2)
    out["finite"] = ok and out["train_loss_finite"]
    return out


def main():
    argv = [a for a in sys.argv[1:] if a != "--train"]
    train = "--train" in sys.argv[1:]
    heads = argv or list(HEAD_MODEL)
    results = []
    for name in heads:
        try:
            r = smoke_one(name, train=train)
        except Exception as e:  # noqa: BLE001 - report-and-continue smoke
            r = {"head": name, "error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps(r), flush=True)
        results.append(r)
    bad = [r for r in results if r.get("error") or not r.get("finite", True)]
    print(f"SMOKE {'FAIL' if bad else 'OK'}: "
          f"{len(results) - len(bad)}/{len(results)} heads ran at "
          f"production shape")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
