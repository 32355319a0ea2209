"""TPU smoke: every head compiles and runs at PRODUCTION shape on the chip.

The CPU test suite proves correctness at tiny shapes; this script proves
deployability — each of the ten heads (reference: run/main_run.py:110-137
dispatch) is built via ``build_model`` at its shipped production
configuration (5-way 5-shot, 8 frames, 224^2, real backbone), jitted, and
executed on the real TPU. Per head it reports compile time and steady-state
episode latency. CLIP heads run both the flagship ViT-B/16 and (clipfsar)
the RN50 ModifiedResNet tower so both CLIP towers are exercised at full
size.

Usage: ``timeout 3600 python scripts/tpu_smoke.py [head ...]``
(default: all ten). Results table recorded in README "Benchmarks".
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
             "USE_CONTRASTIVE": True},
    "soap": {"BACKBONE": "resnet50", "TEMP_SET": [2],
             "TRANS_LINEAR_OUT_DIM": 1152, "TRANS_DROPOUT": 0.1,
             "O": [2, 3], "cr": 16},
    "ta2n": {"BACKBONE": "resnet50", "METRIC": "cos", "DROPOUT": 0.1},
}


def smoke_one(name: str, way=5, shot=5, queries=1, T=8, img=224):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from clipspm_tpu.models.fsar import build_model
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
    variables = model.init(jax.random.PRNGKey(0), *args)
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
    return {"head": name, "backbone": HEAD_MODEL[name]["BACKBONE"],
            "finite": ok, "init_s": round(init_s, 1),
            "compile_s": round(compile_s, 1),
            "episode_ms": round(lat * 1e3, 1),
            "eps_per_sec": round(1.0 / lat, 2)}


def main():
    heads = sys.argv[1:] or list(HEAD_MODEL)
    results = []
    for name in heads:
        try:
            r = smoke_one(name)
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
