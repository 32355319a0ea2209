"""Eval-time unique-video feature cache (train/feature_cache.py).

1. encode + match_features composes to the same outputs as ``__call__``
   for every cache-capable model (the factoring is behavior-preserving);
2. the cached evaluator reproduces ``Learner.evaluate`` metrics on the
   identical seeded episode stream over an on-disk dataset;
3. unsupported heads / modes are rejected loudly.

The reference has no equivalent: its test loop re-encodes every video of
every episode (reference: run/main_run.py:256-293).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipspm_tpu.models.backbones.clip import CLIP_ARCHS

from test_heads import episode_inputs, make_model, S, T

PIL = pytest.importorskip("PIL.Image")


# -- 1. composition parity ----------------------------------------------------

# CLIP family: [V,T,D] frame-feature tables; resnet family: otam [V,T,hw,D]
# spatial tokens, trx/strm [V,T,D], ta2n [V,T,h,w,D] post-TTM maps
CACHE_MODELS = ["clipspm", "clipfsar", "sten", "cpm2c",
                "otam", "trx", "strm", "ta2n"]


@pytest.mark.parametrize("name", CACHE_MODELS)
def test_encode_match_composes_to_call(name):
    model, dim = make_model(name)
    inputs = episode_inputs(dim)
    (sup_img, tgt_img, sup_l, real_s, real_t, text_tr, text_te) = inputs
    variables = model.init(jax.random.PRNGKey(0), *inputs)

    assert model.apply(variables, method="feature_cacheable")

    ref = model.apply(variables, *inputs, train=False, mutable=False)
    su = model.apply(variables, sup_img, train=False, method="encode")
    qu = model.apply(variables, tgt_img, train=False, method="encode")
    # table rows are per-video: leading dims [N, T, ...] regardless of the
    # head's feature rank (frame vectors / spatial tokens / spatial maps)
    assert su.shape[:2] == (S, T)
    got = model.apply(variables, su, qu, sup_l, real_s, real_t,
                      text_tr, text_te, train=False,
                      method="match_features")
    for key in ref:
        np.testing.assert_allclose(np.asarray(ref[key], np.float32),
                                   np.asarray(got[key], np.float32),
                                   rtol=1e-5, atol=1e-5, err_msg=key)


@pytest.mark.parametrize("name", ["molo", "soap"])
def test_pixel_space_heads_not_cacheable(name):
    model, _ = make_model(name)
    from clipspm_tpu.train.feature_cache import _model_feature_cacheable

    assert not _model_feature_cacheable(model)


def test_cpm2c_visual_prompts_not_cacheable():
    from clipspm_tpu.models.heads.cpm2c import CPM2CModel
    from clipspm_tpu.utils.config import SPM_DEFAULT_PARAMS

    params = dict(SPM_DEFAULT_PARAMS["hmdb"])
    params.setdefault("prompt_patch", 8)
    params.setdefault("hid_dim", 8)
    params.setdefault("support_prompt_ratio", 0.1)
    params.setdefault("target_prompt_ratio", 0.1)
    m = CPM2CModel(arch=CLIP_ARCHS["test-tiny"], way=2, shot=2,
                   params=params, use_visual_prompts=True)
    assert not m.feature_cacheable()


# -- 2. cached evaluator == Learner.evaluate on the same stream ---------------

WAY, SHOT, QUERIES, SEQ_LEN, IMG = 2, 2, 1, 3, 28


@pytest.fixture(scope="module")
def disk_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("fcds")
    data = root / "frames"
    splits = root / "splits"
    splits.mkdir()
    rng = np.random.default_rng(3)
    lines = []
    for cls in ["a", "b", "c"]:
        for v in range(4):
            vid = f"v{v}"
            d = data / "test" / cls / vid
            d.mkdir(parents=True)
            for fidx in range(5 + v):   # variable lengths
                arr = rng.integers(0, 255, size=(32, 32, 3)).astype(np.uint8)
                PIL.fromarray(arr).save(str(d / f"{fidx:05d}.jpg"))
            lines.append(f"{cls}/{vid}")
    (splits / "testlist03.txt").write_text("\n".join(lines) + "\n")
    return str(splits), str(data)


def _build_learner(test_source, name="clipspm"):
    from clipspm_tpu.train.learner import Learner, TransformSpec
    from clipspm_tpu.utils.config import ConfigNode, SPM_DEFAULT_PARAMS

    cfg = ConfigNode({
        "MODEL": {"NAME": name, "BACKBONE": "test-tiny", "SEED": 0},
        "TRAIN": {"WAY": WAY, "SHOT": SHOT, "QUERY_PER_CLASS": QUERIES,
                  "TASKS_PER_BATCH": 2},
        "TEST": {"QUERY_PER_CLASS": QUERIES, "TEST_EPISODES": 6},
        "DATA": {"DATASET": "generic", "IMG_SIZE": IMG,
                 "SEQ_LEN": SEQ_LEN, "NUM_WORKERS": 2},
        "SOLVER": {"LR": 1e-3, "LR_SCH": 10 ** 6, "OPTIM_METHOD": "adam",
                   "WEIGHT_DECAY": 1e-4, "MOMENTUM": 0.9},
        "USE_AMP": False,
        "params": SPM_DEFAULT_PARAMS["hmdb"],
    })
    if name == "clipspm":
        from clipspm_tpu.models.fsar import CLIPSPMModel

        arch = CLIP_ARCHS["test-tiny"]
        model = CLIPSPMModel(arch=arch, way=WAY, shot=SHOT,
                             spm=dict(cfg.params))
        D = arch.embed_dim
    elif name == "otam":
        from clipspm_tpu.models.heads.otam import OTAMModel

        model = OTAMModel(way=WAY, shot=SHOT, arch="resnet18",
                          backbone_width=8)
        D = 64
    else:
        raise ValueError(name)
    S_, Q_ = WAY * SHOT, WAY * QUERIES
    dummy = (
        jnp.zeros((S_, SEQ_LEN, IMG, IMG, 3), jnp.float32),
        jnp.zeros((Q_, SEQ_LEN, IMG, IMG, 3), jnp.float32),
        jnp.zeros((S_,), jnp.int32),
        jnp.zeros((S_,), jnp.int32),
        jnp.zeros((Q_,), jnp.int32),
        jnp.zeros((3, D), jnp.float32),
        jnp.zeros((3, D), jnp.float32),
    )
    variables = model.init(jax.random.PRNGKey(0), *dummy)
    text = jax.random.normal(jax.random.PRNGKey(1), (3, D))
    spec = TransformSpec(img_size=IMG, resize_to=32, flip=True)
    return Learner(cfg, model, variables, test_source=test_source,
                   text_train=text, text_test=text, transform=spec)


def _catalog_sampler(disk_dataset, seed=1):
    from clipspm_tpu.data.sampler import EpisodeSampler
    from clipspm_tpu.data.splits import load_split

    splits, data = disk_dataset
    catalog = load_split(splits, data, "test", "generic", seq_len=SEQ_LEN)
    sampler = EpisodeSampler(catalog, way=WAY, shot=SHOT, queries=QUERIES,
                             seq_len=SEQ_LEN, train=False, seed=seed)
    return catalog, sampler


@pytest.mark.parametrize("name", ["clipspm", "otam"])
def test_cached_eval_matches_uncached(disk_dataset, name):
    """clipspm: [V,T,D] frame-feature table; otam: [V,T,hw,D] spatial-token
    table — the evaluator must be generic over the encode output rank."""
    from clipspm_tpu.data.pipeline import EpisodeLoader
    from clipspm_tpu.train.feature_cache import FeatureCachedEvaluator

    n_eps = 6

    catalog, sampler = _catalog_sampler(disk_dataset)
    loader = EpisodeLoader(sampler, num_workers=2, prefetch=2,
                           use_native=False)
    learner = _build_learner(loader, name)
    try:
        ref = learner.evaluate(n_eps, batch_size=2)
    finally:
        loader.close()

    # fresh sampler, same seed -> identical episode stream
    catalog2, sampler2 = _catalog_sampler(disk_dataset)
    ev = FeatureCachedEvaluator(learner, catalog2, sampler2,
                                encode_videos_per_step=5, eval_batch=4,
                                log_fn=lambda *_: None)
    try:
        got = ev.evaluate(n_eps)
    finally:
        ev.close()

    assert got["unique_videos"] <= len(catalog2.records)
    np.testing.assert_allclose(got["accuracy"], ref["accuracy"], atol=1e-3)
    np.testing.assert_allclose(got["loss"], ref["loss"], atol=1e-4)


def test_cached_eval_matches_under_dp_mesh(disk_dataset):
    """Mesh-aware cached eval: under a dp=4 mesh (table-encode batch and
    head episode axis sharded over dp, table replicated) the metrics must
    equal the unmeshed cached run on the identical stream — sharding is a
    layout change, not a semantic one."""
    import jax as _jax

    from clipspm_tpu.parallel import make_mesh
    from clipspm_tpu.train.feature_cache import FeatureCachedEvaluator

    n_eps = 8

    catalog, sampler = _catalog_sampler(disk_dataset)
    learner = _build_learner(None)
    ev = FeatureCachedEvaluator(learner, catalog, sampler,
                                encode_videos_per_step=4, eval_batch=4,
                                log_fn=lambda *_: None)
    try:
        ref = ev.evaluate(n_eps)
    finally:
        ev.close()

    mesh = make_mesh(n_dp=4, n_tp=1,
                     devices=_jax.devices("cpu")[:4])
    catalog2, sampler2 = _catalog_sampler(disk_dataset)
    learner2 = _build_learner(None)
    ev_dp = FeatureCachedEvaluator(learner2, catalog2, sampler2,
                                   encode_videos_per_step=4, eval_batch=4,
                                   mesh=mesh, log_fn=lambda *_: None)
    assert ev_dp.dp == 4
    try:
        got = ev_dp.evaluate(n_eps)
    finally:
        ev_dp.close()
    np.testing.assert_allclose(got["accuracy"], ref["accuracy"], atol=1e-3)
    np.testing.assert_allclose(got["loss"], ref["loss"], atol=1e-4)


def test_cached_evaluator_inherits_learner_mesh(disk_dataset):
    """The CLI constructs the evaluator without a mesh argument — it must
    pick up the learner's config-driven mesh (and round its batch sizes up
    to dp multiples)."""
    import jax as _jax

    from clipspm_tpu.parallel import make_mesh
    from clipspm_tpu.train.feature_cache import FeatureCachedEvaluator

    catalog, sampler = _catalog_sampler(disk_dataset)
    learner = _build_learner(None)
    learner.mesh = make_mesh(n_dp=2, n_tp=1,
                             devices=_jax.devices("cpu")[:2])
    ev = FeatureCachedEvaluator(learner, catalog, sampler,
                                encode_videos_per_step=5, eval_batch=3,
                                log_fn=lambda *_: None)
    try:
        assert ev.dp == 2
        assert ev.encode_videos_per_step == 6   # 5 rounded up to dp multiple
        assert ev.eval_batch == 4
        got = ev.evaluate(4)
    finally:
        ev.close()
    assert np.isfinite(got["loss"])


def test_run_val_fn_overrides_validation():
    """Learner.run(val_fn=...) must route mid-train validations through the
    hook (the CLI passes the feature-cached evaluator here) and use its
    accuracy for best-checkpoint selection."""
    from test_pipelined_loop import _make

    from clipspm_tpu.train.learner import Learner

    cfg, model, variables, src, test_src, text, tf = _make()
    calls, saved = [], []

    def val_fn(n):
        calls.append(n)
        return {"accuracy": 77.0, "confidence": 1.0, "loss": 0.5}

    lr = Learner(cfg, model, variables, train_source=src,
                 test_source=test_src, text_train=text, text_test=text,
                 transform=tf, log_fn=lambda *_: None)
    out = lr.run(train_episodes=8, val_freq=4, test_episodes=3,
                 print_freq=4,
                 checkpoint_fn=lambda ep, acc: saved.append((ep, acc)),
                 val_fn=val_fn)
    assert calls == [3]          # one val at episode 4 (tpb=2, total=8)
    assert out["best_accuracy"] == 77.0
    assert saved and saved[0][1] == 77.0


def test_run_with_cached_validator(disk_dataset):
    """End-to-end: train with FeatureCachedEvaluator.evaluate as val_fn —
    the table is rebuilt at the current params each val and the run's
    best accuracy comes from the cached path."""
    from clipspm_tpu.data import SyntheticEpisodeSource
    from clipspm_tpu.train.feature_cache import FeatureCachedEvaluator

    learner = _build_learner(None)
    learner.train_source = SyntheticEpisodeSource(
        way=WAY, shot=SHOT, queries=QUERIES, seq_len=SEQ_LEN,
        img_size=32, num_classes=4, seed=9)
    catalog, sampler = _catalog_sampler(disk_dataset)
    logs = []
    ev = FeatureCachedEvaluator(learner, catalog, sampler,
                                encode_videos_per_step=5, eval_batch=4,
                                log_fn=logs.append)
    try:
        out = learner.run(train_episodes=4, val_freq=2, test_episodes=4,
                          print_freq=4, val_fn=ev.evaluate)
    finally:
        ev.close()
    assert out["best_accuracy"] > 0.0
    assert any("feature-cached eval" in str(l) for l in logs)


def test_cached_eval_guards(disk_dataset):
    from clipspm_tpu.train.feature_cache import FeatureCachedEvaluator

    catalog, sampler = _catalog_sampler(disk_dataset)
    learner = _build_learner(None)

    sampler.train = True
    with pytest.raises(ValueError, match="eval-only"):
        FeatureCachedEvaluator(learner, catalog, sampler)
    sampler.train = False

    sampler.seq_len = 1
    with pytest.raises(ValueError, match="SEQ_LEN"):
        FeatureCachedEvaluator(learner, catalog, sampler)
