"""Mesh data-parallel training (virtual devices) and checkpoint round-trip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipspm_tpu.data import SyntheticEpisodeSource
from clipspm_tpu.models.backbones.clip import CLIP_ARCHS
from clipspm_tpu.models.fsar import CLIPSPMModel
from clipspm_tpu.parallel import make_mesh
from clipspm_tpu.train.learner import Learner, TransformSpec
from clipspm_tpu.utils.config import ConfigNode, SPM_DEFAULT_PARAMS

WAY, SHOT, QUERIES, T, IMG = 2, 1, 1, 2, 32


def _cfg(tpb):
    return ConfigNode({
        "MODEL": {"NAME": "clipspm", "BACKBONE": "test-tiny", "SEED": 0},
        "TRAIN": {"WAY": WAY, "SHOT": SHOT, "QUERY_PER_CLASS": QUERIES,
                  "TASKS_PER_BATCH": tpb, "TRAIN_EPISODES": tpb,
                  "VAL_FREQ": 10 ** 6, "PRINT_FREQ": 10 ** 6},
        "TEST": {"QUERY_PER_CLASS": 1, "TEST_EPISODES": 2},
        "DATA": {"DATASET": "synthetic", "IMG_SIZE": IMG, "SEQ_LEN": T},
        "SOLVER": {"LR": 1e-3, "LR_SCH": 10 ** 6, "OPTIM_METHOD": "adam",
                   "WEIGHT_DECAY": 1e-4, "MOMENTUM": 0.9},
        "USE_AMP": False,
        "params": SPM_DEFAULT_PARAMS["hmdb"],
    })


def _build(cfg, mesh=None, parallel=1, **model_kw):
    arch = CLIP_ARCHS["test-tiny"]
    model = CLIPSPMModel(arch=arch, way=WAY, shot=SHOT, spm=dict(cfg.params),
                         **model_kw)
    S, Q, D = WAY * SHOT, WAY * QUERIES, arch.embed_dim
    dummy = (
        jnp.zeros((S, T, IMG, IMG, 3), jnp.float32),
        jnp.zeros((Q, T, IMG, IMG, 3), jnp.float32),
        jnp.arange(S, dtype=jnp.int32) % WAY,
        jnp.zeros((S,), jnp.int32), jnp.zeros((Q,), jnp.int32),
        jnp.zeros((8, D), jnp.float32), jnp.zeros((8, D), jnp.float32),
    )
    variables = model.init(jax.random.PRNGKey(0), *dummy)
    text = np.random.default_rng(1).normal(size=(8, D)).astype(np.float32)
    src = SyntheticEpisodeSource(way=WAY, shot=SHOT, queries=QUERIES,
                                 seq_len=T, img_size=IMG + 8, num_classes=8)
    test_src = SyntheticEpisodeSource(way=WAY, shot=SHOT, queries=1,
                                      seq_len=T, img_size=IMG + 8,
                                      num_classes=8, seed=3)
    return Learner(cfg, model, variables, train_source=src,
                   test_source=test_src, text_train=text, text_test=text,
                   transform=TransformSpec(img_size=IMG, resize_to=IMG + 8),
                   mesh=mesh, parallel_episodes=parallel)


def test_mesh_training_matches_sequential_loss():
    """The vmapped+sharded microbatch path computes the same summed loss as
    the sequential scan path (gradient summation is order-insensitive up to
    fp noise)."""
    devices = jax.devices("cpu")
    if len(devices) < 2:
        pytest.skip("needs >=2 virtual devices")
    src = SyntheticEpisodeSource(way=WAY, shot=SHOT, queries=QUERIES,
                                 seq_len=T, img_size=IMG + 8, num_classes=8,
                                 seed=7)
    episodes = [src.sample() for _ in range(4)]

    seq = _build(_cfg(4))
    m_seq = seq.train_episodes(list(episodes))

    mesh = make_mesh(n_dp=2, devices=devices[:2])
    with mesh:
        par = _build(_cfg(4), mesh=mesh, parallel=2)
        m_par = par.train_episodes(list(episodes))

    np.testing.assert_allclose(m_seq["loss"], m_par["loss"], rtol=1e-4)
    np.testing.assert_allclose(m_seq["acc"], m_par["acc"], rtol=1e-5)
    # parameters after the step agree
    a = jax.tree.leaves(seq.state.params)[0]
    b = jax.tree.leaves(par.state.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=1e-5)


def test_checkpoint_roundtrip(tmp_path):
    from clipspm_tpu.train.checkpoint import CheckpointManager

    learner = _build(_cfg(2))
    src = iter(learner.train_source)
    learner.train_episodes([next(src), next(src)])

    mgr = CheckpointManager(str(tmp_path))
    mgr.save(learner.state, "best", best_acc=42.0)
    assert mgr.exists("best")

    fresh = _build(_cfg(2))
    payload = mgr.restore("best", fresh.state)
    restored = payload["state"]
    assert float(payload["meta"]["acc"]) == 42.0
    assert int(payload["meta"]["iteration"]) == 2
    for a, b in zip(jax.tree.leaves(learner.state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored state evaluates identically
    eps = [fresh.test_source.sample() for _ in range(2)]
    fresh.state = restored
    r1 = fresh.evaluate(2, source=iter(eps))
    learner.state = learner.state.replace(rng=restored.rng)
    r2 = learner.evaluate(2, source=iter(eps))
    np.testing.assert_allclose(r1["loss"], r2["loss"], rtol=1e-5)


def test_mesh_train_step_emits_collectives():
    """The sharded microbatch path compiles to real XLA collectives
    (gradient all-reduce over the dp axis), not a degenerate single-device
    program."""
    import jax.numpy as jnp

    from clipspm_tpu.data.episode import stack_episodes

    devices = jax.devices("cpu")
    if len(devices) < 2:
        pytest.skip("needs >=2 virtual devices")
    mesh = make_mesh(n_dp=2, devices=devices[:2])
    with mesh:
        par = _build(_cfg(4), mesh=mesh, parallel=2)
        eps = [par.train_source.sample() for _ in range(4)]
        batch = stack_episodes([jax.tree.map(jnp.asarray, e) for e in eps])
        hlo = jax.jit(par._train_step_impl).lower(
            par.state, batch).compile().as_text()
    assert "all-reduce" in hlo


def test_tensor_parallel_matches_sequential():
    """dp×tp mesh (megatron param sharding over tp) computes the same loss
    and updates as the sequential path — GSPMD annotations are placement
    only — and the params really land sharded over tp."""
    devices = jax.devices("cpu")
    if len(devices) < 4:
        pytest.skip("needs >=4 virtual devices")
    src = SyntheticEpisodeSource(way=WAY, shot=SHOT, queries=QUERIES,
                                 seq_len=T, img_size=IMG + 8, num_classes=8,
                                 seed=11)
    episodes = [src.sample() for _ in range(4)]

    seq = _build(_cfg(4))
    m_seq = seq.train_episodes(list(episodes))

    from clipspm_tpu.parallel import make_mesh as mk
    mesh = make_mesh(n_dp=2, n_tp=2, devices=devices[:4])
    with mesh:
        par = _build(_cfg(4), mesh=mesh, parallel=2)
        # params actually sharded over tp
        from jax.sharding import PartitionSpec as P
        leaf = par.state.params
        for k in ("backbone",):
            assert k in leaf
        specs = [x.sharding.spec for x in jax.tree.leaves(par.state.params)
                 if hasattr(x, "sharding")]
        assert any("tp" in str(s) for s in specs), specs
        m_par = par.train_episodes(list(episodes))

    np.testing.assert_allclose(m_seq["loss"], m_par["loss"], rtol=1e-3)
    a = jax.tree.leaves(seq.state.params)[0]
    b = jax.tree.leaves(par.state.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-3, atol=1e-4)


def test_tensor_parallel_rn50_tower():
    """tp on the RN50 (ModifiedResNet) arch: the conv tower stays
    replicated BY DESIGN (BatchNorm per-channel stats + no matmul dim worth
    sharding at these sizes — see parallel/tensor.py docstring), the
    attention-pool ``c_proj`` Dense shards over tp, and the tp result
    matches the sequential one."""
    import jax.tree_util as jtu

    devices = jax.devices("cpu")
    if len(devices) < 4:
        pytest.skip("needs >=4 virtual devices")
    from clipspm_tpu.models.fsar import CLIPSPMModel as _M

    arch = CLIP_ARCHS["test-tiny-rn"]
    model = _M(arch=arch, way=WAY, shot=SHOT,
               spm=SPM_DEFAULT_PARAMS["hmdb"])
    S, Q, D = WAY * SHOT, WAY * QUERIES, arch.embed_dim
    dummy = (
        jnp.zeros((S, T, IMG, IMG, 3), jnp.float32),
        jnp.zeros((Q, T, IMG, IMG, 3), jnp.float32),
        jnp.arange(S, dtype=jnp.int32) % WAY,
        jnp.zeros((S,), jnp.int32), jnp.zeros((Q,), jnp.int32),
        jnp.zeros((8, D), jnp.float32), jnp.zeros((8, D), jnp.float32),
    )
    variables = model.init(jax.random.PRNGKey(0), *dummy)
    want = model.apply(variables, *dummy, train=False)["logits"]

    from clipspm_tpu.parallel import make_mesh
    from clipspm_tpu.parallel.tensor import megatron_specs, shard_params

    mesh = make_mesh(n_dp=2, n_tp=2, devices=devices[:4])
    with mesh:
        sharded = shard_params(variables["params"], mesh)
        flat = jtu.tree_leaves_with_path(megatron_specs(
            variables["params"], 2))
        conv_specs = [s for p, s in flat
                      if "conv" in jtu.keystr(p) and "c_proj" not in
                      jtu.keystr(p)]
        attnpool_cproj = [s for p, s in flat
                          if "attnpool" in jtu.keystr(p)
                          and "c_proj" in jtu.keystr(p)
                          and "kernel" in jtu.keystr(p)]
        # conv tower replicated; attnpool c_proj row-sharded over tp
        from jax.sharding import PartitionSpec as P
        assert conv_specs and all(s == P() for s in conv_specs)
        assert attnpool_cproj and all("tp" in str(s) for s in attnpool_cproj)

        sv = dict(variables)
        sv["params"] = sharded
        got = jax.jit(lambda v: model.apply(v, *dummy, train=False)["logits"]
                      )(sv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_chunked_encode_under_mesh_matches_unchunked_sequential():
    """The production memory/throughput config — chunked eval encode plus
    remat-chunked TRAIN encode (visual.encode_chunked) — composes with the
    dp x tp mesh: the sharded chunked step reproduces the unchunked
    sequential step's loss and updated params. Guards the interaction of
    nn.scan/nn.remat with GSPMD param sharding (scan carries megatron-
    sharded weights as broadcast vars)."""
    devices = jax.devices("cpu")
    if len(devices) < 4:
        pytest.skip("needs >=4 virtual devices")
    src = SyntheticEpisodeSource(way=WAY, shot=SHOT, queries=QUERIES,
                                 seq_len=T, img_size=IMG + 8, num_classes=8,
                                 seed=13)
    episodes = [src.sample() for _ in range(4)]

    seq = _build(_cfg(4))
    m_seq = seq.train_episodes(list(episodes))

    mesh = make_mesh(n_dp=2, n_tp=2, devices=devices[:4])
    with mesh:
        par = _build(_cfg(4), mesh=mesh, parallel=2,
                     encode_chunk=3, train_encode_chunk=4)
        m_par = par.train_episodes(list(episodes))

    np.testing.assert_allclose(m_seq["loss"], m_par["loss"], rtol=1e-3)
    a = jax.tree.leaves(seq.state.params)[0]
    b = jax.tree.leaves(par.state.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-3, atol=1e-4)


def test_eval_batch_rounds_up_to_dp_multiple():
    """evaluate() must keep the dp-sharded batched path active for any
    requested batch size: _eval_batch_impl only shards when E % dp == 0, so
    an indivisible batch_size is rounded UP (padded episodes are trimmed
    from the metrics) instead of silently falling back to per-chip
    sequential eval."""
    devices = jax.devices("cpu")
    if len(devices) < 2:
        pytest.skip("needs >=2 virtual devices")
    # distinct seeds => distinct episodes, so an untrimmed padded episode
    # (the 4th slot when 3 rounds up to dp=2's multiple) would shift the
    # mean and fail the parity assertion below
    eps = [SyntheticEpisodeSource(way=WAY, shot=SHOT, queries=QUERIES,
                                  seq_len=T, img_size=IMG + 8, num_classes=8,
                                  seed=17 + i).sample() for i in range(3)]

    seq = _build(_cfg(2))
    r_seq = seq.evaluate(3, source=iter(eps), batch_size=1)

    mesh = make_mesh(n_dp=2, devices=devices[:2])
    with mesh:
        par = _build(_cfg(2), mesh=mesh, parallel=2)
        # batch_size=3 is not divisible by dp=2 — must still run (rounded
        # to 4) and produce the same accuracy over the same 3 episodes
        r_par = par.evaluate(3, source=iter(eps), batch_size=3)

    np.testing.assert_allclose(r_seq["accuracy"], r_par["accuracy"],
                               atol=1e-3)
    np.testing.assert_allclose(r_seq["loss"], r_par["loss"], rtol=1e-4)


def test_train_state_owns_its_buffers():
    """The donated train step frees the input state's buffers, so the
    Learner must never alias caller-held arrays into the TrainState
    (learner.py: _own) — in particular text_train/text_test built from ONE
    array would otherwise donate the same buffer via two leaves, which XLA
    rejects with INVALID_ARGUMENT on real devices. Ownership is only
    required — and only paid for — under SOLVER.DONATE_STATE=true; the
    default non-donating path aliases freely (the jitted step never
    mutates its inputs)."""
    arch = CLIP_ARCHS["test-tiny"]
    cfg = _cfg(tpb=2)
    cfg.SOLVER.DONATE_STATE = True
    model = CLIPSPMModel(arch=arch, way=WAY, shot=SHOT, spm=dict(cfg.params))
    S, Q, D = WAY * SHOT, WAY * QUERIES, arch.embed_dim
    dummy = (
        jnp.zeros((S, T, IMG, IMG, 3), jnp.float32),
        jnp.zeros((Q, T, IMG, IMG, 3), jnp.float32),
        jnp.arange(S, dtype=jnp.int32) % WAY,
        jnp.zeros((S,), jnp.int32), jnp.zeros((Q,), jnp.int32),
        jnp.zeros((8, D), jnp.float32), jnp.zeros((8, D), jnp.float32),
    )
    variables = model.init(jax.random.PRNGKey(0), *dummy)
    text = jnp.asarray(
        np.random.default_rng(1).normal(size=(8, D)).astype(np.float32))
    # the SAME device array for both text roles — the donation trap
    learner = Learner(cfg, model, variables, text_train=text, text_test=text)

    caller_leaves = {id(l) for l in jax.tree.leaves(variables["params"])}
    caller_leaves.add(id(text))
    state_leaves = [learner.state.text_train, learner.state.text_test]
    state_leaves += jax.tree.leaves(learner.state.params)
    for leaf in state_leaves:
        assert id(leaf) not in caller_leaves, "TrainState aliases caller"
    # the two text leaves must also be distinct buffers from each other
    assert learner.state.text_train is not learner.state.text_test
    # and donation must not invalidate the caller's arrays after a step
    src = SyntheticEpisodeSource(way=WAY, shot=SHOT, queries=QUERIES,
                                 seq_len=T, img_size=IMG + 8, num_classes=8)
    learner.transform = TransformSpec(img_size=IMG, resize_to=IMG + 8)
    learner.train_episodes([src.sample(), src.sample()])
    np.asarray(text)  # still alive
    np.asarray(jax.tree.leaves(variables["params"])[0])
