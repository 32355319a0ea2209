"""Per-head forward/backward contract tests on tiny configs.

Every head must return ``logits`` of shape [1, Q, way] with finite values and
differentiable parameters (the reference output contract,
e.g. models/model_TRX.py:179, models/model_otam.py:165).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipspm_tpu.models.backbones.clip import CLIP_ARCHS
from clipspm_tpu.train.losses import episodic_ce

WAY, SHOT, QUERIES, T, IMG = 2, 2, 2, 3, 32
S, Q = WAY * SHOT, WAY * QUERIES


N_CLASSES = 6


def episode_inputs(dim):
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(N_CLASSES, dim)), jnp.float32)
    return (
        jnp.asarray(rng.uniform(size=(S, T, IMG, IMG, 3)), jnp.float32),
        jnp.asarray(rng.uniform(size=(Q, T, IMG, IMG, 3)), jnp.float32),
        jnp.asarray([0, 1, 0, 1], jnp.int32),
        jnp.asarray([2, 5, 2, 5], jnp.int32),
        jnp.asarray([2, 5, 2, 5], jnp.int32),
        table,
        table,
    )


def make_model(name):
    if name == "clipspm":
        from clipspm_tpu.models.fsar import CLIPSPMModel
        from clipspm_tpu.utils.config import SPM_DEFAULT_PARAMS

        arch = CLIP_ARCHS["test-tiny"]
        return (CLIPSPMModel(arch=arch, way=WAY, shot=SHOT,
                             spm=SPM_DEFAULT_PARAMS["hmdb"]),
                arch.embed_dim)
    if name == "sten":
        from clipspm_tpu.models.heads.sten import STENModel

        arch = CLIP_ARCHS["test-tiny"]
        return STENModel(arch=arch, way=WAY, shot=SHOT), arch.embed_dim
    if name == "otam":
        from clipspm_tpu.models.heads.otam import OTAMModel

        return OTAMModel(way=WAY, shot=SHOT, arch="resnet18",
                         backbone_width=8), 64
    if name == "trx":
        from clipspm_tpu.models.heads.trx import TRXModel

        return TRXModel(way=WAY, shot=SHOT, seq_len=T, temp_set=(2,),
                        out_dim=32, arch="resnet18", backbone_width=8), 64
    if name == "clipfsar":
        from clipspm_tpu.models.heads.clipfsar import CLIPFSARModel

        arch = CLIP_ARCHS["test-tiny"]
        return CLIPFSARModel(arch=arch, way=WAY, shot=SHOT), arch.embed_dim
    if name == "strm":
        from clipspm_tpu.models.heads.strm import STRMModel

        return STRMModel(way=WAY, shot=SHOT, seq_len=T, temp_set=(2,),
                         out_dim=32, arch="resnet18", backbone_width=8,
                         num_patches_side=1), 64
    if name == "molo":
        from clipspm_tpu.models.heads.molo import MoLoModel

        return MoLoModel(way=WAY, shot=SHOT, seq_len=T, arch="resnet18",
                         backbone_width=8, num_class=N_CLASSES,
                         factor=4), 64
    if name == "soap":
        from clipspm_tpu.models.heads.soap import SOAPModel

        return SOAPModel(way=WAY, shot=SHOT, seq_len=T, temp_set=(2,),
                         out_dim=32, horizons=(1, 2), cr=4,
                         arch="resnet18", backbone_width=8), 64
    if name == "cpm2c":
        from clipspm_tpu.models.heads.cpm2c import CPM2CModel
        from clipspm_tpu.utils.config import SPM_DEFAULT_PARAMS

        arch = CLIP_ARCHS["test-tiny"]
        return (CPM2CModel(arch=arch, way=WAY, shot=SHOT,
                           params=SPM_DEFAULT_PARAMS["hmdb"]),
                arch.embed_dim)
    if name == "ta2n":
        from clipspm_tpu.models.heads.ta2n import TA2NModel

        return TA2NModel(way=WAY, shot=SHOT, seq_len=T, arch="resnet18",
                         backbone_width=8), 64


HEADS = ["sten", "otam", "trx", "clipfsar", "strm", "molo", "soap",
         "cpm2c", "ta2n"]


@pytest.mark.parametrize("name", HEADS)
def test_head_forward_contract(name):
    model, dim = make_model(name)
    inputs = episode_inputs(dim)
    variables = model.init(jax.random.PRNGKey(0), *inputs)
    out = model.apply(variables, *inputs, train=False,
                      mutable=False)
    logits = out["logits"]
    assert logits.shape == (1, Q, WAY)
    assert np.isfinite(np.asarray(logits)).all()


def test_molo_use_local_per_token_logits():
    """USE_LOCAL classifies every token (T+1 incl class token) instead of the
    pooled video (reference: models/model_molo.py:388-389)."""
    from clipspm_tpu.models.heads.molo import MoLoModel

    model = MoLoModel(way=WAY, shot=SHOT, seq_len=T, arch="resnet18",
                      backbone_width=8, num_class=N_CLASSES, factor=4,
                      use_local=True)
    inputs = episode_inputs(64)
    variables = model.init(jax.random.PRNGKey(0), *inputs)
    out = model.apply(variables, *inputs, train=False, mutable=False)
    n_videos = WAY * SHOT + Q
    assert out["class_logits"].shape == (1, n_videos * (T + 1), N_CLASSES)
    assert np.isfinite(np.asarray(out["class_logits"])).all()


@pytest.mark.parametrize("name", HEADS)
def test_head_backward(name):
    model, dim = make_model(name)
    inputs = episode_inputs(dim)
    variables = model.init(jax.random.PRNGKey(0), *inputs)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    labels = jnp.asarray([0, 1, 0, 1], jnp.int32)

    def loss_fn(p):
        v = {"params": p}
        mutable = False
        if stats:
            v["batch_stats"] = stats
            mutable = ["batch_stats"]
        out = model.apply(v, *inputs, train=True, mutable=mutable,
                          rngs={"dropout": jax.random.PRNGKey(1)})
        if mutable:
            out = out[0]
        return episodic_ce(out["logits"], labels)

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree.leaves(grads)
    total = sum(float(jnp.sum(jnp.abs(g))) for g in flat)
    assert np.isfinite(total) and total > 0
