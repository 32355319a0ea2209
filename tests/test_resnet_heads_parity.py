"""Head-math parity for the torchvision-ResNet heads (TRX, STRM, OTAM).

The reference backbones are replaced by identity so both sides consume the
same random *features*; weights are converted module-by-module. Validates the
vectorized per-class einsum TCT against the reference's python class loop,
the STRM enrichment blocks + tuple cdist, and OTAM's class-mean + mo_3.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_DIR = "/root/reference/models"

WAY, SHOT, QUERIES, T, D = 2, 2, 2, 4, 32
S, Q = WAY * SHOT, WAY * QUERIES


class _Cfg:
    def __init__(self, d):
        for k, v in d.items():
            setattr(self, k, _Cfg(v) if isinstance(v, dict) else v)


def _cfg(name, temp_set=(2,), extra=None):
    d = {
        "MODEL": {"NAME": name, "BACKBONE": "resnet50", "TEMP_SET": list(temp_set),
                  "TRANS_DROPOUT": 0.0, "SEED": 0},
        "TRAIN": {"WAY": WAY, "SHOT": SHOT},
        "TEST": {},
        "DATA": {"SEQ_LEN": T},
        "DEVICE": {"NUM_GPUS": 1, "DEVICE": "cpu"},
    }
    cfg = _Cfg(d)
    cfg.trans_linear_in_dim = D
    cfg.trans_linear_out_dim = 24
    if extra:
        for k, v in extra.items():
            setattr(cfg, k, v)
    return cfg


@pytest.fixture(scope="module")
def refpkg():
    if not os.path.isdir(REF_DIR):
        pytest.skip("reference checkout not available")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_blocks_parity import _install_stubs

    _install_stubs()
    torch.Tensor.cuda = lambda self, *a, **kw: self
    if "ipdb" not in sys.modules:
        ipdb = types.ModuleType("ipdb")
        ipdb.set_trace = lambda *a, **kw: None
        sys.modules["ipdb"] = ipdb
    tvm = sys.modules["torchvision.models"]
    for rn in ("resnet18", "resnet34", "resnet50"):
        setattr(tvm, rn, lambda *a, **kw: torch.nn.Identity())
    for wn in ("ResNet18_Weights", "ResNet34_Weights", "ResNet50_Weights"):
        setattr(tvm, wn, types.SimpleNamespace(DEFAULT=None))

    if "refmodels" not in sys.modules:
        pkg = types.ModuleType("refmodels")
        pkg.__path__ = [REF_DIR]
        sys.modules["refmodels"] = pkg

    # the reference heads import utils.utils (split_first_dim_linear)
    if "utils" not in sys.modules:
        up = types.ModuleType("utils")
        uu = types.ModuleType("utils.utils")

        def split_first_dim_linear(x, first_two_dims):
            shape = list(first_two_dims)
            if len(x.size()) > 1:
                shape += [x.size()[-1]]
            return x.view(shape)

        uu.split_first_dim_linear = split_first_dim_linear
        up.utils = uu
        sys.modules["utils"] = up
        sys.modules["utils.utils"] = uu

    def load_sub(name):
        key = f"refmodels.{name}"
        if key in sys.modules:
            return sys.modules[key]
        spec = importlib.util.spec_from_file_location(
            key, os.path.join(REF_DIR, f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[key] = mod
        spec.loader.exec_module(mod)
        return mod

    return load_sub


def _dense(lin):
    p = {"kernel": lin.weight.detach().numpy().T}
    if lin.bias is not None:
        p["bias"] = lin.bias.detach().numpy()
    return p


def _tct_params(t):
    return {
        "k_linear": _dense(t.k_linear),
        "v_linear": _dense(t.v_linear),
        "norm_k": {"scale": t.norm_k.weight.detach().numpy(),
                   "bias": t.norm_k.bias.detach().numpy()},
    }


def _episode():
    rng = np.random.default_rng(0)
    su = rng.normal(size=(S, T, D)).astype(np.float32)
    qu = rng.normal(size=(Q, T, D)).astype(np.float32)
    labels = np.asarray([0, 1, 0, 1], np.int32)
    return su, qu, labels


def test_trx_parity(refpkg):
    import jax.numpy as jnp

    from clipspm_tpu.models.heads.trx import TemporalCrossTransformer

    ref_mod = refpkg("model_TRX")
    torch.manual_seed(0)
    cfg = _cfg("trx")
    ref = ref_mod.TemporalCrossTransformer(cfg, temporal_set_size=2).eval()

    su, qu, labels = _episode()
    with torch.no_grad():
        want = ref(torch.from_numpy(su), torch.from_numpy(labels).float(),
                   torch.from_numpy(qu))["logits"].numpy()

    ours = TemporalCrossTransformer(way=WAY, shot=SHOT, seq_len=T, in_dim=D,
                                    out_dim=24, set_size=2, dropout=0.0)
    got = ours.apply({"params": _tct_params(ref)}, jnp.asarray(su),
                     jnp.asarray(labels), jnp.asarray(qu),
                     deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-3)


def test_strm_distance_loss_parity(refpkg):
    import jax.numpy as jnp

    from clipspm_tpu.models.heads.strm import TupleDistanceLoss

    ref_mod = refpkg("model_strm")
    torch.manual_seed(1)
    cfg = _cfg("strm")
    ref = ref_mod.DistanceLoss(cfg, temporal_set_size=2).eval()

    su, qu, labels = _episode()
    with torch.no_grad():
        want = ref(torch.from_numpy(su), torch.from_numpy(labels).float(),
                   torch.from_numpy(qu))["logits"].numpy()

    ours = TupleDistanceLoss(way=WAY, shot=SHOT, seq_len=T, in_dim=D,
                             set_size=2)
    got = ours.apply({"params": {"clsW": _dense(ref.clsW)}},
                     jnp.asarray(su), jnp.asarray(labels), jnp.asarray(qu),
                     deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-3)


def test_strm_enrichment_parity(refpkg):
    import jax.numpy as jnp

    from clipspm_tpu.models.heads.strm import MLPMixEnrich, SelfAttnBot

    ref_mod = refpkg("model_strm")
    torch.manual_seed(2)
    x = np.random.default_rng(3).normal(size=(5, 8, D)).astype(np.float32)

    ref_attn = ref_mod.Self_Attn_Bot(D, 8).eval()
    with torch.no_grad():
        want = ref_attn(torch.from_numpy(x)).numpy()
    params = {
        "query_proj": _dense(ref_attn.query_proj),
        "key_proj": _dense(ref_attn.key_proj),
        "value_conv": _dense(ref_attn.value_conv),
        "gamma": ref_attn.gamma.detach().numpy(),
        "inp_fc": _dense(ref_attn.Bot_MLP.inp_fc),
        "hid_fc": _dense(ref_attn.Bot_MLP.hid_fc),
        "out_fc": _dense(ref_attn.Bot_MLP.out_fc),
    }
    got = SelfAttnBot(dim=D, seq_len=8).apply({"params": params},
                                              jnp.asarray(x),
                                              deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-3)

    ref_mix = ref_mod.MLP_Mix_Enrich(D, 8).eval()
    with torch.no_grad():
        want = ref_mix(torch.from_numpy(x)).numpy()
    params = {
        "tok_inp": _dense(ref_mix.Tok_MLP.inp_fc),
        "tok_out": _dense(ref_mix.Tok_MLP.out_fc),
        "bot_inp": _dense(ref_mix.Bot_MLP.inp_fc),
        "bot_out": _dense(ref_mix.Bot_MLP.out_fc),
    }
    got = MLPMixEnrich(dim=D, seq_len=8).apply({"params": params},
                                               jnp.asarray(x),
                                               deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-3)


def test_otam_head_class_mean_parity(refpkg):
    """OTAM head logits: bidirectional lambda=0.1 DP + class-mean over
    support instances (reference: models/model_otam.py:139-165), with the
    mo_3 module bypassed (identity backbone, mo compared separately)."""
    import jax.numpy as jnp

    from clipspm_tpu.ops.otam import otam_distance
    from clipspm_tpu.models.blocks import class_prototypes

    ref_mod = refpkg("model_otam")
    su, qu, labels = _episode()
    su_t, qu_t = torch.from_numpy(su), torch.from_numpy(qu)
    with torch.no_grad():
        fs = ref_mod.cos_sim(qu_t.reshape(Q * T, D), su_t.reshape(S * T, D))
        dists = (1 - fs).reshape(Q, T, S, T).permute(0, 2, 1, 3)
        cum = (ref_mod.OTAM_cum_dist(dists)
               + ref_mod.OTAM_cum_dist(dists.permute(0, 1, 3, 2)))
        class_dists = torch.stack(
            [torch.mean(torch.index_select(
                cum, 1, ref_mod.extract_class_indices(
                    torch.from_numpy(labels).float(), c)), dim=1)
             for c in torch.unique(torch.from_numpy(labels).float())])
        want = -class_dists.t().numpy()

    cum_ours = otam_distance(jnp.asarray(su), jnp.asarray(qu), lbda=0.1,
                             bidirectional=True)
    got = -class_prototypes(cum_ours.T, jnp.asarray(labels), WAY).T
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)
