"""Composed full-forward parity for STRM and the OTAM head's mo_3 module.

STRM: conv-stub backbone on both sides; covers adaptive-max patch pooling,
patch attention, frame enrichment, both logit streams end-to-end
(reference: models/model_strm.py:417-516).
mo_3: the spatial motion-token module whose output ("mo_logits") the OTAM
head returns (reference: models/myRes.py:571-600).
"""

import os
import sys
import types
from collections import OrderedDict

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_DIR = "/root/reference/models"
WAY, SHOT, QUERIES, T, IMG = 2, 2, 2, 4, 128
S, Q = WAY * SHOT, WAY * QUERIES
DIM = 64


class _Cfg:
    def __init__(self, d):
        for k, v in d.items():
            setattr(self, k, _Cfg(v) if isinstance(v, dict) else v)


@pytest.fixture(scope="module")
def refload():
    if not os.path.isdir(REF_DIR):
        pytest.skip("reference checkout not available")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_resnet_heads_parity import refpkg

    # reuse the generator from the other module via direct call
    import importlib.util
    from test_blocks_parity import _install_stubs

    _install_stubs()
    torch.Tensor.cuda = lambda self, *a, **kw: self
    if "ipdb" not in sys.modules:
        m = types.ModuleType("ipdb")
        m.set_trace = lambda *a, **kw: None
        sys.modules["ipdb"] = m
    if "refmodels" not in sys.modules:
        pkg = types.ModuleType("refmodels")
        pkg.__path__ = [REF_DIR]
        sys.modules["refmodels"] = pkg
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

    def load_sub(name, fresh=False):
        key = f"refmodels.{name}"
        if key in sys.modules and not fresh:
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


def _conv2d(c):
    p = {"kernel": c.weight.detach().numpy().transpose(2, 3, 1, 0)}
    if c.bias is not None:
        p["bias"] = c.bias.detach().numpy()
    return p


def build_strm_pair(refload):
    """(torch CNN_STRM, flax STRMModel, converted params, episode arrays) —
    shared by the forward- and gradient-parity tests."""
    import flax.linen as fnn

    from clipspm_tpu.models.heads.strm import STRMModel

    tvm = sys.modules["torchvision.models"]

    def fake_resnet50(*a, **kw):
        # children[:-2] keeps (conv,); spatial map survives
        torch.manual_seed(11)
        return torch.nn.Sequential(OrderedDict([
            ("conv", torch.nn.Conv2d(3, DIM, 16, 16)),
            ("tail1", torch.nn.Identity()),
            ("tail2", torch.nn.Identity()),
        ]))

    tvm.resnet50 = fake_resnet50
    tvm.ResNet50_Weights = types.SimpleNamespace(DEFAULT=None)
    sys.modules.pop("refmodels.model_strm", None)
    ref_mod = refload("model_strm", fresh=True)

    cfg = _Cfg({
        "MODEL": {"NAME": "strm", "BACKBONE": "resnet50", "SEED": 0,
                  "TEMP_SET": [2], "TRANS_DROPOUT": 0.0},
        "TRAIN": {"WAY": WAY, "SHOT": SHOT},
        "DATA": {"SEQ_LEN": T},
        "DEVICE": {"NUM_GPUS": 1, "DEVICE": "cpu"},
    })
    cfg.trans_linear_in_dim = DIM
    cfg.trans_linear_out_dim = 24
    torch.manual_seed(0)
    ref = ref_mod.CNN_STRM(cfg).eval()
    # latent reference defect: new_dist_loss_post_pat is a plain python list
    # (models/model_strm.py:446), so .eval() never reaches it and its
    # Dropout(0.1) stays live at eval time; force eval for a deterministic
    # comparison (our implementation has no such leak)
    for m in ref.new_dist_loss_post_pat:
        m.eval()

    rng = np.random.default_rng(0)
    su = rng.uniform(size=(S * T, 3, IMG, IMG)).astype(np.float32)
    qu = rng.uniform(size=(Q * T, 3, IMG, IMG)).astype(np.float32)
    labels = np.asarray([0, 1, 0, 1], np.int32)

    class ConvStub(fnn.Module):
        feature_dim: int = DIM

        @fnn.compact
        def __call__(self, x, *, train: bool = False):
            return fnn.Conv(DIM, (16, 16), strides=16, padding="VALID",
                            name="conv")(x)

    ap = ref.attn_pat
    fr = ref.fr_enrich
    tct = ref.transformers[0]
    tdl = ref.new_dist_loss_post_pat[0]
    params = {
        "backbone_override": {"conv": _conv2d(ref.resnet[0])},
        "attn_pat": {
            "query_proj": _dense(ap.query_proj),
            "key_proj": _dense(ap.key_proj),
            "value_conv": _dense(ap.value_conv),
            "gamma": ap.gamma.detach().numpy(),
            "inp_fc": _dense(ap.Bot_MLP.inp_fc),
            "hid_fc": _dense(ap.Bot_MLP.hid_fc),
            "out_fc": _dense(ap.Bot_MLP.out_fc),
        },
        "fr_enrich": {
            "tok_inp": _dense(fr.Tok_MLP.inp_fc),
            "tok_out": _dense(fr.Tok_MLP.out_fc),
            "bot_inp": _dense(fr.Bot_MLP.inp_fc),
            "bot_out": _dense(fr.Bot_MLP.out_fc),
        },
        "tct_2": {
            "k_linear": _dense(tct.k_linear),
            "v_linear": _dense(tct.v_linear),
            "norm_k": {"scale": tct.norm_k.weight.detach().numpy(),
                       "bias": tct.norm_k.bias.detach().numpy()},
        },
        "tdl_2": {"clsW": _dense(tdl.clsW)},
    }

    ours = STRMModel(way=WAY, shot=SHOT, seq_len=T, temp_set=(2,),
                     out_dim=24, backbone_override=ConvStub())
    su_j = su.reshape(S, T, 3, IMG, IMG).transpose(0, 1, 3, 4, 2)
    qu_j = qu.reshape(Q, T, 3, IMG, IMG).transpose(0, 1, 3, 4, 2)
    return ref, ours, params, (su, qu, su_j, qu_j, labels)


def test_strm_full_forward_parity(refload):
    import jax.numpy as jnp

    ref, ours, params, (su, qu, su_j, qu_j, labels) = build_strm_pair(refload)

    with torch.no_grad():
        want = ref({"context_images": torch.from_numpy(su),
                    "context_labels": torch.from_numpy(labels).float(),
                    "target_images": torch.from_numpy(qu)})
    got = ours.apply({"params": params}, jnp.asarray(su_j), jnp.asarray(qu_j),
                     jnp.asarray(labels), train=False)
    np.testing.assert_allclose(np.asarray(got["logits"]),
                               want["logits"].numpy(), atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(got["logits_post_pat"]),
                               want["logits_post_pat"].numpy(),
                               atol=2e-3, rtol=2e-3)


def test_mo3_parity(refload):
    import jax.numpy as jnp

    from clipspm_tpu.models.heads.otam import MoTokens

    myres = refload("myRes")
    torch.manual_seed(3)
    ref = myres.mo_3().eval()
    # mo_3 hard-codes dim 2048, 49 tokens, and 8 frames
    # (models/myRes.py:574,581-585)
    D, TOK, T8 = 2048, 49, 8

    rng = np.random.default_rng(0)
    # reference input layout: [N*T, D, 7, 7]
    su_sp = rng.normal(size=(S * T8, D, 7, 7)).astype(np.float32) * 0.1
    qu_sp = rng.normal(size=(Q * T8, D, 7, 7)).astype(np.float32) * 0.1
    labels = np.asarray([0, 1, 0, 1], np.int32)

    with torch.no_grad():
        want = ref(torch.from_numpy(qu_sp), torch.from_numpy(su_sp),
                   torch.from_numpy(labels).float()).numpy()

    def transformer_v1(t):
        attn_mod, ff_mod = t.layers[0][0], t.layers[0][1]
        return {
            "norm_0": {"scale": attn_mod.norm.weight.detach().numpy(),
                       "bias": attn_mod.norm.bias.detach().numpy()},
            "attn_0": {
                "to_q": {"kernel": attn_mod.fn.to_q.weight.detach().numpy().T},
                "to_k": {"kernel": attn_mod.fn.to_k.weight.detach().numpy().T},
                "to_v": {"kernel": attn_mod.fn.to_v.weight.detach().numpy().T},
                "to_out": _dense(attn_mod.fn.to_out[0]),
            },
            "ff_0": {"fc1": _dense(ff_mod.net[0]),
                     "fc2": _dense(ff_mod.net[3])},
        }

    params = {
        "mo": ref.mo.detach().numpy(),
        "trans_1": transformer_v1(ref.trans_1),
        "trans_2": transformer_v1(ref.trans_2),
    }
    ours = MoTokens(dim=D, tokens=TOK, way=WAY)
    # our layout: [N, T, tokens, D]
    qu_j = qu_sp.reshape(Q, T8, D, TOK).transpose(0, 1, 3, 2)
    su_j = su_sp.reshape(S, T8, D, TOK).transpose(0, 1, 3, 2)
    got = ours.apply({"params": params}, jnp.asarray(qu_j), jnp.asarray(su_j),
                     jnp.asarray(labels), deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)
