"""Remaining head parity: SOAP (full, conv-stub backbone), TA2N modules
(gen_mask + temporal grid sample + full forward), CPM2C (full, dummy CLIP),
STEN (full, dummy CLIP)."""

import importlib.util
import os
import sys
import types
from collections import OrderedDict

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_DIR = "/root/reference/models"
WAY, SHOT, QUERIES, T = 2, 2, 2, 4
S, Q = WAY * SHOT, WAY * QUERIES


class _Cfg:
    def __init__(self, d):
        for k, v in d.items():
            setattr(self, k, _Cfg(v) if isinstance(v, dict) else v)


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


def _conv3d(c):
    p = {"kernel": c.weight.detach().numpy().transpose(2, 3, 4, 1, 0)}
    if c.bias is not None:
        p["bias"] = c.bias.detach().numpy()
    return p


def _conv1d(c):
    p = {"kernel": c.weight.detach().numpy().transpose(2, 1, 0)}
    if c.bias is not None:
        p["bias"] = c.bias.detach().numpy()
    return p


def _transformer_v1(t):
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
        "ff_0": {"fc1": _dense(ff_mod.net[0]), "fc2": _dense(ff_mod.net[3])},
    }


@pytest.fixture(scope="module")
def refload():
    if not os.path.isdir(REF_DIR):
        pytest.skip("reference checkout not available")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_blocks_parity import _install_stubs

    _install_stubs()
    torch.Tensor.cuda = lambda self, *a, **kw: self
    if "ipdb" not in sys.modules:
        m = types.ModuleType("ipdb")
        m.set_trace = lambda *a, **kw: None
        sys.modules["ipdb"] = m
    if "thop" not in sys.modules:
        m = types.ModuleType("thop")
        m.profile = lambda *a, **kw: (0, 0)
        sys.modules["thop"] = m
    tvm = sys.modules["torchvision.models"]
    for wn in ("ResNet18_Weights", "ResNet34_Weights", "ResNet50_Weights"):
        setattr(tvm, wn, types.SimpleNamespace(DEFAULT=None))
    if "refmodels" not in sys.modules:
        pkg = types.ModuleType("refmodels")
        pkg.__path__ = [REF_DIR]
        sys.modules["refmodels"] = pkg

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


# ---------------------------------------------------------------------------
# SOAP — full forward with a conv-stub backbone
# ---------------------------------------------------------------------------

def build_soap_pair(refload):
    """(torch CNN_SOAP, flax SOAPModel, params, episode arrays) — shared by
    the forward- and gradient-parity tests."""
    import flax.linen as fnn

    from clipspm_tpu.models.heads.soap import SOAPModel

    DIM, IMG = 64, 64
    tvm = sys.modules["torchvision.models"]

    def fake_resnet50(*a, **kw):
        # CNN_SOAP keeps children[:-1]: (conv, pool) survive, "fc" dropped
        torch.manual_seed(7)
        return torch.nn.Sequential(OrderedDict([
            ("conv", torch.nn.Conv2d(3, DIM, 32, 32)),
            ("pool", torch.nn.AdaptiveAvgPool2d(1)),
            ("fc", torch.nn.Identity()),
        ]))

    tvm.resnet50 = fake_resnet50
    sys.modules.pop("refmodels.model_soap", None)
    # the reference HMEM conv hard-codes device='cuda'
    # (models/model_soap.py:172); strip device kwargs on this CPU box
    _orig_conv2d = torch.nn.Conv2d

    class _CPUConv2d(_orig_conv2d):
        def __init__(self, *a, **kw):
            kw.pop("device", None)
            super().__init__(*a, **kw)

    torch.nn.Conv2d = _CPUConv2d
    ref_mod = refload("model_soap")

    cfg = _Cfg({
        "MODEL": {"NAME": "soap", "BACKBONE": "resnet50", "SEED": 0,
                  "TEMP_SET": [2], "TRANS_DROPOUT": 0.0,
                  "O": [1, 2], "cr": 4},
        "TRAIN": {"WAY": WAY, "SHOT": SHOT},
        "DATA": {"SEQ_LEN": T},
        "DEVICE": {"NUM_GPUS": 1, "DEVICE": "cpu"},
    })
    cfg.trans_linear_in_dim = DIM
    cfg.trans_linear_out_dim = 24
    torch.manual_seed(0)
    ref = ref_mod.CNN_SOAP(cfg).eval()
    # register the HMEM convs (plain python list in the reference — their
    # params are random in both impls; copy them explicitly)
    hmems = ref.tripel_prior.hmem_ls

    rng = np.random.default_rng(0)
    su = rng.uniform(size=(S * T, 3, IMG, IMG)).astype(np.float32)
    qu = rng.uniform(size=(Q * T, 3, IMG, IMG)).astype(np.float32)
    labels = np.asarray([0, 1, 0, 1], np.int32)

    class ConvStub(fnn.Module):
        feature_dim: int = DIM

        @fnn.compact
        def __call__(self, x, *, train: bool = False):
            h = fnn.Conv(DIM, (32, 32), strides=32, padding="VALID",
                         name="conv")(x)
            return h.mean(axis=(1, 2))  # AdaptiveAvgPool2d(1) + flatten

    sp = ref.tripel_prior
    params = {
        "backbone_override": {"conv": _conv2d(ref.resnet[0])},
        "tripel_prior": {
            "conv_st": _conv3d(sp.conv_st),
            "conv_ch1": {"kernel": sp.conv_ch1.weight.detach().numpy()
                         [:, :, 0, 0].T},
            "conv_ch2": {"kernel": sp.conv_ch2.weight.detach().numpy()
                         [:, :, 0, 0].T},
            "conv_ch_1d": {"kernel": sp.conv_ch_1d.weight.detach().numpy()
                           [:, :, :, 0].transpose(2, 1, 0),
                           "bias": sp.conv_ch_1d.bias.detach().numpy()},
            "hm_lin": _dense(sp.hm_lin),
            "hmem_1": {"conv": _conv2d(hmems[0].conv)},
            "hmem_2": {"conv": _conv2d(hmems[1].conv)},
        },
        "tct_2": {
            "k_linear": _dense(ref.transformers[0].k_linear),
            "v_linear": _dense(ref.transformers[0].v_linear),
            "norm_k": {"scale": ref.transformers[0].norm_k.weight.detach().numpy(),
                       "bias": ref.transformers[0].norm_k.bias.detach().numpy()},
        },
        "lmd": np.asarray(0.5, np.float32),
    }

    ours = SOAPModel(way=WAY, shot=SHOT, seq_len=T, temp_set=(2,),
                     out_dim=24, horizons=(1, 2), cr=4,
                     backbone_override=ConvStub())
    su_j = su.reshape(S, T, 3, IMG, IMG).transpose(0, 1, 3, 4, 2)
    qu_j = qu.reshape(Q, T, 3, IMG, IMG).transpose(0, 1, 3, 4, 2)
    return ref, ours, params, (su, qu, su_j, qu_j, labels)


def test_soap_full_forward_parity(refload):
    import jax.numpy as jnp

    ref, ours, params, (su, qu, su_j, qu_j, labels) = build_soap_pair(refload)

    with torch.no_grad():
        want = ref({"context_images": torch.from_numpy(su),
                    "context_labels": torch.from_numpy(labels).float(),
                    "target_images": torch.from_numpy(qu)})
    got = ours.apply({"params": params}, jnp.asarray(su_j), jnp.asarray(qu_j),
                     jnp.asarray(labels), train=False)
    np.testing.assert_allclose(np.asarray(got["logits"]),
                               want["logits"].numpy(), atol=2e-3, rtol=2e-3)


# ---------------------------------------------------------------------------
# TA2N — gen_mask + temporal grid sample parity
# ---------------------------------------------------------------------------

def test_ta2n_gen_mask_parity(refload):
    import jax.numpy as jnp

    from clipspm_tpu.models.heads.ta2n import gen_mask

    ref_mod = refload("ta2n")
    rng = np.random.default_rng(0)
    offsets = rng.uniform(-1.2, 1.2, size=(6, 4, 2)).astype(np.float32)
    with torch.no_grad():
        # the reference builds the grid with .cuda() (patched to identity)
        want = ref_mod.gen_mask(torch.from_numpy(offsets), 7).numpy()
    got = np.asarray(gen_mask(jnp.asarray(offsets), 7))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_ta2n_temporal_warp_parity(refload):
    """TTM.align's 1-D grid_sample vs. our temporal_grid_sample
    (reference: models/ta2n.py:78-98)."""
    import jax.numpy as jnp
    import torch.nn.functional as F

    from clipspm_tpu.models.heads.ta2n import temporal_grid_sample

    rng = np.random.default_rng(1)
    N, C, Tn, H, W = 3, 6, 8, 2, 2
    feats = rng.normal(size=(N, C, Tn, H, W)).astype(np.float32)
    theta = rng.uniform(0.5, 1.2, size=(N, 2)).astype(np.float32)
    theta[:, 1] = rng.uniform(-0.3, 0.3, size=N)

    with torch.no_grad():
        f = torch.from_numpy(feats)
        th = torch.from_numpy(theta)
        grid_t = torch.linspace(-1, 1, Tn).unsqueeze(0).expand(N, -1)
        grid_t = grid_t.reshape(N, 1, Tn, 1)
        grid_t = torch.einsum(
            "bc,bhtc->bht", th,
            torch.cat([grid_t, torch.ones_like(grid_t)], -1)).unsqueeze(-1)
        grid = torch.cat([grid_t, torch.zeros_like(grid_t) - 1.0], -1)
        ff = f.transpose(-3, -4).reshape(N, Tn, -1).transpose(-1, -2).unsqueeze(-2)
        want = F.grid_sample(ff, grid, align_corners=True)
        want = want.squeeze(-2).transpose(-1, -2).reshape(
            N, Tn, C, H, W).numpy()

    coords = theta[:, :1] * np.linspace(-1, 1, Tn)[None] + theta[:, 1:]
    feats_j = feats.transpose(0, 2, 3, 4, 1)  # [N, T, H, W, C]
    got = np.asarray(temporal_grid_sample(jnp.asarray(feats_j),
                                          jnp.asarray(coords)))
    got = got.transpose(0, 1, 4, 2, 3)  # [N, T, C, H, W]
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# STEN — full forward with dummy CLIP
# ---------------------------------------------------------------------------

def _dummy_clip(refload, dim):
    clip_fsar = refload("clip_fsar")

    class DummyCLIP:
        visual = torch.nn.Identity()

        @staticmethod
        def encode_text(tokens):
            g = torch.Generator().manual_seed(int(tokens.sum().item()) % 997)
            return torch.randn(tokens.shape[0], dim, generator=g)

    clip_fsar.load = lambda *a, **kw: (DummyCLIP(), None)
    clip_fsar.tokenize = lambda texts, *a, **kw: torch.ones(
        1 if isinstance(texts, str) else len(texts), 7,
        dtype=torch.long) * (abs(hash(str(texts))) % 50 + 1)
    return clip_fsar


def build_sten_pair(refload):
    """(torch sten, flax STENModel, episode arrays incl. text tables) —
    shared by the forward- and gradient-parity tests. sten has no learnable
    head parameters; parity runs on features through Identity backbones."""
    from clipspm_tpu.models.backbones.clip import CLIP_ARCHS
    from clipspm_tpu.models.fsar import IdentityBackbone
    from clipspm_tpu.models.heads.sten import STENModel

    DIM = 1024
    _dummy_clip(refload, DIM)
    sys.modules.pop("refmodels.model_sten", None)
    ref_mod = refload("model_sten")

    cfg = _Cfg({
        "MODEL": {"BACKBONE": "RN50", "NAME": "sten"},
        "TRAIN": {"CLASS_NAME": ["a", "b", "c"], "WAY": WAY, "SHOT": SHOT},
        "TEST": {"CLASS_NAME": ["d", "e", "f"]},
        "DATA": {"SEQ_LEN": T},
        "DEVICE": {"NUM_GPUS": 1},
    })
    torch.manual_seed(0)
    ref = ref_mod.CNN_OTAM_CLIPFSAR(cfg)
    ref.backbone = torch.nn.Identity()
    ref = ref.eval()
    # sten reshapes backbone output to (-1, 8, mid_dim) with a literal 8;
    # run with T=8 to match
    Tn = 8

    rng = np.random.default_rng(0)
    su = rng.normal(size=(S, Tn, DIM)).astype(np.float32)
    qu = rng.normal(size=(Q, Tn, DIM)).astype(np.float32)
    labels = np.asarray([0, 1, 0, 1], np.int32)
    real_sup = np.asarray([0, 2, 0, 2], np.int32)
    real_tgt = np.asarray([2, 0, 2, 0], np.int32)

    ours = STENModel(arch=CLIP_ARCHS["RN50"], way=WAY, shot=SHOT,
                     backbone_override=IdentityBackbone())
    text_train = ref.text_features_train.detach().numpy()
    text_test = ref.text_features_test.detach().numpy()
    return ref, ours, (su, qu, labels, real_sup, real_tgt,
                       text_train, text_test, DIM, Tn)


def test_sten_full_forward_parity(refload):
    import jax.numpy as jnp

    ref, ours, (su, qu, labels, real_sup, real_tgt, text_train, text_test,
                DIM, Tn) = build_sten_pair(refload)

    with torch.no_grad():
        want = ref({
            "context_images": torch.from_numpy(su.reshape(S * Tn, DIM)),
            "context_labels": torch.from_numpy(labels).float(),
            "target_images": torch.from_numpy(qu.reshape(Q * Tn, DIM)),
            "real_support_labels": torch.from_numpy(real_sup).float(),
        })["logits"].numpy()

    got = ours.apply(
        {"params": {}},
        jnp.asarray(su.reshape(S, Tn, 1, 1, DIM)),
        jnp.asarray(qu.reshape(Q, Tn, 1, 1, DIM)),
        jnp.asarray(labels), jnp.asarray(real_sup), jnp.asarray(real_tgt),
        jnp.asarray(text_train),
        jnp.asarray(text_test), train=False)
    np.testing.assert_allclose(np.asarray(got["logits"]), want,
                               atol=1e-4, rtol=1e-3)
