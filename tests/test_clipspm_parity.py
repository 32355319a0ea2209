"""End-to-end CLIP-SPM head parity vs. the reference torch model.

Loads the reference ``models`` package as a test fixture with the CLIP
loader/tokenizer stubbed out (no download) and the backbone replaced by
identity, feeds identical random *features* through both heads with
converted weights, and compares logits and the aux distance. This covers
HSMR (mo), SPM (sem/cpt_sem), PADM (taskM), se_te gating, token_trans, and
the OTAM matching — the whole head math (reference: models/model_clipspm.py).
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_DIR = "/root/reference/models"


@pytest.fixture(scope="module")
def ref_clipspm():
    if not os.path.isdir(REF_DIR):
        pytest.skip("reference checkout not available")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_blocks_parity import _install_stubs

    _install_stubs()
    # CPU-only: neutralize .cuda() (the reference hard-codes it)
    torch.Tensor.cuda = lambda self, *a, **kw: self

    # assemble a package so the reference's relative imports resolve
    pkg = types.ModuleType("refmodels")
    pkg.__path__ = [REF_DIR]
    sys.modules["refmodels"] = pkg

    def load_sub(name):
        spec = importlib.util.spec_from_file_location(
            f"refmodels.{name}", os.path.join(REF_DIR, f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refmodels.{name}"] = mod
        spec.loader.exec_module(mod)
        return mod

    clip_fsar = load_sub("clip_fsar")

    dim = 1024  # RN50 mid_dim: the ctor sizes every module for this width

    class DummyCLIP:
        visual = torch.nn.Identity()

        @staticmethod
        def encode_text(tokens):
            # deterministic pseudo-random text features per call
            g = torch.Generator().manual_seed(int(tokens.sum().item()) % 9973)
            return torch.randn(tokens.shape[0], dim, generator=g)

    clip_fsar.load = lambda *a, **kw: (DummyCLIP(), None)
    clip_fsar.tokenize = lambda texts, *a, **kw: torch.ones(
        1 if isinstance(texts, str) else len(texts), 7,
        dtype=torch.long) * (abs(hash(texts if isinstance(texts, str)
                                      else tuple(texts))) % 50 + 1)
    mod = load_sub("model_clipspm")
    return mod, dim


class _Cfg:
    def __init__(self, d):
        for k, v in d.items():
            setattr(self, k, _Cfg(v) if isinstance(v, dict) else v)


WAY, SHOT, QUERIES, T = 2, 2, 2, 4
S, Q = WAY * SHOT, WAY * QUERIES


def _torch_head(ref_mod, dim):
    params = {"mid_dim_vision": 0.5, "mid_dim_text": 1.5,
              "negative_slope": 0.0025, "alpha": 0.2, "consist_1": 0.54,
              "text_dis": 0.07, "motion_alpha": 1}
    cfg = _Cfg({
        "MODEL": {"BACKBONE": "RN50", "NAME": "clipspm"},
        "TRAIN": {"CLASS_NAME": ["a", "b", "c"], "WAY": WAY, "SHOT": SHOT},
        "TEST": {"CLASS_NAME": ["d", "e", "f"]},
        "DATA": {"SEQ_LEN": T},
        "DEVICE": {"NUM_GPUS": 1},
    })
    cfg.params = params
    torch.manual_seed(0)
    model = ref_mod.CNN(cfg)
    return model, params


def _convert(model):
    """reference CNN modules -> our CLIPSPM head param tree."""
    def dense(lin):
        p = {"kernel": lin.weight.detach().numpy().T}
        if lin.bias is not None:
            p["bias"] = lin.bias.detach().numpy()
        return p

    def conv1d(c):
        return {"kernel": c.weight.detach().numpy().transpose(2, 1, 0),
                "bias": c.bias.detach().numpy()}

    def transformer_v1(t):
        attn_mod, ff_mod = t.layers[0][0], t.layers[0][1]
        return {
            "norm_0": {"scale": attn_mod.norm.weight.detach().numpy(),
                       "bias": attn_mod.norm.bias.detach().numpy()},
            "attn_0": {
                "to_q": {"kernel": attn_mod.fn.to_q.weight.detach().numpy().T},
                "to_k": {"kernel": attn_mod.fn.to_k.weight.detach().numpy().T},
                "to_v": {"kernel": attn_mod.fn.to_v.weight.detach().numpy().T},
                "to_out": dense(attn_mod.fn.to_out[0]),
            },
            "ff_0": {"fc1": dense(ff_mod.net[0]), "fc2": dense(ff_mod.net[3])},
        }

    return {
        "motion_conv1": conv1d(model.motion_conv1),
        "motion_conv2": conv1d(model.motion_conv2),
        "token_tr": {"fc1": dense(model.token_tr.mlp.net[0]),
                     "fc2": dense(model.token_tr.mlp.net[3])},
        "context1": transformer_v1(model.context1),
        "context2": transformer_v1(model.context2),
        "mo_alpha1": model.mo_alpha1.detach().numpy().reshape(()),
        "scale": model.scale.detach().numpy().reshape(()),
        "gate_text_fc1": dense(model.gate_text[0]),
        "gate_text_fc2": dense(model.gate_text[2]),
        "gate_vision_fc1": dense(model.gate_vision[0]),
        "gate_vision_fc2": dense(model.gate_vision[2]),
    }


def test_clipspm_head_full_forward_parity(ref_clipspm):
    import jax.numpy as jnp

    from clipspm_tpu.models.heads.clipspm import CLIPSPM

    ref_mod, dim = ref_clipspm
    model, params = _torch_head(ref_mod, dim)
    model.backbone = torch.nn.Identity()
    model = model.eval()

    rng = np.random.default_rng(0)
    su = rng.normal(size=(S, T, dim)).astype(np.float32)
    qu = rng.normal(size=(Q, T, dim)).astype(np.float32)
    sup_labels = np.asarray([0, 1, 0, 1], np.int32)
    real_sup = np.asarray([0, 2, 0, 2], np.int32)
    real_tgt = np.asarray([2, 0, 2, 0], np.int32)

    with torch.no_grad():
        ref_out = model({
            "context_images": torch.from_numpy(su.reshape(S * T, dim)),
            "context_labels": torch.from_numpy(sup_labels).float(),
            "target_images": torch.from_numpy(qu.reshape(Q * T, dim)),
            "real_support_labels": torch.from_numpy(real_sup).float(),
            "real_target_labels": torch.from_numpy(real_tgt).float(),
        })

    text_test = model.text_features_test.detach().numpy()

    head = CLIPSPM(dim=dim, way=WAY, shot=SHOT, spm=params)
    hp = _convert(model)
    got = head.apply(
        {"params": hp}, jnp.asarray(su), jnp.asarray(qu),
        jnp.asarray(sup_labels),
        jnp.asarray(text_test[real_sup][:, None, :]),
        jnp.asarray(text_test[real_tgt][:, None, :]),
        train=False)

    np.testing.assert_allclose(np.asarray(got["logits"]),
                               ref_out["logits"].numpy(),
                               atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got["dists"]),
                               ref_out["dists"].numpy(),
                               atol=5e-4, rtol=1e-3)
