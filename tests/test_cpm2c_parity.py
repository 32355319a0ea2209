"""Full CPM2C head parity vs. the reference torch model (dummy CLIP,
identity backbone): multiscale motion fusion, gated prototype modulation
(text_eh_temporal_transformer), consistency distances, global distances,
OTAM local alignment, and classification logits
(reference: models/model_cpm2c.py)."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_DIR = "/root/reference/models"
WAY, SHOT, QUERIES, T = 2, 2, 2, 4
S, Q = WAY * SHOT, WAY * QUERIES
DIM = 1024


class _Cfg:
    def __init__(self, d):
        for k, v in d.items():
            setattr(self, k, _Cfg(v) if isinstance(v, dict) else v)


@pytest.fixture(scope="module")
def ref_cpm2c():
    if not os.path.isdir(REF_DIR):
        pytest.skip("reference checkout not available")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_more_heads_parity import refload as _rl  # fixture fn
    from test_blocks_parity import _install_stubs
    import importlib.util
    import types

    _install_stubs()
    torch.Tensor.cuda = lambda self, *a, **kw: self
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

    clip_fsar = load_sub("clip_fsar")

    class DummyCLIP:
        visual = torch.nn.Identity()

        @staticmethod
        def encode_text(tokens):
            g = torch.Generator().manual_seed(int(tokens.sum().item()) % 997)
            return torch.randn(tokens.shape[0], DIM, generator=g)

        @staticmethod
        def state_dict():
            return {"positional_embedding": torch.zeros(77, 512),
                    "ln_final.weight": torch.zeros(512)}

    clip_fsar.load = lambda *a, **kw: (DummyCLIP(), None)
    clip_fsar.tokenize = lambda texts, *a, **kw: torch.ones(
        1 if isinstance(texts, str) else len(texts), 7,
        dtype=torch.long) * (abs(hash(str(texts))) % 50 + 1)
    sys.modules.pop("refmodels.model_cpm2c", None)
    return load_sub("model_cpm2c")


def build_cpm2c_pair(ref_cpm2c):
    """(torch CLIP_CPMMC_FSAR, flax CPM2CModel, converted params, episode
    arrays) — shared by the forward- and gradient-parity tests."""
    from clipspm_tpu.models.backbones.clip import CLIP_ARCHS
    from clipspm_tpu.models.fsar import IdentityBackbone
    from clipspm_tpu.models.heads.cpm2c import CPM2CModel

    params = {"mid_dim_vision": 0.5, "mid_dim_text": 1.5,
              "negative_slope": 0.01, "alpha": 0.2,
              "motion_residual_ratio": 0.5, "prompt_patch": 16,
              "hid_dim": 32, "prompt_patch_2": 3, "prompt_patch_22": 3,
              "hid_dim_2": 8}
    cfg = _Cfg({
        "MODEL": {"BACKBONE": "RN50", "NAME": "cpm2c",
                  "USE_CLASSIFICATION": True, "MOTION_COFF": 0.4,
                  "NORMAL_COFF": 0.6},
        "TRAIN": {"CLASS_NAME": ["a", "b", "c"], "WAY": WAY, "SHOT": SHOT},
        "TEST": {"CLASS_NAME": ["d", "e", "f"]},
        "DATA": {"SEQ_LEN": T},
        "DEVICE": {"NUM_GPUS": 1},
    })
    cfg.params = params
    torch.manual_seed(0)
    ref = ref_cpm2c.CLIP_CPMMC_FSAR(cfg)
    ref.backbone = torch.nn.Identity()
    ref = ref.eval()

    rng = np.random.default_rng(0)
    su = rng.normal(size=(S, T, DIM)).astype(np.float32)
    qu = rng.normal(size=(Q, T, DIM)).astype(np.float32)
    labels = np.asarray([0, 1, 0, 1], np.int32)
    real_sup = np.asarray([0, 2, 0, 2], np.int32)
    real_tgt = np.asarray([2, 0, 2, 0], np.int32)

    def dense(lin):
        p = {"kernel": lin.weight.detach().numpy().T}
        if lin.bias is not None:
            p["bias"] = lin.bias.detach().numpy()
        return p

    def conv1d(c):
        return {"kernel": c.weight.detach().numpy().transpose(2, 1, 0),
                "bias": c.bias.detach().numpy()}

    t = ref.context2
    attn_mod, ff_mod = t.layers[0][0], t.layers[0][1]
    hp = {
        "scale": ref.scale.detach().numpy().reshape(()),
        "class_token": ref.class_token.detach().numpy(),
        "class_token_motion": ref.class_token_motion.detach().numpy(),
        "context2": {
            "norm_0": {"scale": attn_mod.norm.weight.detach().numpy(),
                       "bias": attn_mod.norm.bias.detach().numpy()},
            "attn_0": {
                "to_q": {"kernel": attn_mod.fn.to_q.weight.detach().numpy().T},
                "to_k": {"kernel": attn_mod.fn.to_k.weight.detach().numpy().T},
                "to_v": {"kernel": attn_mod.fn.to_v.weight.detach().numpy().T},
                "to_out": dense(attn_mod.fn.to_out[0]),
            },
            "ff_0": {"fc1": dense(ff_mod.net[0]), "fc2": dense(ff_mod.net[3])},
        },
        "gate_text_fc1": dense(ref.gate_text[0]),
        "gate_text_fc2": dense(ref.gate_text[2]),
        "gate_vision_fc1": dense(ref.gate_vision[0]),
        "gate_vision_fc2": dense(ref.gate_vision[2]),
        "motion_conv1_1": conv1d(ref.motion_conv1_1),
        "motion_conv1_3": conv1d(ref.motion_conv1_3),
        "motion_conv1_5": conv1d(ref.motion_conv1_5),
        "scale_conv": conv1d(ref.scale_conv),
        "meta_fc1": dense(ref.meta_net[0]),
        "meta_fc2": dense(ref.meta_net[2]),
        "meta_conv1": {"kernel": ref.meta_net_2[0].weight.detach().numpy()
                       .transpose(2, 3, 1, 0),
                       "bias": ref.meta_net_2[0].bias.detach().numpy()},
        "meta_conv2": {"kernel": ref.meta_net_2[2].weight.detach().numpy()
                       .transpose(2, 3, 1, 0),
                       "bias": ref.meta_net_2[2].bias.detach().numpy()},
    }

    ours = CPM2CModel(arch=CLIP_ARCHS["RN50"], way=WAY, shot=SHOT,
                      params=params, motion_coeff=0.4, normal_coeff=0.6,
                      backbone_override=IdentityBackbone())
    return ref, ours, hp, (su, qu, labels, real_sup, real_tgt,
                           ref.text_features_train.detach().numpy(),
                           ref.text_features_test.detach().numpy(), DIM)


def test_cpm2c_full_forward_parity(ref_cpm2c):
    import jax.numpy as jnp

    ref, ours, hp, (su, qu, labels, real_sup, real_tgt,
                    text_train, text_test, DIM) = build_cpm2c_pair(ref_cpm2c)

    with torch.no_grad():
        want = ref({
            "context_images": torch.from_numpy(su.reshape(S * T, DIM)),
            "context_labels": torch.from_numpy(labels).float(),
            "target_images": torch.from_numpy(qu.reshape(Q * T, DIM)),
            "real_support_labels": torch.from_numpy(real_sup).float(),
            "real_target_labels": torch.from_numpy(real_tgt).float(),
        })

    got = ours.apply(
        {"params": hp},
        jnp.asarray(su.reshape(S, T, 1, 1, DIM)),
        jnp.asarray(qu.reshape(Q, T, 1, 1, DIM)),
        jnp.asarray(labels), jnp.asarray(real_sup), jnp.asarray(real_tgt),
        jnp.asarray(text_train),
        jnp.asarray(text_test),
        train=False)

    np.testing.assert_allclose(np.asarray(got["logits_local"]),
                               want["logits_local"].numpy(),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got["logits_global"]),
                               want["logits_global"].numpy(),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got["class_logits"]),
                               want["class_logits"].numpy(),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got["target_consist_distance"]),
                               want["target_consist_distance"].numpy(),
                               atol=1e-2, rtol=1e-3)
