"""Full MoLo head parity vs. the reference torch model.

Both sides share a single 32x32/32 conv "backbone" (weights converted), so
the comparison covers every MoLo-specific piece: the quirky positional
encoder, class tokens + Transformer_v2 streams, Conv3d motion reduction +
frame diffs, the align-corners bilinear decoder + recon path, contrastive
s2q/q2s logits, min-pooled frame matching, and the classification layer
(reference: models/model_molo.py:257-523).
"""

import importlib.util
import os
import sys
import types
from collections import OrderedDict

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_DIR = "/root/reference/models"
WAY, SHOT, QUERIES, T, IMG = 2, 2, 2, 4, 224
S, Q = WAY * SHOT, WAY * QUERIES
DIM = 2048  # molo hard-codes mid_dim 2048 for resnet50


class _Cfg:
    def __init__(self, d):
        for k, v in d.items():
            setattr(self, k, _Cfg(v) if isinstance(v, dict) else v)


@pytest.fixture(scope="module")
def ref_molo():
    if not os.path.isdir(REF_DIR):
        pytest.skip("reference checkout not available")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_blocks_parity import _install_stubs

    _install_stubs()
    torch.Tensor.cuda = lambda self, *a, **kw: self
    for name in ("ipdb",):
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.set_trace = lambda *a, **kw: None
            sys.modules[name] = m
    tvm = sys.modules["torchvision.models"]

    def fake_resnet50(*a, **kw):
        torch.manual_seed(42)
        return torch.nn.Sequential(OrderedDict([
            ("conv", torch.nn.Conv2d(3, DIM, 32, 32)),
            ("tail1", torch.nn.Identity()),
            ("tail2", torch.nn.Identity()),
        ]))

    tvm.resnet50 = fake_resnet50
    tvm.ResNet50_Weights = types.SimpleNamespace(DEFAULT=None)
    if "refmodels" not in sys.modules:
        pkg = types.ModuleType("refmodels")
        pkg.__path__ = [REF_DIR]
        sys.modules["refmodels"] = pkg
    key = "refmodels.model_molo"
    if key in sys.modules:
        return sys.modules[key]
    spec = importlib.util.spec_from_file_location(
        key, os.path.join(REF_DIR, "model_molo.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[key] = mod
    spec.loader.exec_module(mod)
    return mod


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


def _bn(b):
    return ({"scale": b.weight.detach().numpy(),
             "bias": b.bias.detach().numpy()},
            {"mean": b.running_mean.detach().numpy(),
             "var": b.running_var.detach().numpy()})


def _transformer_v2(t):
    attn_mod, ff_mod = t.layers[0][0], t.layers[0][1]
    return {
        "norm_0": {"scale": attn_mod.norm.weight.detach().numpy(),
                   "bias": attn_mod.norm.bias.detach().numpy()},
        "attn_0": {
            "to_qkv": {"kernel": attn_mod.fn.to_qkv.weight.detach().numpy().T},
            "to_out": _dense(attn_mod.fn.to_out[0]),
        },
        "ff_0": {"fc1": _dense(ff_mod.net[0]), "fc2": _dense(ff_mod.net[3])},
    }


def build_molo_pair(ref_molo):
    """(torch CNN_BiMHM_MoLo, flax MoLoModel, params, batch_stats, episode
    arrays) — shared by the forward- and gradient-parity tests."""
    import flax.linen as fnn

    from clipspm_tpu.models.heads.molo import MoLoModel

    cfg = _Cfg({
        "MODEL": {"NAME": "molo", "BACKBONE": "resnet50", "SEED": 0,
                  "USE_CLASSIFICATION": True, "USE_CONTRASTIVE": True},
        "TRAIN": {"WAY": WAY, "SHOT": SHOT},
        "DATA": {"SEQ_LEN": T, "NUM_CLASS": 6},
        "DEVICE": {"NUM_GPUS": 1},
    })
    torch.manual_seed(0)
    ref = ref_molo.CNN_BiMHM_MoLo(cfg).eval()

    rng = np.random.default_rng(0)
    su = rng.uniform(size=(S * T, 3, IMG, IMG)).astype(np.float32)
    qu = rng.uniform(size=(Q * T, 3, IMG, IMG)).astype(np.float32)
    labels = np.asarray([0, 1, 0, 1], np.int32)

    # --- weight conversion ------------------------------------------------
    class ConvStub(fnn.Module):
        feature_dim: int = DIM

        @fnn.compact
        def __call__(self, x, *, train: bool = False):
            return fnn.Conv(DIM, (32, 32), strides=32, padding="VALID",
                            name="conv")(x)

    conv_t = ref.backbone[0]
    params = {
        "backbone_override": {"conv": _conv2d(conv_t)},
        "class_token": ref.class_token.detach().numpy(),
        "class_token_motion": ref.class_token_motion.detach().numpy(),
        "temporal_atte_before": _transformer_v2(ref.temporal_atte_before),
        "temporal_atte_before_motion": _transformer_v2(
            ref.temporal_atte_before_motion),
        "motion_reduce": _conv3d(ref.motion_reduce),
        "motion_conv": _conv2d(ref.motion_conv),
        "motion_up": _conv2d(ref.motion_up),
        "classification_layer": _dense(ref.classification_layer),
        "scale": ref.scale.detach().numpy().reshape(()),
        "scale_motion": ref.scale_motion.detach().numpy().reshape(()),
        "outc": _conv2d(ref.outc.conv),
    }
    stats = {}
    for up_name in ("up1", "up2", "up3"):
        up = getattr(ref, up_name)
        p, s = _bn(up.conv.double_conv[1])
        params[up_name] = {"conv": _conv2d(up.conv.double_conv[0]), "bn": p}
        stats[up_name] = {"bn": s}

    ours = MoLoModel(way=WAY, shot=SHOT, seq_len=T, num_class=6,
                     backbone_override=ConvStub())

    su_j = su.reshape(S, T, 3, IMG, IMG).transpose(0, 1, 3, 4, 2)
    qu_j = qu.reshape(Q, T, 3, IMG, IMG).transpose(0, 1, 3, 4, 2)
    return ref, ours, params, stats, (su, qu, su_j, qu_j, labels)


def test_molo_full_forward_parity(ref_molo):
    import jax.numpy as jnp

    ref, ours, params, stats, (su, qu, su_j, qu_j, labels) = \
        build_molo_pair(ref_molo)

    with torch.no_grad():
        want = ref({"context_images": torch.from_numpy(su),
                    "context_labels": torch.from_numpy(labels).float(),
                    "target_images": torch.from_numpy(qu)})
    got = ours.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(su_j), jnp.asarray(qu_j), jnp.asarray(labels),
        train=False)

    for k in ("logits", "class_logits", "logits_s2q", "logits_q2s",
              "logits_s2q_motion", "logits_q2s_motion"):
        np.testing.assert_allclose(
            np.asarray(got[k])[0] if np.asarray(got[k]).ndim == 3 else
            np.asarray(got[k]),
            want[k].numpy()[0] if want[k].dim() == 3 else want[k].numpy(),
            atol=2e-3, rtol=2e-3, err_msg=k)
