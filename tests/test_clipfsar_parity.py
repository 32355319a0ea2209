"""Full CLIP-FSAR head parity vs. the reference (identity backbone).

Covers the joint support⊕text transformer path, class prototypes,
bidirectional OTAM, and the video->text classification logits
(reference: models/model_clipfsar.py eval default branch :337-394, which is
identical math to the train branch :181-237). The shipped reference file
cannot run (imports commented out — SURVEY §2.8 defect 2); the fixture
repairs the imports by injecting them into the module namespace.
"""

import importlib.util
import os
import sys
import types

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
def ref_clipfsar():
    if not os.path.isdir(REF_DIR):
        pytest.skip("reference checkout not available")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_resnet_heads_parity import refpkg  # reuse stub machinery
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

    clip_fsar.load = lambda *a, **kw: (DummyCLIP(), None)
    clip_fsar.tokenize = lambda texts, *a, **kw: torch.ones(
        1 if isinstance(texts, str) else len(texts), 7,
        dtype=torch.long) * (abs(hash(str(texts))) % 50 + 1)

    myres = load_sub("myRes")
    mod = load_sub("model_clipfsar")
    # repair the commented-out imports (SURVEY §2.8 defect 2)
    mod.load = clip_fsar.load
    mod.tokenize = clip_fsar.tokenize
    mod.cos_sim = myres.cos_sim
    mod.OTAM_cum_dist_v2 = myres.OTAM_cum_dist_v2
    mod.extract_class_indices = myres.extract_class_indices
    mod.Transformer_v1 = myres.Transformer_v1
    return mod


def _episode(dim):
    rng = np.random.default_rng(0)
    return (rng.normal(size=(S, T, dim)).astype(np.float32),
            rng.normal(size=(Q, T, dim)).astype(np.float32),
            np.asarray([0, 1, 0, 1], np.int32),
            np.asarray([0, 2, 0, 2], np.int32),
            np.asarray([2, 0, 2, 0], np.int32))


def _convert_clipfsar(ref):
    def dense(lin):
        p = {"kernel": lin.weight.detach().numpy().T}
        if lin.bias is not None:
            p["bias"] = lin.bias.detach().numpy()
        return p

    t = ref.context2
    attn_mod, ff_mod = t.layers[0][0], t.layers[0][1]
    return {
        "scale": ref.scale.detach().numpy().reshape(()),
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
    }


def test_clipfsar_eval_text_branch_parity(ref_clipfsar):
    """EVAL_TEXT branch (reference: models/model_clipfsar.py:240-257).

    As committed the branch crashes at the return statement
    (``class_text_logits`` is None, :257,394 — latent defect), so the
    expected value is assembled from the branch's own formula with the
    reference's text features and scale.
    """
    import jax.numpy as jnp

    from clipspm_tpu.models.backbones.clip import CLIP_ARCHS
    from clipspm_tpu.models.fsar import IdentityBackbone
    from clipspm_tpu.models.heads.clipfsar import CLIPFSARModel

    cfg = _Cfg({
        "MODEL": {"BACKBONE": "RN50", "NAME": "clipfsar",
                  "USE_CLASSIFICATION": True},
        "TRAIN": {"CLASS_NAME": ["a", "b", "c"], "WAY": WAY, "SHOT": SHOT},
        "TEST": {"CLASS_NAME": ["d", "e", "f"]},
        "DATA": {"SEQ_LEN": T},
        "DEVICE": {"NUM_GPUS": 1},
    })
    torch.manual_seed(0)
    ref = ref_clipfsar.CNN_OTAM_CLIPFSAR(cfg)
    ref.backbone = torch.nn.Identity()
    ref = ref.eval()

    su, qu, labels, real_sup, real_tgt = _episode(DIM)
    with torch.no_grad():
        # reference :243-254 with classification_layer = identity
        text_feats = ref.text_features_test[torch.from_numpy(real_sup).long()]
        uniq = torch.unique(torch.from_numpy(labels).float())
        tf = torch.stack([
            torch.mean(torch.index_select(
                text_feats, 0, ref_clipfsar.extract_class_indices(
                    torch.from_numpy(labels).float(), c)), dim=0)
            for c in uniq])
        img = torch.from_numpy(qu).mean(1)
        img = img / img.norm(dim=1, keepdim=True)
        tf = tf / tf.norm(dim=1, keepdim=True)
        probs = torch.softmax(ref.scale * img @ tf.t(), dim=1)
        want = probs.unsqueeze(0).numpy()   # logits = -cum = +probs

    ours = CLIPFSARModel(arch=CLIP_ARCHS["RN50"], way=WAY, shot=SHOT,
                         eval_text=True,
                         backbone_override=IdentityBackbone())
    got = ours.apply(
        {"params": _convert_clipfsar(ref)},
        jnp.asarray(su.reshape(S, T, 1, 1, DIM)),
        jnp.asarray(qu.reshape(Q, T, 1, 1, DIM)),
        jnp.asarray(labels), jnp.asarray(real_sup), jnp.asarray(real_tgt),
        jnp.asarray(ref.text_features_train.detach().numpy()),
        jnp.asarray(ref.text_features_test.detach().numpy()), train=False)
    np.testing.assert_allclose(np.asarray(got["logits"]), want,
                               atol=5e-5, rtol=1e-3)


def test_clipfsar_full_forward_parity(ref_clipfsar):
    import jax.numpy as jnp

    from clipspm_tpu.models.backbones.clip import CLIP_ARCHS
    from clipspm_tpu.models.fsar import IdentityBackbone
    from clipspm_tpu.models.heads.clipfsar import CLIPFSARModel

    cfg = _Cfg({
        "MODEL": {"BACKBONE": "RN50", "NAME": "clipfsar",
                  "USE_CLASSIFICATION": True},
        "TRAIN": {"CLASS_NAME": ["a", "b", "c"], "WAY": WAY, "SHOT": SHOT},
        "TEST": {"CLASS_NAME": ["d", "e", "f"]},
        "DATA": {"SEQ_LEN": T},
        "DEVICE": {"NUM_GPUS": 1},
    })
    torch.manual_seed(0)
    ref = ref_clipfsar.CNN_OTAM_CLIPFSAR(cfg)
    ref.backbone = torch.nn.Identity()
    ref = ref.eval()

    rng = np.random.default_rng(0)
    su = rng.normal(size=(S, T, DIM)).astype(np.float32)
    qu = rng.normal(size=(Q, T, DIM)).astype(np.float32)
    labels = np.asarray([0, 1, 0, 1], np.int32)
    real_sup = np.asarray([0, 2, 0, 2], np.int32)
    real_tgt = np.asarray([2, 0, 2, 0], np.int32)

    with torch.no_grad():
        want = ref({
            "context_images": torch.from_numpy(su.reshape(S * T, DIM)),
            "context_labels": torch.from_numpy(labels).float(),
            "target_images": torch.from_numpy(qu.reshape(Q * T, DIM)),
            "real_support_labels": torch.from_numpy(real_sup).float(),
        })

    # convert weights
    def dense(lin):
        p = {"kernel": lin.weight.detach().numpy().T}
        if lin.bias is not None:
            p["bias"] = lin.bias.detach().numpy()
        return p

    t = ref.context2
    attn_mod, ff_mod = t.layers[0][0], t.layers[0][1]
    params = {
        "scale": ref.scale.detach().numpy().reshape(()),
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
    }

    text_train = ref.text_features_train.detach().numpy()
    text_test = ref.text_features_test.detach().numpy()

    ours = CLIPFSARModel(arch=CLIP_ARCHS["RN50"], way=WAY, shot=SHOT,
                         backbone_override=IdentityBackbone())
    got = ours.apply(
        {"params": params},
        jnp.asarray(su.reshape(S, T, 1, 1, DIM)),
        jnp.asarray(qu.reshape(Q, T, 1, 1, DIM)),
        jnp.asarray(labels), jnp.asarray(real_sup), jnp.asarray(real_tgt),
        jnp.asarray(text_train), jnp.asarray(text_test), train=False)

    np.testing.assert_allclose(np.asarray(got["logits"]),
                               want["logits"].numpy(), atol=5e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got["class_logits"]),
                               want["class_logits"].numpy(),
                               atol=5e-4, rtol=1e-3)
