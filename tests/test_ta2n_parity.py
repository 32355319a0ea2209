"""Full TA2N forward parity vs. the reference torch model (conv-stub
backbone on both sides): TTM temporal warp, multi-shot insupport fusion,
ACM temporal coordination + offset masks, timewise-cosine prototype logits
(reference: models/ta2n.py + models/model_ta2n.py, repaired signature)."""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_DIR = "/root/reference/models"
WAY, SHOT, QUERIES, T, IMG = 2, 2, 2, 4, 224
S, Q = WAY * SHOT, WAY * QUERIES
DIM = 2048


class _Cfg:
    def __init__(self, d):
        for k, v in d.items():
            setattr(self, k, _Cfg(v) if isinstance(v, dict) else v)


@pytest.fixture(scope="module")
def ref_ta2n():
    if not os.path.isdir(REF_DIR):
        pytest.skip("reference checkout not available")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_blocks_parity import _install_stubs

    _install_stubs()
    torch.Tensor.cuda = lambda self, *a, **kw: self
    for name in ("thop",):
        if name not in sys.modules:
            m = types.ModuleType(name)
            m.profile = lambda *a, **kw: (0, 0)
            sys.modules[name] = m

    class StubResNet(torch.nn.Module):
        def __init__(self):
            super().__init__()
            torch.manual_seed(9)
            self.conv = torch.nn.Conv2d(3, DIM, 32, 32)
            self.avgpool = torch.nn.Identity()
            self.fc = torch.nn.Identity()

        def forward(self, x):
            return torch.flatten(self.conv(x), 1)

    tvm = sys.modules["torchvision.models"]
    tvm.resnet50 = lambda *a, **kw: StubResNet()
    tvm.ResNet50_Weights = types.SimpleNamespace(DEFAULT=None)

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
    if "refmodels" not in sys.modules:
        pkg = types.ModuleType("refmodels")
        pkg.__path__ = [REF_DIR]
        sys.modules["refmodels"] = pkg
    # model_ta2n imports `from models.ta2n import TA2N` and
    # `from models.OTAM import SoftDTW`; alias a fake 'models' package
    if "models" not in sys.modules:
        mpkg = types.ModuleType("models")
        mpkg.__path__ = [REF_DIR]
        sys.modules["models"] = mpkg
    # stub models.OTAM (imports numba, unavailable)
    otam_stub = types.ModuleType("models.OTAM")
    otam_stub.SoftDTW = lambda *a, **kw: None
    sys.modules["models.OTAM"] = otam_stub

    def load_sub(pkg, name):
        key = f"{pkg}.{name}"
        if key in sys.modules:
            return sys.modules[key]
        spec = importlib.util.spec_from_file_location(
            key, os.path.join(REF_DIR, f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[key] = mod
        spec.loader.exec_module(mod)
        return mod

    load_sub("models", "ta2n")
    return load_sub("models", "model_ta2n")


def _dense(lin):
    p = {"kernel": lin.weight.detach().numpy().T}
    if lin.bias is not None:
        p["bias"] = lin.bias.detach().numpy()
    return p


def _conv1d_as_dense(c):
    # Conv1d kernel_size=1: weight [out, in, 1] -> dense [in, out]
    p = {"kernel": c.weight.detach().numpy()[:, :, 0].T}
    if c.bias is not None:
        p["bias"] = c.bias.detach().numpy()
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


def build_ta2n_pair(ref_ta2n):
    """(torch CNN, flax TA2NModel, params, batch_stats, episode arrays) —
    shared by the forward- and gradient-parity tests."""
    import flax.linen as fnn

    from clipspm_tpu.models.heads.ta2n import TA2NModel

    cfg = _Cfg({
        "MODEL": {"NAME": "ta2n", "BACKBONE": "resnet50", "SEED": 0,
                  "METRIC": "cos", "TIMEWISE": True, "DIST_NORM": False,
                  "DROPOUT": 0.0},
        "TRAIN": {"WAY": WAY, "SHOT": SHOT},
        "DATA": {"SEQ_LEN": T},
        "DEVICE": {"NUM_GPUS": 1},
    })
    torch.manual_seed(0)
    ref = ref_ta2n.CNN(cfg).eval()

    rng = np.random.default_rng(0)
    su = rng.uniform(size=(S * T, 3, IMG, IMG)).astype(np.float32)
    # class-major support order: the reference's multi-shot path assumes it
    # (SURVEY repair note); feed labels in class-major order so both agree
    labels = np.asarray([0, 0, 1, 1], np.int32)
    qu = rng.uniform(size=(Q * T, 3, IMG, IMG)).astype(np.float32)

    class ConvStub(fnn.Module):
        feature_dim: int = DIM

        @fnn.compact
        def __call__(self, x, *, train: bool = False):
            return fnn.Conv(DIM, (32, 32), strides=32, padding="VALID",
                            name="conv")(x)

    ttm = ref.align.firststage
    acm = ref.align.secondstage
    loc = ttm.locnet
    mv = acm.mvnet
    params = {
        "backbone_override": {"conv": _conv2d(ref.resnet.conv)},
        "ttm": {"loc_conv1": _conv3d(loc[0]), "loc_conv2": _conv3d(loc[4]),
                "loc_fc1": _dense(loc[10]), "loc_fc2": _dense(loc[12])},
        "acm": {"keynet": _conv1d_as_dense(acm.keynet),
                "querynet": _conv1d_as_dense(acm.querynet),
                "valuenet": _conv1d_as_dense(acm.valuenet),
                "mv_conv1": _conv3d(mv[0]), "mv_conv2": _conv3d(mv[4]),
                "mv_fc1": _conv1d_as_dense(mv[10]),
                "mv_fc2": _conv1d_as_dense(mv[12])},
        "keynet_multi": _conv1d_as_dense(ref.align.keynet_multi),
        "querynet_multi": _conv1d_as_dense(ref.align.querynet_multi),
        "valuenet_multi": _conv1d_as_dense(ref.align.valuenet_multi),
    }
    stats = {"ttm": {}, "acm": {}}
    for dst, src, name in (("ttm", loc[1], "loc_bn1"),
                           ("ttm", loc[5], "loc_bn2"),
                           ("acm", mv[1], "mv_bn1"),
                           ("acm", mv[5], "mv_bn2")):
        p, s = _bn(src)
        params[dst][name] = p
        stats[dst][name] = s

    ours = TA2NModel(way=WAY, shot=SHOT, seq_len=T, dropout=0.0,
                     backbone_override=ConvStub())
    su_j = su.reshape(S, T, 3, IMG, IMG).transpose(0, 1, 3, 4, 2)
    qu_j = qu.reshape(Q, T, 3, IMG, IMG).transpose(0, 1, 3, 4, 2)
    return ref, ours, params, stats, (su, qu, su_j, qu_j, labels)


def test_ta2n_full_forward_parity(ref_ta2n):
    import jax.numpy as jnp

    ref, ours, params, stats, (su, qu, su_j, qu_j, labels) = \
        build_ta2n_pair(ref_ta2n)

    with torch.no_grad():
        want = ref(torch.from_numpy(su), torch.from_numpy(labels).float(),
                   torch.from_numpy(qu))["logits"].numpy()

    got = ours.apply({"params": params, "batch_stats": stats},
                     jnp.asarray(su_j), jnp.asarray(qu_j),
                     jnp.asarray(labels), train=False)
    np.testing.assert_allclose(np.asarray(got["logits"]), want,
                               atol=2e-3, rtol=2e-3)
