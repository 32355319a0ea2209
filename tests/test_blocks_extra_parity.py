"""Parity of the dormant/experimental reference blocks (myRes.py dead code:
Attention_v3, mo_1/mo_2/mo_2_2, t_group, GroupGLKA) vs. the reference torch
implementations. These are unused by every shipped head but are part of the
component inventory (SURVEY §2.4)."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from test_blocks_parity import ref_myres  # noqa: F401  (fixture)


def _dense(w):
    return np.asarray(w.detach().numpy()).T


def _conv1d(w):  # torch [o, i, k] -> flax [k, i, o]
    return np.transpose(w.detach().numpy(), (2, 1, 0))


def _conv2d(w):  # torch [o, i, kh, kw] -> flax [kh, kw, i, o]
    return np.transpose(w.detach().numpy(), (2, 3, 1, 0))


def _trans_params(ref):
    """Transformer_v1 torch module -> flax param tree (any depth)."""
    out = {}
    for i, (attn_mod, ff_mod) in enumerate(ref.layers):
        out[f"norm_{i}"] = {"scale": attn_mod.norm.weight.detach().numpy(),
                            "bias": attn_mod.norm.bias.detach().numpy()}
        out[f"attn_{i}"] = {
            "to_q": {"kernel": _dense(attn_mod.fn.to_q.weight)},
            "to_k": {"kernel": _dense(attn_mod.fn.to_k.weight)},
            "to_v": {"kernel": _dense(attn_mod.fn.to_v.weight)},
            "to_out": {"kernel": _dense(attn_mod.fn.to_out[0].weight),
                       "bias": attn_mod.fn.to_out[0].bias.detach().numpy()},
        }
        out[f"ff_{i}"] = {
            "fc1": {"kernel": _dense(ff_mod.net[0].weight),
                    "bias": ff_mod.net[0].bias.detach().numpy()},
            "fc2": {"kernel": _dense(ff_mod.net[3].weight),
                    "bias": ff_mod.net[3].bias.detach().numpy()},
        }
    return out


def test_attention_v3_parity(ref_myres):
    import jax.numpy as jnp

    from clipspm_tpu.models.blocks_extra import AttentionV3

    torch.manual_seed(0)
    dim, heads, dh = 32, 2, 16
    ref = ref_myres.Attention_v3(dim, heads=heads, dim_head=dh,
                                 dropout=0.0).eval()
    params = {
        "to_q": {"kernel": _dense(ref.to_q.weight)},
        "to_k": {"kernel": _dense(ref.to_k.weight)},
        "to_v": {"kernel": _dense(ref.to_v.weight)},
        "to_out": {"kernel": _dense(ref.to_out[0].weight),
                   "bias": ref.to_out[0].bias.detach().numpy()},
    }
    rng = np.random.default_rng(0)
    q = rng.normal(size=(3, 5, dim)).astype(np.float32)
    k = rng.normal(size=(3, 7, dim)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(q), torch.from_numpy(k),
                   torch.from_numpy(k)).numpy()
    got = AttentionV3(dim, heads=heads, dim_head=dh, dropout=0.0).apply(
        {"params": params}, jnp.asarray(q), jnp.asarray(k), jnp.asarray(k))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("name", ["mo_1", "mo_2"])
def test_mo_parity(ref_myres, name):
    import jax.numpy as jnp

    from clipspm_tpu.models.blocks_extra import Mo1, Mo2

    torch.manual_seed(1)
    ref = getattr(ref_myres, name)().eval()
    trans_names = (["trans"] if name == "mo_1" else ["trans_1", "trans_2"])
    params = {"mo": ref.mo.detach().numpy()}
    for t in trans_names:
        params[t] = _trans_params(getattr(ref, t))

    way, shot, nq, T, D = 2, 1, 2, 8, 2048
    rng = np.random.default_rng(2)
    qu = rng.normal(size=(nq * T, D)).astype(np.float32)
    su = rng.normal(size=(way * shot * T, D)).astype(np.float32)
    su_l = np.arange(way * shot, dtype=np.int64) % way
    with torch.no_grad():
        want = ref(torch.from_numpy(qu), torch.from_numpy(su),
                   torch.from_numpy(su_l)).numpy()
    cls = Mo1 if name == "mo_1" else Mo2
    got = cls(dim=D, way=way, seq_len=T).apply(
        {"params": params}, jnp.asarray(qu), jnp.asarray(su),
        jnp.asarray(su_l, jnp.int32), deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=1e-4)


def test_mo_2_2_parity(ref_myres):
    import jax.numpy as jnp

    from clipspm_tpu.models.blocks_extra import Mo22

    torch.manual_seed(3)
    ref = ref_myres.mo_2_2().eval()
    params = {"mo": ref.mo.detach().numpy(),
              "trans_1": _trans_params(ref.trans_1),
              "trans_2": _trans_params(ref.trans_2)}
    T, D = 8, 2048
    rng = np.random.default_rng(4)
    qu = rng.normal(size=(2 * T, D)).astype(np.float32)
    su = rng.normal(size=(2 * T, D)).astype(np.float32)
    with torch.no_grad():
        want_q, want_s = ref(torch.from_numpy(qu), torch.from_numpy(su))
    got_q, got_s = Mo22(dim=D, seq_len=T).apply(
        {"params": params}, jnp.asarray(qu), jnp.asarray(su),
        deterministic=True)
    np.testing.assert_allclose(np.asarray(got_q), want_q.numpy(),
                               atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_s), want_s.numpy(),
                               atol=3e-5, rtol=1e-4)


def test_t_group_parity(ref_myres):
    import jax.numpy as jnp

    from clipspm_tpu.models.blocks_extra import TGroup

    torch.manual_seed(5)
    ref = ref_myres.t_group().eval()
    params = {
        "pe": {},  # sinusoidal table is non-learned; B scale is a param
        "trans": _trans_params(ref.trans),
        "conv2_1": {"kernel": _conv1d(ref.conv2_1.weight)},
        "conv2_2": {"kernel": _conv1d(ref.conv2_2.weight)},
        "conv2_3": {"kernel": _conv1d(ref.conv2_3.weight)},
    }
    way, T, D = 2, 8, 2048
    rng = np.random.default_rng(6)
    qu = rng.normal(size=(2 * T, D)).astype(np.float32)
    su = rng.normal(size=(way * T, D)).astype(np.float32)
    su_l = np.arange(way, dtype=np.int64)
    with torch.no_grad():
        want = ref(torch.from_numpy(qu), torch.from_numpy(su),
                   torch.from_numpy(su_l)).numpy()

    mod = TGroup(dim=D, way=way, seq_len=T)
    init = mod.init(jax.random.PRNGKey(0), jnp.asarray(qu), jnp.asarray(su),
                    jnp.asarray(su_l, jnp.int32), deterministic=True)
    merged = dict(init["params"])
    for k, v in params.items():
        if v:
            merged[k] = v
    got = mod.apply({"params": merged}, jnp.asarray(qu), jnp.asarray(su),
                    jnp.asarray(su_l, jnp.int32), deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-5, rtol=1e-4)


def test_group_glka_parity(ref_myres):
    import jax.numpy as jnp

    from clipspm_tpu.models.blocks_extra import GroupGLKA

    torch.manual_seed(7)
    C = 48
    ref = ref_myres.GroupGLKA(C).eval()
    with torch.no_grad():
        ref.scale.add_(0.5)  # zero scale would hide the whole branch

    def seq_conv(seq):
        return [{"kernel": _conv2d(m.weight),
                 "bias": m.bias.detach().numpy()} for m in seq]

    params = {
        "norm": {"scale": ref.norm.weight.detach().numpy(),
                 "bias": ref.norm.bias.detach().numpy()},
        "scale": ref.scale.detach().numpy().reshape(1, 1, 1, C),
        "proj_first": {"kernel": _conv2d(ref.proj_first[0].weight),
                       "bias": ref.proj_first[0].bias.detach().numpy()},
        "proj_last": {"kernel": _conv2d(ref.proj_last[0].weight),
                      "bias": ref.proj_last[0].bias.detach().numpy()},
    }
    for tag, lka, xconv in (("3", ref.LKA3, ref.X3), ("5", ref.LKA5, ref.X5),
                            ("7", ref.LKA7, ref.X7)):
        c0, c1, c2 = seq_conv(lka)
        params[f"lka{tag}_0"], params[f"lka{tag}_1"] = c0, c1
        params[f"lka{tag}_2"] = c2
        params[f"x{tag}"] = {"kernel": _conv2d(xconv.weight),
                             "bias": xconv.bias.detach().numpy()}

    rng = np.random.default_rng(8)
    x = rng.normal(size=(2, C, 10, 10)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()
    got = GroupGLKA(C).apply({"params": params},
                             jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("mode", ["stage", "bottleneck"])
def test_temporal_resnet_variants(mode):
    """resnet50_1/resnet50_2 equivalents (temporal-excitation Blk spliced
    into the trunk) run and keep the spatial output contract."""
    import jax
    import jax.numpy as jnp

    from clipspm_tpu.models.backbones.resnet import TorchResNet

    T, IMG = 2, 32
    net = TorchResNet(arch="resnet50", width=8, temporal_blocks=mode,
                      seq_len=T)
    x = jnp.ones((2 * T, IMG, IMG, 3), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x, train=False)
    y = net.apply(variables, x, train=False)
    assert y.shape == (2 * T, IMG // 32, IMG // 32, net.feature_dim)
    assert np.isfinite(np.asarray(y)).all()
    # the temporal blocks actually exist in the param tree
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    names = {"/".join(str(k) for k in path) for path, _ in flat}
    assert any("blk" in n for n in names)


import jax  # noqa: E402  (used in t_group test)
