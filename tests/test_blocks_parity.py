"""Parity of shared blocks vs. the reference torch implementations.

Transformer_v1 (the workhorse of every CLIP head) and the BPE tokenizer are
compared against the reference modules, loaded from the read-only checkout as
test fixtures. Skipped when torch / the checkout are unavailable.
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_MYRES = "/root/reference/models/myRes.py"
REF_CLIP = "/root/reference/models/clip_fsar.py"
REF_BPE = "/root/reference/models/bpe_simple_vocab_16e6.txt.gz"


def _install_stubs():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_clip_parity import _install_stubs as base_stubs

    base_stubs()
    if "torchvision.models" not in sys.modules:
        tv = sys.modules["torchvision"]
        models = types.ModuleType("torchvision.models")
        resnet = types.ModuleType("torchvision.models.resnet")
        for name in ("ResNet50_Weights", "ResNet", "_ovewrite_named_param",
                     "Bottleneck", "BasicBlock", "conv1x1"):
            setattr(resnet, name, type(name, (), {}))
        utils = types.ModuleType("torchvision.utils")
        utils._log_api_usage_once = lambda *a, **k: None
        models.resnet = resnet
        tv.models = models
        tv.utils = utils
        sys.modules["torchvision.models"] = models
        sys.modules["torchvision.models.resnet"] = resnet
        sys.modules["torchvision.utils"] = utils


@pytest.fixture(scope="module")
def ref_myres():
    if not os.path.isfile(REF_MYRES):
        pytest.skip("reference checkout not available")
    _install_stubs()
    spec = importlib.util.spec_from_file_location("ref_myres", REF_MYRES)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_transformer_v1_parity(ref_myres):
    import jax.numpy as jnp

    from clipspm_tpu.models.blocks import TransformerV1

    torch.manual_seed(0)
    dim, heads, dh = 32, 2, 16
    ref = ref_myres.Transformer_v1(dim=dim, heads=heads, dim_head_k=dh,
                                   dropout_atte=0.0, mlp_dim=64,
                                   dropout_ffn=0.0).eval()
    attn_mod, ff_mod = ref.layers[0][0], ref.layers[0][1]

    def dense(w):
        return np.asarray(w.detach().numpy()).T

    params = {
        "norm_0": {"scale": attn_mod.norm.weight.detach().numpy(),
                   "bias": attn_mod.norm.bias.detach().numpy()},
        "attn_0": {
            "to_q": {"kernel": dense(attn_mod.fn.to_q.weight)},
            "to_k": {"kernel": dense(attn_mod.fn.to_k.weight)},
            "to_v": {"kernel": dense(attn_mod.fn.to_v.weight)},
            "to_out": {"kernel": dense(attn_mod.fn.to_out[0].weight),
                       "bias": attn_mod.fn.to_out[0].bias.detach().numpy()},
        },
        "ff_0": {
            "fc1": {"kernel": dense(ff_mod.net[0].weight),
                    "bias": ff_mod.net[0].bias.detach().numpy()},
            "fc2": {"kernel": dense(ff_mod.net[3].weight),
                    "bias": ff_mod.net[3].bias.detach().numpy()},
        },
    }

    rng = np.random.default_rng(0)
    q = rng.normal(size=(3, 5, dim)).astype(np.float32)
    k = rng.normal(size=(3, 7, dim)).astype(np.float32)

    with torch.no_grad():
        want = ref(torch.from_numpy(q), torch.from_numpy(k),
                   torch.from_numpy(k)).numpy()

    ours = TransformerV1(dim=dim, heads=heads, dim_head_k=dh, mlp_dim=64,
                         dropout_atte=0.0, dropout_ffn=0.0)
    got = ours.apply({"params": params}, jnp.asarray(q), jnp.asarray(k),
                     jnp.asarray(k), deterministic=True)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


def test_otam_cum_dist_v2_parity(ref_myres):
    import jax.numpy as jnp

    from clipspm_tpu.ops import otam_cum_dist

    rng = np.random.default_rng(1)
    dists = rng.uniform(0, 2, size=(4, 3, 8, 8)).astype(np.float32)
    with torch.no_grad():
        want = ref_myres.OTAM_cum_dist_v2(torch.from_numpy(dists)).numpy()
    got = np.asarray(otam_cum_dist(jnp.asarray(dists), 0.5))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_cos_sim_parity(ref_myres):
    import jax.numpy as jnp

    from clipspm_tpu.models.blocks import cos_sim

    rng = np.random.default_rng(2)
    x = rng.normal(size=(6, 32)).astype(np.float32)
    y = rng.normal(size=(4, 32)).astype(np.float32)
    with torch.no_grad():
        want = ref_myres.cos_sim(torch.from_numpy(x),
                                 torch.from_numpy(y)).numpy()
    got = np.asarray(cos_sim(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


@pytest.fixture(scope="module")
def ref_tokenizer():
    if not (os.path.isfile(REF_CLIP) and os.path.isfile(REF_BPE)):
        pytest.skip("reference tokenizer assets not available")
    _install_stubs()
    spec = importlib.util.spec_from_file_location("ref_clip_tok", REF_CLIP)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bpe_tokenizer_exact_parity(ref_tokenizer):
    """Bit-exact token ids vs. the reference tokenizer with the real vocab
    asset (SURVEY §7 hard part: BPE exactness)."""
    from clipspm_tpu.models.backbones.tokenizer import SimpleTokenizer, tokenize
    from clipspm_tpu.models.text_features import PROMPT_TEMPLATES

    ours = SimpleTokenizer(bpe_path=REF_BPE)
    assert ours.using_openai_vocab
    texts = [t.format(name) for t in PROMPT_TEMPLATES
             for name in ("brush hair", "ride_bike", "pullup", "yo-yo!")]
    texts += ["", "a", "Hello, World!!!", "it's 42 degrees"]
    want = ref_tokenizer.tokenize(texts).numpy()
    got = tokenize(texts, tokenizer=ours)
    np.testing.assert_array_equal(got, want.astype(np.int32))
