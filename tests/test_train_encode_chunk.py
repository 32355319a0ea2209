"""train_encode_chunk: chunked training encode is numerically identical.

The ViT tower has no BatchNorm batch statistics and no dropout, so scanning
the frame batch in chunks during *training* changes nothing semantically
while cutting backward peak HBM ~N/chunk-fold (the unchunked 280-frame
ViT-B/16 backward OOMs a shared v5e — see visual.encode_chunked).
"""

import jax
import jax.numpy as jnp
import numpy as np

from clipspm_tpu.models.backbones.clip import CLIP_ARCHS
from clipspm_tpu.models.fsar import CLIPSPMModel
from clipspm_tpu.utils.config import SPM_DEFAULT_PARAMS


import pytest


@pytest.mark.parametrize("train_chunk,policy", [(True, "full"), (4, "full"),
                                                (4, "dots"), (4, "attn"),
                                                (4, "attn_out"), (4, "mlp")])
def test_train_chunked_forward_and_grads_match(train_chunk, policy):
    # True reuses the eval width (3); 4 is a distinct train width (the
    # production default uses 40-frame train chunks vs 30 for eval).
    # policy="dots" keeps projection/MLP dot outputs across chunks — a
    # recompute-FLOPs saving that must be gradient-invisible.
    arch = CLIP_ARCHS["test-tiny"]
    kw = dict(arch=arch, way=2, shot=1, spm=SPM_DEFAULT_PARAMS["hmdb"])
    m0 = CLIPSPMModel(**kw)
    m1 = CLIPSPMModel(**kw, encode_chunk=3, train_encode_chunk=train_chunk,
                      train_remat_policy=policy)
    S, Q, T, img, D = 2, 2, 4, 32, arch.embed_dim
    rng = np.random.default_rng(0)
    args = (jnp.asarray(rng.uniform(size=(S, T, img, img, 3)), jnp.float32),
            jnp.asarray(rng.uniform(size=(Q, T, img, img, 3)), jnp.float32),
            jnp.arange(S, dtype=jnp.int32) % 2,
            jnp.zeros((S,), jnp.int32), jnp.zeros((Q,), jnp.int32),
            jnp.asarray(rng.normal(size=(8, D)), jnp.float32),
            jnp.asarray(rng.normal(size=(8, D)), jnp.float32))
    v = m0.init(jax.random.PRNGKey(0), *args)

    def loss(m, p):
        out = m.apply({"params": p}, *args, train=True,
                      rngs={"dropout": jax.random.PRNGKey(3)})
        return out["logits"].sum() + out["dists"]

    l0, g0 = jax.value_and_grad(lambda p: loss(m0, p))(v["params"])
    l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(v["params"])
    np.testing.assert_allclose(float(l0), float(l1), rtol=2e-5, atol=2e-5)
    for (p0, a), (p1, b) in zip(
            jax.tree_util.tree_leaves_with_path(g0),
            jax.tree_util.tree_leaves_with_path(g1)):
        assert p0 == p1
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5,
                                   err_msg=jax.tree_util.keystr(p0))
