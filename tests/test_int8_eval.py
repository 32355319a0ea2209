"""INT8_EVAL: dynamic-int8 eval matmuls (ops/quant.py).

The int8 path must (a) keep the exact nn.Dense parameter tree so imported
CLIP checkpoints drive it unchanged, (b) agree closely with the float
forward at eval (dynamic per-row/per-channel symmetric quantization),
and (c) leave the TRAINING path bit-identical to the float model
(quantized rounding has zero gradient, so train always uses floats).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from clipspm_tpu.models.backbones.clip import CLIP_ARCHS
from clipspm_tpu.models.fsar import CLIPSPMModel
from clipspm_tpu.ops.quant import int8_matmul
from clipspm_tpu.utils.config import SPM_DEFAULT_PARAMS


def test_int8_matmul_close_to_float():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 96)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(96, 32)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(32,)), jnp.float32)
    ref = np.asarray(x @ w + b)
    got = np.asarray(int8_matmul(x, w, b))
    # dynamic symmetric int8: error scales with the output magnitude, so
    # bound it against the output distribution (relative error is
    # meaningless where ref ~ 0)
    err = np.abs(got - ref)
    scale = float(np.abs(ref).std())
    assert float(np.median(err)) < 0.02 * scale
    assert float(err.max()) < 0.2 * scale


def _model(int8):
    arch = dataclasses.replace(CLIP_ARCHS["test-tiny"], int8_eval=int8)
    return CLIPSPMModel(arch=arch, way=2, shot=1,
                        spm=SPM_DEFAULT_PARAMS["hmdb"])


def test_int8_eval_agrees_and_train_is_identical():
    rng = np.random.default_rng(1)
    T, img, D = 4, 32, CLIP_ARCHS["test-tiny"].embed_dim
    args = (jnp.asarray(rng.uniform(size=(2, T, img, img, 3)), jnp.float32),
            jnp.asarray(rng.uniform(size=(2, T, img, img, 3)), jnp.float32),
            jnp.arange(2, dtype=jnp.int32),
            jnp.zeros((2,), jnp.int32), jnp.zeros((2,), jnp.int32),
            jnp.asarray(rng.normal(size=(8, D)), jnp.float32),
            jnp.asarray(rng.normal(size=(8, D)), jnp.float32))
    m_f, m_q = _model(False), _model(True)
    v = m_f.init(jax.random.PRNGKey(0), *args)
    # (a) identical param tree: the float init drives the int8 model
    v_q = jax.eval_shape(lambda: m_q.init(jax.random.PRNGKey(0), *args))
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v_q))

    # (b) eval forward agrees (same argmax, close logits)
    lf = np.asarray(m_f.apply(v, *args, train=False)["logits"], np.float32)
    lq = np.asarray(m_q.apply(v, *args, train=False)["logits"], np.float32)
    assert lf.argmax(-1).tolist() == lq.argmax(-1).tolist()
    np.testing.assert_allclose(lq, lf, rtol=0.2, atol=0.05)

    # (c) training forward is bit-identical (int8 gated on train=False)
    of = m_f.apply(v, *args, train=True,
                   rngs={"dropout": jax.random.PRNGKey(2)})
    oq = m_q.apply(v, *args, train=True,
                   rngs={"dropout": jax.random.PRNGKey(2)})
    np.testing.assert_array_equal(np.asarray(of["logits"]),
                                  np.asarray(oq["logits"]))
