"""Megatron-style tensor-parallel parameter sharding over the ``tp`` axis.

The reference has no tensor parallelism (SURVEY §2.6: host-side
DataParallel only); this is the TPU-native extension for scaling the
backbone beyond one chip. Shardings follow the standard Megatron layout for
pre-norm transformers:

- column-parallel: MLP up-projection (``c_fc``) and the fused qkv
  (``in_proj``) shard their *output* features (and biases) over ``tp`` —
  each chip computes a slice of the hidden activations;
- row-parallel: MLP down-projection (``c_proj``) and attention ``out_proj``
  shard their *input* features, so the partial products are combined by a
  single ``psum`` that XLA's SPMD partitioner inserts automatically.

Everything else (LayerNorms, embeddings, heads) is replicated. Annotations
are placement only — GSPMD keeps the math identical and inserts the
collectives, so enabling tp never changes results beyond fp reduction order.

The RN50 conv tower stays **replicated** by design: the whole tower is
~38 M params (~76 MB bf16), so replication costs little HBM, while sharding
conv output channels would split every BatchNorm's per-channel statistics
across chips (cross-replica stat sync on the hot path) and the 224² spatial
convs leave no matmul dimension that amortizes the extra collectives at
these sizes. The scaling axis for FSAR is episodes (dp), not tower width.
The RN50 *attention pool* (`c_proj`, a Dense) does shard — it is the only
matmul-shaped RN50 layer — and the ViT/text transformers shard fully.
``tests/test_parallel_and_checkpoint.py::test_tensor_parallel_rn50_tower``
asserts both facts and tp-vs-sequential parity on the RN50 arch.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.tree_util as jtu
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import TENSOR_AXIS


def _spec_for(path, leaf) -> P:
    names = [getattr(k, "key", str(k)) for k in path]
    if len(names) < 2 or leaf.ndim == 0:
        return P()
    mod, name = names[-2], names[-1]
    if mod in ("c_fc", "in_proj"):                       # column-parallel
        if name == "kernel":
            return P(None, TENSOR_AXIS)
        if name == "bias":
            return P(TENSOR_AXIS)
    if mod in ("c_proj", "out_proj") and name == "kernel":
        return P(TENSOR_AXIS, None)                      # row-parallel
    return P()


def megatron_specs(params: Any, n_tp: int) -> Any:
    """PartitionSpec tree for a parameter tree; dims not divisible by
    ``n_tp`` stay replicated."""

    def spec(path, leaf):
        s = _spec_for(path, leaf)
        for dim, axis in enumerate(s):
            if axis is not None and leaf.shape[dim] % n_tp != 0:
                return P()
        return s

    return jtu.tree_map_with_path(spec, params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """Place a parameter tree with megatron shardings over ``mesh``'s tp
    axis (replicated over dp)."""
    n_tp = mesh.shape[TENSOR_AXIS]
    specs = megatron_specs(params, n_tp)
    return jax.device_put(
        params, jtu.tree_map(lambda s: NamedSharding(mesh, s), specs,
                             is_leaf=lambda x: isinstance(x, P)))


def shard_train_state(state: Any, mesh: Mesh) -> Any:
    """Shard ``TrainState.params`` and any params-shaped optimizer moments
    (Adam mu/nu) with the same megatron layout; everything else replicated."""
    params = shard_params(state.params, mesh)
    pdef = jtu.tree_structure(state.params)

    def is_param_tree(x):
        if isinstance(x, jax.Array):
            return False
        try:
            return jtu.tree_structure(x) == pdef
        except Exception:
            return False

    def fix(x):
        return shard_params(x, mesh) if is_param_tree(x) else x

    opt_state = jtu.tree_map(fix, state.opt_state, is_leaf=is_param_tree)
    return state.replace(params=params, opt_state=opt_state)
