"""Pallas TPU kernel for the OTAM wavefront DP.

The reference runs this recurrence as Python loops over an 8x10 table per
(query, support) pair (reference: models/myRes.py:821-855) — hundreds of
serial kernel launches per episode on GPU. ops/otam.py already turns it into
a 17-step ``lax.scan``; this module goes one step further: one Pallas kernel
computes the whole DP for a 128-pair batch tile entirely in VMEM.

Layout: the diagonal-coordinate trick — the DP state lives in two rolling
diagonal buffers ``prev``/``prev2`` of shape [L, 128] (rows x batch-lane),
exactly one fp32 VMEM tile. For diagonal ``k``, the cell in row ``l`` sits at
column ``m = k - l``; its dependencies are ``prev[l]`` (C[l, m-1]),
``prev[l-1]`` (C[l-1, m]) and ``prev2[l-1]`` (C[l-1, m-1]), so one step is a
sublane roll + three vectorized soft-mins over the whole tile. Distance
tables are pre-gathered into diagonal-major form [K, L, B] on the XLA side
(a single fused gather).

Gradients: ``otam_cum_dist_pallas`` carries a custom VJP whose backward pass
replays the jnp wavefront (ops/otam.py) under ``jax.vjp`` — forward-heavy
eval paths get the fused kernel, training stays exactly as differentiable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .otam import _otam_wavefront, _pad_cols

_BIG = 1e30
_LANES = 128


def _softmin_pair(a, b, lbda):
    m = jnp.minimum(a, b)
    ea = jnp.exp(-jnp.minimum((a - m) / lbda, 80.0))
    eb = jnp.exp(-jnp.minimum((b - m) / lbda, 80.0))
    return m - lbda * jnp.log(ea + eb)


def _softmin3(a, b, c, lbda):
    m = jnp.minimum(jnp.minimum(a, b), c)
    ea = jnp.exp(-jnp.minimum((a - m) / lbda, 80.0))
    eb = jnp.exp(-jnp.minimum((b - m) / lbda, 80.0))
    ec = jnp.exp(-jnp.minimum((c - m) / lbda, 80.0))
    return m - lbda * jnp.log(ea + eb + ec)


def _otam_kernel(ddiag_ref, out_ref, prev_ref, prev2_ref, *,
                 L: int, M: int, lbda: float):
    """ddiag_ref: [K, L, 128] diagonal-major distances; out_ref: [1, L, 128];
    prev_ref/prev2_ref: [L, 128] VMEM scratch holding the two rolling
    diagonals (scratch refs rather than fori_loop carries — Mosaic's
    carry-layout inference rejects the splat-initialised carry)."""
    K = L + M - 1
    l_idx = jax.lax.broadcasted_iota(jnp.int32, (L, _LANES), 0)

    prev_ref[:, :] = jnp.where(l_idx == 0, 0.0, _BIG).astype(jnp.float32)
    prev2_ref[:, :] = jnp.full((L, _LANES), _BIG, jnp.float32)

    def step(k, _):
        prev = prev_ref[:, :]
        prev2 = prev2_ref[:, :]
        d = ddiag_ref[k]                                  # [L, 128]
        up = pltpu.roll(prev, 1, axis=0)                  # C[l-1, m]
        upleft = pltpu.roll(prev2, 1, axis=0)             # C[l-1, m-1]
        row0_big = (l_idx == 0)
        up = jnp.where(row0_big, _BIG, up)
        upleft = jnp.where(row0_big, _BIG, upleft)
        left = prev                                       # C[l, m-1]

        m_idx = k - l_idx
        zeros = jnp.zeros_like(d)
        top = d + left                                        # row 0: cumsum
        first = d + _softmin3(zeros, up, zeros, lbda)         # m == 1
        mid = d + _softmin_pair(upleft, left, lbda)           # 2 <= m <= M-2
        last = d + _softmin3(upleft, up, left, lbda)          # m == M-1

        cur = jnp.where(m_idx == 1, first, mid)
        cur = jnp.where(m_idx == M - 1, last, cur)
        cur = jnp.where(l_idx == 0, top, cur)
        valid = (m_idx >= 1) & (m_idx <= M - 1)
        cur = jnp.where(valid, cur, _BIG).astype(jnp.float32)
        prev2_ref[:, :] = prev
        prev_ref[:, :] = cur
        return 0

    jax.lax.fori_loop(1, K, step, 0)
    # the caller reads row L-1, which holds C[L-1, M-1]
    out_ref[0, :, :] = prev_ref[:, :]


def _to_diagonal_major(D: jnp.ndarray) -> jnp.ndarray:
    """[B, L, M] -> [K, L, B] with Ddiag[k, l] = D[:, l, k-l] (0 outside)."""
    B, L, M = D.shape
    K = L + M - 1
    ks = np.arange(K)[:, None]
    ls = np.arange(L)[None, :]
    ms = ks - ls
    valid = (ms >= 0) & (ms < M)
    ms_c = np.clip(ms, 0, M - 1)
    gathered = D[:, ls, ms_c]                 # [B, K, L]
    gathered = jnp.where(jnp.asarray(valid)[None], gathered, 0.0)
    return gathered.transpose(1, 2, 0)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _otam_pallas_fwd(D: jnp.ndarray, lbda: float, interpret: bool):
    """D: [B, L, M] padded tables -> [B] cum dists."""
    B, L, M = D.shape
    nb = -(-B // _LANES)
    Bp = nb * _LANES
    Dp = jnp.pad(D.astype(jnp.float32), ((0, Bp - B), (0, 0), (0, 0)))
    ddiag = _to_diagonal_major(Dp)            # [K, L, Bp]
    K = L + M - 1

    out = pl.pallas_call(
        functools.partial(_otam_kernel, L=L, M=M, lbda=lbda),
        grid=(nb,),
        in_specs=[pl.BlockSpec((K, L, _LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, L, _LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, L, _LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((L, _LANES), jnp.float32),
                        pltpu.VMEM((L, _LANES), jnp.float32)],
        interpret=interpret,
    )(ddiag)
    return out[:, L - 1, :].reshape(Bp)[:B]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _otam_pallas(D, lbda, interpret):
    return _otam_pallas_fwd(D, lbda, interpret)


def _fwd(D, lbda, interpret):
    return _otam_pallas_fwd(D, lbda, interpret), D


def _bwd(lbda, interpret, D, g):
    # backward replays the XLA wavefront (ops/otam.py) under vjp
    _, vjp = jax.vjp(lambda d: _otam_wavefront(d, lbda), D)
    return (vjp(g)[0],)


_otam_pallas.defvjp(_fwd, _bwd)


def otam_cum_dist_pallas(dists: jnp.ndarray, lbda: float = 0.5,
                         interpret: bool = False) -> jnp.ndarray:
    """Drop-in Pallas variant of ops.otam.otam_cum_dist.

    Args:
        dists: ``[..., L, Ms]`` unpadded frame-distance tables.
        interpret: run the kernel in interpreter mode (CPU tests).
    """
    D = _pad_cols(jnp.asarray(dists))
    batch_shape = D.shape[:-2]
    L, M = D.shape[-2], D.shape[-1]
    out = _otam_pallas(D.reshape((-1, L, M)), float(lbda), bool(interpret))
    return out.reshape(batch_shape)
