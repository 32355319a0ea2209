"""Pallas TPU kernel for the SoftDTW wavefront DP.

Same diagonal-coordinate machinery as ops/otam_pallas.py, applied to the
standard soft-DTW recurrence (reference kernel: models/OTAM.py:34-93 — one
CUDA block per batch element, syncthreads between anti-diagonals):

    R[i, j] = D[i-1, j-1] + softmin_gamma(R[i-1,j-1], R[i-1,j], R[i,j-1])

The DP state lives in two rolling diagonal buffers [rows, 128] in VMEM (rows
= N+1 padded to the sublane tile); one step is a sublane roll + one
vectorized 3-way soft-min across a 128-pair lane tile. Sakoe-Chiba pruning
masks cells to the BIG sentinel. Backward replays the XLA wavefront
(ops/softdtw.py) under ``jax.vjp``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .softdtw import _softdtw_wavefront

_BIG = 1e30
_LANES = 128


def _softmin3(a, b, c, gamma):
    m = jnp.minimum(jnp.minimum(a, b), c)
    ea = jnp.exp(-jnp.minimum((a - m) / gamma, 80.0))
    eb = jnp.exp(-jnp.minimum((b - m) / gamma, 80.0))
    ec = jnp.exp(-jnp.minimum((c - m) / gamma, 80.0))
    return m - gamma * jnp.log(ea + eb + ec)


def _sdtw_kernel(ddiag_ref, out_ref, prev_ref, prev2_ref, *,
                 N: int, M: int, rows: int, gamma: float, bandwidth: float):
    """ddiag_ref: [K, rows, 128]; out_ref: [1, rows, 128]; result in row N."""
    K = N + M + 1
    i_idx = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0)

    prev_ref[:, :] = jnp.where(i_idx == 0, 0.0, _BIG).astype(jnp.float32)
    prev2_ref[:, :] = jnp.full((rows, _LANES), _BIG, jnp.float32)

    def step(k, _):
        prev = prev_ref[:, :]
        prev2 = prev2_ref[:, :]
        d = ddiag_ref[k]
        up = pltpu.roll(prev, 1, axis=0)        # R[i-1, j]
        upleft = pltpu.roll(prev2, 1, axis=0)   # R[i-1, j-1]
        row0 = (i_idx == 0)
        up = jnp.where(row0, _BIG, up)
        upleft = jnp.where(row0, _BIG, upleft)
        left = prev                              # R[i, j-1]

        cur = d + _softmin3(upleft, up, left, gamma)
        j_idx = k - i_idx
        valid = (i_idx >= 1) & (i_idx <= N) & (j_idx >= 1) & (j_idx <= M)
        if bandwidth > 0:
            valid &= jnp.abs(i_idx - j_idx) <= bandwidth
        cur = jnp.where(valid, cur, _BIG).astype(jnp.float32)
        prev2_ref[:, :] = prev
        prev_ref[:, :] = cur
        return 0

    jax.lax.fori_loop(1, K, step, 0)
    out_ref[0, :, :] = prev_ref[:, :]


def _to_diagonal_major(D: jnp.ndarray, rows: int) -> jnp.ndarray:
    """[B, N, M] -> [K, rows, B] with Ddiag[k, i] = D[:, i-1, k-i-1]."""
    B, N, M = D.shape
    K = N + M + 1
    ks = np.arange(K)[:, None]
    iis = np.arange(rows)[None, :]
    jjs = ks - iis
    valid = (iis >= 1) & (iis <= N) & (jjs >= 1) & (jjs <= M)
    i_c = np.clip(iis - 1, 0, N - 1)
    j_c = np.clip(jjs - 1, 0, M - 1)
    gathered = D[:, i_c, j_c]                 # [B, K, rows]
    gathered = jnp.where(jnp.asarray(valid)[None], gathered, 0.0)
    return gathered.transpose(1, 2, 0)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _sdtw_pallas_fwd(D: jnp.ndarray, gamma: float, bandwidth: float,
                     interpret: bool):
    B, N, M = D.shape
    rows = -(-(N + 1) // 8) * 8
    nb = -(-B // _LANES)
    Bp = nb * _LANES
    Dp = jnp.pad(D.astype(jnp.float32), ((0, Bp - B), (0, 0), (0, 0)))
    ddiag = _to_diagonal_major(Dp, rows)
    K = N + M + 1

    out = pl.pallas_call(
        functools.partial(_sdtw_kernel, N=N, M=M, rows=rows, gamma=gamma,
                          bandwidth=bandwidth),
        grid=(nb,),
        in_specs=[pl.BlockSpec((K, rows, _LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, rows, _LANES), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, rows, _LANES), jnp.float32),
        scratch_shapes=[pltpu.VMEM((rows, _LANES), jnp.float32),
                        pltpu.VMEM((rows, _LANES), jnp.float32)],
        interpret=interpret,
    )(ddiag)
    return out[:, N, :].reshape(Bp)[:B]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _sdtw_pallas(D, gamma, bandwidth, interpret):
    return _sdtw_pallas_fwd(D, gamma, bandwidth, interpret)


def _fwd(D, gamma, bandwidth, interpret):
    return _sdtw_pallas_fwd(D, gamma, bandwidth, interpret), D


def _bwd(gamma, bandwidth, interpret, D, g):
    _, vjp = jax.vjp(lambda d: _softdtw_wavefront(d, gamma, bandwidth), D)
    return (vjp(g)[0],)


_sdtw_pallas.defvjp(_fwd, _bwd)


def softdtw_from_dists_pallas(D: jnp.ndarray, gamma: float = 1.0,
                              bandwidth: float = 0.0,
                              interpret: bool = False) -> jnp.ndarray:
    """Drop-in Pallas variant of ops.softdtw.softdtw_from_dists."""
    D = jnp.asarray(D)
    batch_shape = D.shape[:-2]
    N, M = D.shape[-2], D.shape[-1]
    out = _sdtw_pallas(D.reshape((-1, N, M)), float(gamma),
                       float(bandwidth), bool(interpret))
    return out.reshape(batch_shape)
