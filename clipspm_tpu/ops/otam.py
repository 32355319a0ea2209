"""OTAM temporal-alignment dynamic program, TPU-native.

The OTAM "ordered temporal alignment" score is a banded soft-DTW-style DP over
the per-frame distance table of a (query, support) video pair. The reference
implements it with in-place Python loops over the 8x10 table
(reference: models/myRes.py:785-855, OTAM_cum_dist lambda=0.1 and
OTAM_cum_dist_v2 lambda=0.5) — a serial, launch-bound recurrence on GPU. Here
the same recurrence is restructured as an **anti-diagonal wavefront**: every
cell on diagonal ``k = l + m`` depends only on diagonals ``k-1`` and ``k-2``,
so one ``lax.scan`` step updates a whole diagonal across all (query, support)
pairs at once. All shapes are static, so the scan compiles to a single fused
XLA loop; a Pallas kernel (ops/pallas/otam_pallas.py) covers large batches.

Recurrence (after zero-padding one column on each side, reference:
models/myRes.py:827):

    C[0, m] = D[0, m] + C[0, m-1]                      (top row: plain cumsum)
    C[l, 0] = 0                                         (left pad column)
    C[l, 1] = D[l, 1] + smin(C[l-1,0], C[l-1,1], C[l,0])
    C[l, m] = D[l, m] + smin(C[l-1,m-1], C[l,m-1])      (2 <= m <= M-2)
    C[l, M-1] = D[l, M-1] + smin(C[l-1,M-2], C[l-1,M-1], C[l,M-2])

with ``smin(xs) = -lbda * log(sum(exp(-x / lbda)))``. We evaluate smin in a
max-shifted (numerically stable) form, which is mathematically identical.
The result is ``C[L-1, M-1]``.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp

from .softmin import softmin_pair, softmin3

_NEG_INF = -1e30


def _pad_cols(dists: jnp.ndarray) -> jnp.ndarray:
    """Zero-pad one column on each side of the last axis
    (reference: models/myRes.py:791,827)."""
    pad = [(0, 0)] * (dists.ndim - 1) + [(1, 1)]
    return jnp.pad(dists, pad)


def otam_cum_dist(dists: jnp.ndarray, lbda: float = 0.5) -> jnp.ndarray:
    """Batched OTAM cumulative distance.

    Args:
        dists: ``[..., L, Ms]`` frame-distance tables (``1 - cos`` typically).
            Leading dims are arbitrary batch dims (e.g. ``[Q, S]``).
        lbda: soft-min temperature; 0.5 matches the reference's
            ``OTAM_cum_dist_v2`` (all CLIP heads), 0.1 matches
            ``OTAM_cum_dist`` (reference: models/myRes.py:785,821).

    Returns:
        ``[...]`` cumulative alignment distances (``C[L-1, M-1]``).
    """
    D = _pad_cols(jnp.asarray(dists))
    batch_shape = D.shape[:-2]
    L, M = D.shape[-2], D.shape[-1]
    Df = D.reshape((-1, L, M)).astype(jnp.float32)
    out = _otam_wavefront(Df, lbda)
    return out.reshape(batch_shape)


@functools.partial(jax.jit, static_argnums=(1,))
def _otam_wavefront(D: jnp.ndarray, lbda: float) -> jnp.ndarray:
    """Wavefront scan over anti-diagonals. ``D``: [B, L, M] padded tables."""
    B, L, M = D.shape

    # row 0 is a plain cumulative sum of the padded distances
    row0 = jnp.cumsum(D[:, 0, :], axis=-1)

    ls = jax.lax.broadcasted_iota(jnp.int32, (L, M), 0)
    ms = jax.lax.broadcasted_iota(jnp.int32, (L, M), 1)

    init = jnp.zeros((B, L, M), dtype=D.dtype).at[:, 0, :].set(row0)

    def step(C, k):
        # previous-cell views shifted into place; out-of-range cells don't
        # matter because the mask excludes them.
        up = jnp.roll(C, 1, axis=1)        # C[l-1, m]
        left = jnp.roll(C, 1, axis=2)      # C[l, m-1]
        upleft = jnp.roll(up, 1, axis=2)   # C[l-1, m-1]

        mid = D + softmin_pair(upleft, left, lbda)           # 2 <= m <= M-2
        first = D + softmin3(up, jnp.zeros_like(up),         # C[l-1,1],C[l-1,0]=0,
                             jnp.zeros_like(up), lbda)       # C[l,0]=0  (m == 1)
        last = D + softmin3(upleft, up, left, lbda)          # m == M-1

        cand = jnp.where(ms == 1, first, mid)
        cand = jnp.where(ms == M - 1, last, cand)

        write = (ls + ms == k) & (ls >= 1) & (ms >= 1)
        C = jnp.where(write, cand, C)
        return C, None

    # diagonals containing writable cells (l>=1, m>=1): k in [2, L+M-2]
    ks = jnp.arange(2, L + M - 1)
    C, _ = jax.lax.scan(step, init, ks)
    return C[:, -1, -1]


def otam_cum_dist_unrolled(dists: jnp.ndarray, lbda: float = 0.5) -> jnp.ndarray:
    """Row-by-row unrolled oracle of the same recurrence (test reference).

    Mirrors the reference loop structure exactly (models/myRes.py:832-853) but
    out-of-place over jnp rows; used to validate the wavefront formulation.
    """
    D = _pad_cols(jnp.asarray(dists)).astype(jnp.float32)
    L, M = D.shape[-2], D.shape[-1]
    rows = [None] * L
    zeros = jnp.zeros_like(D[..., 0, 0])
    # top row: cumsum (column 0 stays 0 because D[...,0,0] is the zero pad)
    rows[0] = jnp.cumsum(D[..., 0, :], axis=-1)
    for l in range(1, L):
        prev = rows[l - 1]
        cells = [zeros]  # column 0 never written -> stays 0
        c1 = D[..., l, 1] + softmin3(prev[..., 0], prev[..., 1], zeros, lbda)
        cells.append(c1)
        for m in range(2, M - 1):
            cells.append(D[..., l, m]
                         + softmin_pair(prev[..., m - 1], cells[m - 1], lbda))
        cells.append(D[..., l, M - 1]
                     + softmin3(prev[..., M - 2], prev[..., M - 1],
                                cells[M - 2], lbda))
        rows[l] = jnp.stack(cells, axis=-1)
    return rows[-1][..., -1]


def frame_distance_cos(query: jnp.ndarray, support: jnp.ndarray,
                       epsilon: float = 0.01) -> jnp.ndarray:
    """``1 - cos`` frame-distance tables between query and support videos.

    Args:
        query: ``[Q, L, D]`` per-frame features.
        support: ``[S, L, D]`` per-frame features.
    Returns:
        ``[Q, S, L, L]`` distance tables. Uses the reference's epsilon-in-
        denominator cosine (reference: models/myRes.py:756-765) so values
        match bit-for-bit in fp32.
    """
    Q, Lq, Dd = query.shape
    S, Ls, _ = support.shape
    qf = query.reshape(Q * Lq, Dd)
    sf = support.reshape(S * Ls, Dd)
    num = qf @ sf.T
    qn = jnp.linalg.norm(qf, axis=-1, keepdims=True)
    sn = jnp.linalg.norm(sf, axis=-1, keepdims=True)
    sim = num / (qn @ sn.T + epsilon)
    dist = 1.0 - sim
    return dist.reshape(Q, Lq, S, Ls).transpose(0, 2, 1, 3)


def otam_distance(support: jnp.ndarray, query: jnp.ndarray,
                  lbda: float = 0.5, bidirectional: bool = True,
                  epsilon: float = 0.01, backend: str = "scan") -> jnp.ndarray:
    """End-to-end OTAM matching distance used by every CLIP head.

    (reference: models/model_clipspm.py:348-362 ``otam_distance``)

    Args:
        support: ``[S, L, D]`` support videos or class prototypes.
        query: ``[Q, L, D]`` query videos.
    Returns:
        ``[Q, S]`` cumulative distances; bidirectional sums the DP over the
        table and its transpose (reference: models/model_clipspm.py:361).
    """
    if backend == "pallas":
        from .otam_pallas import otam_cum_dist_pallas as dp
    else:
        dp = otam_cum_dist
    tables = frame_distance_cos(query, support, epsilon)
    cum = dp(tables, lbda)
    if bidirectional:
        cum = cum + dp(jnp.swapaxes(tables, -2, -1), lbda)
    return cum
