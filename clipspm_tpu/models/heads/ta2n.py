"""TA2N head: two-stage temporal-spatial alignment + prototype matching.

(reference: models/ta2n.py + models/model_ta2n.py)
- **TTM** (:53-152): a 3-D conv localisation net predicts an affine temporal
  warp ``t' = a t + b`` applied by 1-D grid sampling along the frame axis
  (align_corners=True, zero padding) — here an explicit linear-interpolation
  gather.
- **ACM** (:154-258): temporal coordination cross-attention on time-pooled
  features, then a motion net predicts per-frame (x, y) offsets; soft box
  masks built from the offsets (+/- with a 9-point perturbation grid,
  delta=0.2, scaled 0.75) spatially pool support and query.
- **insupport_align** (:285-302): multi-shot prototype fusion against the
  first shot as reference.
- **ProtypicalNet** (model_ta2n.py:77-103): logits are negative timewise
  cosine distances, optional LayerNorm; the SoftDTW metric option
  (model_ta2n.py:86-87) maps to ops/softdtw.

Repairs vs. the reference (documented):
- the runner-incompatible forward signature (SURVEY §2.8 defect 3) is
  replaced by the uniform episode signature;
- for shot>1 the reference's ``reshape(n, k, ...)`` assumes class-major
  support order, which the episodic shuffle violates; support is grouped by
  class explicitly here.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..backbones.resnet import TorchResNet
from ..blocks import group_by_class
from ..visual import encode_chunked

Dtype = Any

# 9-point offset perturbation (reference: models/ta2n.py:183-186)
_PERTURB = np.asarray([[0, 0], [0, 1], [1, 0], [0, -1], [-1, 0],
                       [1, 1], [-1, -1], [1, -1], [-1, 1]],
                      dtype=np.float32) * 0.2


def temporal_grid_sample(feats: jnp.ndarray, coords: jnp.ndarray
                         ) -> jnp.ndarray:
    """1-D grid sample along the frame axis, torch semantics
    (align_corners=True, zero padding; reference: models/ta2n.py:88-93).

    feats: [N, T, ...]; coords: [N, T] in [-1, 1] -> same shape as feats.
    """
    T = feats.shape[1]
    pos = (coords + 1.0) * 0.5 * (T - 1)
    lo = jnp.floor(pos)
    hi = lo + 1.0
    w = pos - lo
    lo_i = jnp.clip(lo.astype(jnp.int32), 0, T - 1)
    hi_i = jnp.clip(hi.astype(jnp.int32), 0, T - 1)
    valid_lo = (lo >= 0) & (lo <= T - 1)
    valid_hi = (hi >= 0) & (hi <= T - 1)

    def gather(f, idx):
        return jnp.take_along_axis(
            f, idx.reshape(idx.shape + (1,) * (f.ndim - 2)), axis=1)

    extra = (1,) * (feats.ndim - 2)
    flo = gather(feats, lo_i) * valid_lo.reshape(valid_lo.shape + extra)
    fhi = gather(feats, hi_i) * valid_hi.reshape(valid_hi.shape + extra)
    wexp = w.reshape(w.shape + extra)
    return flo * (1 - wexp) + fhi * wexp


def gen_mask(offsets: jnp.ndarray, resolution: int) -> jnp.ndarray:
    """Soft box masks from (x, y) offsets (reference: models/ta2n.py:18-38).
    offsets: [..., 2] -> [..., L, L]."""
    L = resolution
    shape = offsets.shape[:-1]
    if L == 1:
        # degenerate 1x1 maps (tiny test shapes): the box covers the pixel
        return jnp.ones(shape + (1, 1), offsets.dtype)
    off = offsets.reshape(-1, 1, 2)
    grid = (jnp.arange(L, dtype=off.dtype) / (L - 1)) * 2 - 1
    grid = jnp.broadcast_to(grid.reshape(1, L, 1), (off.shape[0], L, 2))
    grid = grid + off
    full = ((grid > -1) & (grid < 1)).astype(off.dtype)
    margin = nn.relu((1 - full) * (1 - (jnp.abs(grid) - 1) * ((L - 1) / 2)))
    mask_xy = full + margin
    mask_x, mask_y = mask_xy[..., 0], mask_xy[..., 1]
    mask = mask_y[..., :, None] * mask_x[..., None, :]
    return mask.reshape(shape + (L, L))


def _safe_pool(x, window):
    """max_pool whose window is clamped to the actual dim sizes (identical to
    the reference pooling on production 8x7x7 shapes; keeps tiny test shapes
    legal where torch MaxPool3d would reject them)."""
    win = tuple(min(w, s) for w, s in zip(window, x.shape[1:1 + len(window)]))
    return nn.max_pool(x, win, strides=win)


class TTM(nn.Module):
    """Temporal transform module (reference: models/ta2n.py:53-98)."""
    seq_len: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, *, train: bool = False):
        """feats: [N, T, H, W, C] -> warped same shape."""
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=jnp.float32, name=name)
        x = nn.Conv(64, (3, 3, 3), padding=1, dtype=self.dtype,
                    name="loc_conv1")(feats)
        x = nn.relu(_safe_pool(bn("loc_bn1")(x), (2, 2, 2)))
        x = nn.Conv(128, (3, 3, 3), padding=1, dtype=self.dtype,
                    name="loc_conv2")(x)
        x = nn.relu(_safe_pool(bn("loc_bn2")(x), (2, 2, 2)))
        x = jnp.max(x, axis=(1, 2, 3))                     # adaptive max (1,1,1)
        x = nn.relu(nn.Dense(32, dtype=self.dtype, name="loc_fc1")(x))
        theta = jnp.tanh(
            nn.Dense(2, dtype=self.dtype, name="loc_fc2",
                     kernel_init=nn.initializers.zeros,
                     bias_init=lambda key, shape, dtype=jnp.float32:
                     jnp.asarray([2.0, 0.0], dtype))(x))    # [N, 2] (a, b)

        T = self.seq_len
        base = jnp.linspace(-1.0, 1.0, T, dtype=feats.dtype)
        coords = theta[:, :1] * base[None, :] + theta[:, 1:]  # [N, T]
        return temporal_grid_sample(feats, coords)


class ACM(nn.Module):
    """Action coordination module (reference: models/ta2n.py:154-254)."""
    seq_len: int
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, support, query, *, train: bool = False):
        """support: [n, T, H, W, C]; query: [m, T, H, W, C]
        -> pairs ([n, m, T, 2C]), offsets."""
        C = self.dim
        keynet = nn.Dense(C, use_bias=False, dtype=self.dtype, name="keynet")
        querynet = nn.Dense(C, use_bias=False, dtype=self.dtype,
                            name="querynet")
        valuenet = nn.Dense(C, use_bias=False, dtype=self.dtype,
                            name="valuenet")

        n, T = support.shape[:2]
        m = query.shape[0]
        H, W = support.shape[2:4]

        # temporal coordination (reference :191-211)
        su_t = support.mean(axis=(2, 3))                    # [n, T, C]
        qu_t = query.mean(axis=(2, 3))                      # [m, T, C]
        keys = keynet(su_t)
        querys = querynet(qu_t)
        attn = jnp.einsum("nxc,myc->nmxy", keys, querys,
                          preferred_element_type=jnp.float32) / (C ** 0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(support.dtype)
        values = valuenet(qu_t)                             # [m, T, C]
        query_aligned = query[None] + jnp.einsum(
            "nmxy,myc->nmxc", attn, values)[:, :, :, None, None, :]
        support_projed = support + valuenet(su_t)[:, :, None, None, :]

        # motion net -> offsets (reference :213-235)
        pairs_vol = jnp.concatenate(
            [jnp.broadcast_to(support_projed[:, None],
                              (n, m) + support_projed.shape[1:]),
             query_aligned], axis=-1)                       # [n,m,T,H,W,2C]
        pv = pairs_vol.reshape((n * m,) + pairs_vol.shape[2:])
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       momentum=0.9, epsilon=1e-5,
                                       dtype=jnp.float32, name=name)
        x = nn.Conv(128, (3, 3, 3), padding=1, dtype=self.dtype,
                    name="mv_conv1")(pv)
        x = nn.relu(_safe_pool(bn("mv_bn1")(x), (1, 2, 2)))
        x = nn.Conv(128, (3, 3, 3), padding=1, dtype=self.dtype,
                    name="mv_conv2")(x)
        x = nn.relu(_safe_pool(bn("mv_bn2")(x), (1, 2, 2)))
        x = jnp.max(x, axis=(2, 3))                         # [B, T, 128]
        x = nn.relu(nn.Dense(64, dtype=self.dtype, name="mv_fc1")(x))
        offsets = jnp.tanh(
            nn.Dense(2, dtype=self.dtype, name="mv_fc2",
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros)(x))   # [B, T, 2]
        offsets = offsets * 0.75
        raw_offsets = offsets

        perturb = jnp.asarray(_PERTURB, offsets.dtype).reshape(1, 1, 9, 2)
        off_p = offsets[:, :, None, :] + perturb            # [B, T, 9, 2]

        def pooled(vol, off):
            mask = gen_mask(off, H)                         # [B, T, 9, H, W]
            area = mask.sum(axis=(-1, -2), keepdims=True)
            mask = (mask / area).mean(axis=2)               # [B, T, H, W]
            mask = mask.reshape(n, m, T, H, W, 1)
            return (mask * vol).sum(axis=(3, 4))            # [n, m, T, C]

        su_pooled = pooled(jnp.broadcast_to(
            support_projed[:, None], (n, m) + support_projed.shape[1:]),
            off_p)
        qu_pooled = pooled(query_aligned, -off_p)
        pairs = jnp.concatenate([su_pooled, qu_pooled], axis=-1)
        return pairs, raw_offsets


class TA2NModel(nn.Module):
    """(reference: models/model_ta2n.py:107-155 + models/ta2n.py:260-357)"""
    way: int
    shot: int
    seq_len: int = 8
    arch: str = "resnet50"
    backbone_width: int = 64
    dropout: float = 0.5
    dist_norm: bool = False
    metric: str = "cos"             # 'cos' timewise; 'otam' -> SoftDTW
    first_stage: bool = True
    second_stage: bool = True
    dtype: Dtype = jnp.float32
    backbone_override: Any = None
    # eval-time VMEM-friendly chunked encode (visual.encode_chunked)
    encode_chunk: int = 0

    def setup(self):
        self.backbone = self.backbone_override or TorchResNet(arch=self.arch, output="spatial",
                                    width=self.backbone_width,
                                    dtype=self.dtype, name="backbone")
        d = self.backbone.feature_dim
        self.dim = d
        self.feat_dropout = nn.Dropout(self.dropout, name="feat_dropout")
        if self.first_stage:
            self.ttm = TTM(seq_len=self.seq_len, dtype=self.dtype, name="ttm")
        if self.second_stage:
            self.acm = ACM(seq_len=self.seq_len, dim=d, dtype=self.dtype,
                           name="acm")
        if self.shot > 1:
            self.keynet_multi = nn.Dense(d, use_bias=False, dtype=self.dtype,
                                         name="keynet_multi")
            self.querynet_multi = nn.Dense(d, use_bias=False,
                                           dtype=self.dtype,
                                           name="querynet_multi")
            self.valuenet_multi = nn.Dense(d, use_bias=False,
                                           dtype=self.dtype,
                                           name="valuenet_multi")
        if self.dist_norm:
            self.norm_layer = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                           name="norm_layer")

    def _insupport_align(self, support):
        """Multi-shot prototype fusion (reference: models/ta2n.py:285-302).
        support: [way, shot, T, H, W, C] -> [way, T, H, W, C]."""
        way, k, T, H, W, C = support.shape
        su_t = support.mean(axis=(3, 4))                    # [way, k, T, C]
        reference = su_t[:, 0]                              # [way, T, C]
        keys = self.keynet_multi(su_t)
        querys = self.querynet_multi(reference)
        attn = jnp.einsum("nkxc,nyc->nkxy", keys, querys,
                          preferred_element_type=jnp.float32) / (self.dim ** 0.5)
        attn = jax.nn.softmax(attn, axis=2).astype(support.dtype)
        values = self.valuenet_multi(support)               # [way,k,T,H,W,C]
        recon = jnp.einsum("nkxy,nkxhwc->nkyhwc", attn, values)
        return recon.mean(axis=1)

    def __call__(self, support_images, target_images, support_labels,
                 real_support_labels=None, real_target_labels=None,
                 text_train=None, text_test=None, *,
                 train: bool = False) -> Dict[str, jnp.ndarray]:
        det = not train
        S, T = support_images.shape[:2]
        Q = target_images.shape[0]
        both = jnp.concatenate(
            [support_images.reshape((S * T,) + support_images.shape[2:]),
             target_images.reshape((Q * T,) + target_images.shape[2:])],
            axis=0).astype(self.dtype)
        fmap = encode_chunked(self.backbone, both, self.encode_chunk,
                              train=train)   # [N, h, w, D]
        fmap = self.feat_dropout(fmap, deterministic=det)
        h, w, D = fmap.shape[1:]
        su = fmap[: S * T].reshape(S, T, h, w, D)
        qu = fmap[S * T:].reshape(Q, T, h, w, D)

        if self.first_stage:
            su = self.ttm(su, train=train)
            qu = self.ttm(qu, train=train)
        return self.match_features(su, qu, support_labels,
                                   real_support_labels, real_target_labels,
                                   text_train, text_test, train=train)

    def feature_cacheable(self) -> bool:
        """The TTM warp is computed per video from its own features, so the
        post-warp spatial maps fully determine this head's inputs
        (train/feature_cache.py)."""
        return True

    def encode(self, images, *, train: bool = False) -> jnp.ndarray:
        """``[N, T, H, W, 3]`` frames -> ``[N, T, h, w, D]`` TTM-aligned
        spatial maps: backbone -> (dropout) -> per-video temporal transform.
        The cacheable pixel->feature stage of :meth:`__call__` — the first
        TA2N stage aligns each video AGAINST ITSELF (reference:
        models/model_ta2n.py:118-170), so it is episode-independent."""
        N, T = images.shape[:2]
        flat = images.reshape((N * T,) + images.shape[2:]).astype(self.dtype)
        fmap = encode_chunked(self.backbone, flat, self.encode_chunk,
                              train=train)   # [N*T, h, w, D]
        fmap = self.feat_dropout(fmap, deterministic=not train)
        h, w, D = fmap.shape[1:]
        vids = fmap.reshape(N, T, h, w, D)
        if self.first_stage:
            vids = self.ttm(vids, train=train)
        return vids

    def match_features(self, su, qu, support_labels,
                       real_support_labels=None, real_target_labels=None,
                       text_train=None, text_test=None, *,
                       train: bool = False) -> Dict[str, jnp.ndarray]:
        """Head over precomputed (post-TTM) spatial maps ``su [S,T,h,w,D]``
        / ``qu [Q,T,h,w,D]`` (the post-encode tail of :meth:`__call__`)."""
        Q = qu.shape[0]
        T = qu.shape[1]
        D = qu.shape[-1]
        if self.shot > 1:
            grouped = group_by_class(su, support_labels, self.way, self.shot)
            proto = self._insupport_align(grouped)          # [way, T, h, w, D]
            qu = self.valuenet_multi(qu)
        else:
            proto = group_by_class(su, support_labels, self.way,
                                   self.shot)[:, 0]
        # proto: [way, T, h, w, D]

        if self.second_stage:
            pairs, _offsets = self.acm(proto, qu, train=train)
            su_al = pairs[..., : D]                         # [way, Q, T, D]
            qu_al = pairs[..., D:]
        else:
            su_al = jnp.broadcast_to(
                proto.mean(axis=(2, 3))[:, None], (self.way, Q, T, D))
            qu_al = jnp.broadcast_to(
                qu.mean(axis=(2, 3))[None], (self.way, Q, T, D))

        # prototype matching: negative timewise cosine
        # (reference: models/model_ta2n.py:52-99)
        if self.metric == "otam":
            # NOTE: the reference CONSTRUCTS SoftDTW(gamma=0.1) for
            # METRIC='otam' (models/model_ta2n.py:87) but its forward never
            # calls self.metric — the flag is dead there (COMPONENTS.md
            # defect 16). This branch implements the evidently intended
            # path with the FULL SoftDTW wrapper semantics (cos distance,
            # query-axis zero-padding, forward/reverse averaging —
            # models/OTAM.py:390-423), via the faithful ops.softdtw helper.
            from ...ops.softdtw import softdtw

            way, Qn = su_al.shape[:2]
            dist = softdtw(
                qu_al.reshape(way * Qn, T, D).astype(jnp.float32),
                su_al.reshape(way * Qn, T, D).astype(jnp.float32),
                gamma=0.1).reshape(way, Qn)
        else:
            sn = su_al / jnp.maximum(
                jnp.linalg.norm(su_al.astype(jnp.float32), axis=-1,
                                keepdims=True), 1e-12)
            qn = qu_al / jnp.maximum(
                jnp.linalg.norm(qu_al.astype(jnp.float32), axis=-1,
                                keepdims=True), 1e-12)
            dist = (1 - (sn * qn).sum(-1)).sum(-1)          # [way, Q]
        logits = (-dist).T                                  # [Q, way]
        if self.dist_norm:
            logits = self.norm_layer(logits)
        return {"logits": logits[None]}
