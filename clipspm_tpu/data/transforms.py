"""Device-side video transforms (fused, jitted, batched).

The reference transforms clips on the host with PIL, one video at a time
(reference: videotransforms/video_transforms.py:15-403, wired in
video_reader.py:83-111: train = Resize(256) -> [RandomHorizontalFlip] ->
RandomCrop(img_size); test = Resize(256) -> CenterCrop(img_size); then
ToTensor 0-1 stacking, video_reader.py:264-273). Here the whole episode is a
single uint8 device array and the transform chain is one jitted function —
resize / crop / flip / scale all fuse into one XLA kernel, and the episode
batch axis shards over the mesh.

Crop offsets and flips are drawn per *video* (the reference applies one crop
and one flip decision to all frames of a clip). The benchmark frame dumps are
pre-sized 256x256 (dir suffix ``_256x256q5_l8``), so ``resize_short_side`` is
an identity no-op on the main path; on other inputs it uses bilinear
interpolation (PIL-bilinear vs XLA-bilinear differ at subpixel level — a
documented fidelity note, not an accuracy-relevant difference).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp

# CLIP preprocessing constants (reference: models/clip_fsar.py:219-226);
# applied only when IMG_NORM-style normalization is requested — the
# reference's episodic path feeds plain 0-1 tensors to the backbone.
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def resize_short_side(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Resize ``[..., H, W, 3]`` so the short side equals ``size``
    (reference: videotransforms/video_transforms.py Resize)."""
    h, w = x.shape[-3], x.shape[-2]
    if h <= w:
        new_h, new_w = size, max(1, round(w * size / h))
    else:
        new_h, new_w = max(1, round(h * size / w)), size
    if (new_h, new_w) == (h, w):
        return x
    shape = x.shape[:-3] + (new_h, new_w, x.shape[-1])
    return jax.image.resize(x.astype(jnp.float32), shape, method="bilinear")


def center_crop(x: jnp.ndarray, size: int) -> jnp.ndarray:
    h, w = x.shape[-3], x.shape[-2]
    top = (h - size) // 2
    left = (w - size) // 2
    return x[..., top: top + size, left: left + size, :]


def random_crop(x: jnp.ndarray, size: int, rng: jax.Array) -> jnp.ndarray:
    """Per-video random crop of ``[N, T, H, W, 3]`` clips."""
    n, t, h, w, c = x.shape
    k1, k2 = jax.random.split(rng)
    tops = jax.random.randint(k1, (n,), 0, h - size + 1)
    lefts = jax.random.randint(k2, (n,), 0, w - size + 1)

    def crop_one(clip, top, left):
        return jax.lax.dynamic_slice(clip, (0, top, left, 0),
                                     (t, size, size, c))

    return jax.vmap(crop_one)(x, tops, lefts)


def horizontal_flip(x: jnp.ndarray, rng: jax.Array,
                    p: float = 0.5) -> jnp.ndarray:
    """Per-video coin-flip horizontal mirror of ``[N, T, H, W, 3]`` clips."""
    n = x.shape[0]
    flips = jax.random.bernoulli(rng, p, (n,))
    flipped = x[..., ::-1, :]
    return jnp.where(flips[:, None, None, None, None], flipped, x)


def to_float(x: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    return x.astype(dtype) / jnp.asarray(255.0, dtype)


def clip_normalize(x: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.asarray(CLIP_MEAN, x.dtype)
    std = jnp.asarray(CLIP_STD, x.dtype)
    return (x - mean) / std


def group_normalize(x: jnp.ndarray, mean, std) -> jnp.ndarray:
    """Per-channel normalize (reference: videotransforms/tensor_transforms.py
    GroupNormalize; declared but unused on the shipped path)."""
    mean = jnp.asarray(mean, x.dtype)
    std = jnp.asarray(std, x.dtype)
    return (x - mean) / std


def color_jitter(x: jnp.ndarray, rng: jax.Array, brightness: float = 0.0,
                 contrast: float = 0.0, saturation: float = 0.0,
                 hue: float = 0.0) -> jnp.ndarray:
    """Per-video color jitter on float 0-1 clips ``[N, T, H, W, 3]``
    (reference: videotransforms/video_transforms.py ColorJitter — PIL-based;
    here brightness/contrast/saturation are exact torchvision semantics, hue
    uses the YIQ-rotation approximation)."""
    n = x.shape[0]
    kb, kc, ks, kh = jax.random.split(rng, 4)
    shape = (n, 1, 1, 1, 1)

    if brightness > 0:
        f = jax.random.uniform(kb, shape, x.dtype, 1 - brightness,
                               1 + brightness)
        x = x * f
    if contrast > 0:
        f = jax.random.uniform(kc, shape, x.dtype, 1 - contrast, 1 + contrast)
        grey = (x * jnp.asarray([0.299, 0.587, 0.114], x.dtype)).sum(
            -1, keepdims=True).mean(axis=(1, 2, 3), keepdims=True)
        x = grey + (x - grey) * f
    if saturation > 0:
        f = jax.random.uniform(ks, shape, x.dtype, 1 - saturation,
                               1 + saturation)
        grey = (x * jnp.asarray([0.299, 0.587, 0.114], x.dtype)).sum(
            -1, keepdims=True)
        x = grey + (x - grey) * f
    if hue > 0:
        theta = jax.random.uniform(kh, (n,), x.dtype, -hue, hue) \
            * (2 * jnp.pi)
        cos, sin = jnp.cos(theta), jnp.sin(theta)
        # YIQ rotation
        yiq = jnp.asarray([[0.299, 0.587, 0.114],
                           [0.596, -0.274, -0.322],
                           [0.211, -0.523, 0.312]], x.dtype)
        rgb = jnp.linalg.inv(yiq)
        v = jnp.einsum("nthwc,dc->nthwd", x, yiq)
        y, i, q = v[..., 0], v[..., 1], v[..., 2]
        i2 = cos[:, None, None, None] * i - sin[:, None, None, None] * q
        q2 = sin[:, None, None, None] * i + cos[:, None, None, None] * q
        v = jnp.stack([y, i2, q2], axis=-1)
        x = jnp.einsum("nthwd,cd->nthwc", v, rgb)
    return jnp.clip(x, 0.0, 1.0)


def rotate_clip(x: jnp.ndarray, angles_deg: jnp.ndarray) -> jnp.ndarray:
    """Per-video rotation by arbitrary angles (bilinear, zero padding),
    torch/PIL-style center rotation (reference:
    videotransforms/video_transforms.py RandomRotation). x: [N, T, H, W, C].
    """
    n, t, H, W, C = x.shape
    theta = jnp.deg2rad(angles_deg.astype(jnp.float32))
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    ys = jnp.arange(H, dtype=jnp.float32) - cy
    xs = jnp.arange(W, dtype=jnp.float32) - cx
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")

    def rot_one(clip, th):
        cos, sin = jnp.cos(th), jnp.sin(th)
        src_y = cos * yy + sin * xx + cy
        src_x = -sin * yy + cos * xx + cx
        y0 = jnp.floor(src_y); x0 = jnp.floor(src_x)
        wy = src_y - y0; wx = src_x - x0

        def gather(yi, xi):
            valid = ((yi >= 0) & (yi < H) & (xi >= 0) & (xi < W))
            yi_c = jnp.clip(yi.astype(jnp.int32), 0, H - 1)
            xi_c = jnp.clip(xi.astype(jnp.int32), 0, W - 1)
            vals = clip[:, yi_c, xi_c, :]
            return vals * valid[None, :, :, None].astype(clip.dtype)

        out = (gather(y0, x0) * ((1 - wy) * (1 - wx))[None, :, :, None]
               + gather(y0, x0 + 1) * ((1 - wy) * wx)[None, :, :, None]
               + gather(y0 + 1, x0) * (wy * (1 - wx))[None, :, :, None]
               + gather(y0 + 1, x0 + 1) * (wy * wx)[None, :, :, None])
        return out

    return jax.vmap(rot_one)(x, theta)


def random_rotation(x: jnp.ndarray, rng: jax.Array,
                    degrees: float = 10.0) -> jnp.ndarray:
    """Per-video uniform random rotation in [-degrees, degrees]."""
    angles = jax.random.uniform(rng, (x.shape[0],), jnp.float32,
                                -degrees, degrees)
    return rotate_clip(x, angles)


def ten_crop(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Four corners + center crops and their horizontal mirrors
    (reference: videotransforms/video_transforms.py TenCrop).
    [N, T, H, W, C] -> [N, 10, T, size, size, C]."""
    h, w = x.shape[-3], x.shape[-2]
    tl = x[..., :size, :size, :]
    tr = x[..., :size, w - size:, :]
    bl = x[..., h - size:, :size, :]
    br = x[..., h - size:, w - size:, :]
    cc = center_crop(x, size)
    crops = jnp.stack([tl, tr, bl, br, cc], axis=1)
    flipped = crops[..., ::-1, :]
    return jnp.concatenate([crops, flipped], axis=1)


@functools.partial(jax.jit,
                   static_argnames=("train", "img_size", "resize_to",
                                    "flip", "normalize", "dtype"))
def episode_device_transform(images: jnp.ndarray, rng: jax.Array, *,
                             train: bool, img_size: int = 224,
                             resize_to: int = 256, flip: bool = True,
                             normalize: bool = False,
                             dtype=jnp.float32) -> jnp.ndarray:
    """Fused decode-to-model transform for one episode side.

    Args:
        images: ``[N, T, H, W, 3]`` uint8 frames.
        rng: PRNG key (unused in eval mode).
        train: random crop + optional flip vs. center crop
            (reference: video_reader.py:96-104; flip disabled for SSv2).
    Returns:
        ``[N, T, img_size, img_size, 3]`` float frames in 0-1 (optionally
        CLIP-normalized).
    """
    x = resize_short_side(images, resize_to)
    if train:
        k1, k2 = jax.random.split(rng)
        if flip:
            x = horizontal_flip(x, k1)
        x = random_crop(x, img_size, k2)
    else:
        x = center_crop(x, img_size)
    x = to_float(x, dtype)
    if normalize:
        x = clip_normalize(x)
    return x
