"""Device-side transform unit tests (the C3 inventory, SURVEY §2.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipspm_tpu.data.transforms import (center_crop, clip_normalize,
                                         color_jitter, episode_device_transform,
                                         group_normalize, horizontal_flip,
                                         random_crop, random_rotation,
                                         resize_short_side, rotate_clip,
                                         ten_crop, to_float)


def clips(n=2, t=3, h=40, w=48, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(size=(n, t, h, w, 3)), jnp.float32)


def test_resize_short_side_noop_and_scale():
    x = clips()
    assert resize_short_side(x, 40) is x           # identity when matching
    y = resize_short_side(x, 20)
    assert y.shape[-3:] == (20, 24, 3)


def test_center_crop():
    x = clips()
    y = center_crop(x, 32)
    np.testing.assert_array_equal(np.asarray(y),
                                  np.asarray(x[..., 4:36, 8:40, :]))


def test_random_crop_shapes_and_content():
    x = clips()
    y = random_crop(x, 32, jax.random.PRNGKey(0))
    assert y.shape == (2, 3, 32, 32, 3)
    # every crop is a contiguous window of the source
    src = np.asarray(x[0])
    out = np.asarray(y[0])
    found = any(
        np.allclose(src[:, i:i + 32, j:j + 32, :], out)
        for i in range(40 - 32 + 1) for j in range(48 - 32 + 1))
    assert found


def test_horizontal_flip_all_or_nothing_per_video():
    x = clips(n=8)
    y = np.asarray(horizontal_flip(x, jax.random.PRNGKey(1)))
    xf = np.asarray(x[..., ::-1, :])
    xn = np.asarray(x)
    for i in range(8):
        assert (np.allclose(y[i], xf[i]) or np.allclose(y[i], xn[i]))


def test_to_float_and_normalizes():
    u8 = jnp.asarray(np.arange(24, dtype=np.uint8).reshape(1, 1, 2, 4, 3))
    f = to_float(u8)
    assert float(f.max()) <= 1.0
    n = clip_normalize(f)
    assert np.isfinite(np.asarray(n)).all()
    g = group_normalize(f, [0.5, 0.5, 0.5], [0.25, 0.25, 0.25])
    np.testing.assert_allclose(np.asarray(g), (np.asarray(f) - 0.5) / 0.25,
                               rtol=1e-6)


def test_color_jitter_ranges():
    x = clips()
    y = color_jitter(x, jax.random.PRNGKey(2), brightness=0.4, contrast=0.4,
                     saturation=0.4, hue=0.1)
    y = np.asarray(y)
    assert y.shape == x.shape
    assert y.min() >= 0.0 and y.max() <= 1.0
    assert not np.allclose(y, np.asarray(x))


def test_rotation_identity_at_zero_and_90():
    x = clips(h=32, w=32)
    y0 = rotate_clip(x, jnp.zeros((2,)))
    np.testing.assert_allclose(np.asarray(y0), np.asarray(x), atol=1e-5)
    # 90-degree rotation permutes pixels exactly (square input)
    y90 = np.asarray(rotate_clip(x, jnp.full((2,), 90.0)))
    want = np.rot90(np.asarray(x), k=1, axes=(2, 3))  # CCW, PIL convention
    np.testing.assert_allclose(y90, want, atol=1e-4)
    yr = random_rotation(x, jax.random.PRNGKey(3), degrees=15.0)
    assert yr.shape == x.shape


def test_ten_crop():
    x = clips(h=40, w=48)
    y = ten_crop(x, 32)
    assert y.shape == (2, 10, 3, 32, 32, 3)
    np.testing.assert_array_equal(np.asarray(y[:, 0]),
                                  np.asarray(x[..., :32, :32, :]))
    np.testing.assert_array_equal(np.asarray(y[:, 5]),
                                  np.asarray(x[..., :32, :32, :][..., ::-1, :]))


def test_episode_transform_eval_deterministic():
    u8 = jnp.asarray((np.asarray(clips(h=40, w=40)) * 255).astype(np.uint8))
    a = episode_device_transform(u8, jax.random.PRNGKey(0), train=False,
                                 img_size=32, resize_to=40)
    b = episode_device_transform(u8, jax.random.PRNGKey(9), train=False,
                                 img_size=32, resize_to=40)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_blk_temporal_excitation():
    """blk family smoke: shape-preserving, finite, differs from input
    (reference: models/myRes.py:250-412)."""
    from clipspm_tpu.models.backbones.temporal_excitation import Blk

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2 * 4, 8, 8, 16)), jnp.float32)
    blk = Blk(in_channels=16, seq_len=4)
    variables = blk.init(jax.random.PRNGKey(0), x)
    y = blk.apply(variables, x, train=False,
                  mutable=False if "batch_stats" not in variables else False)
    if isinstance(y, tuple):
        y = y[0]
    y = np.asarray(y)
    assert y.shape == x.shape
    assert np.isfinite(y).all()
    assert not np.allclose(y, np.asarray(x))


@pytest.mark.parametrize("resize_to,img", [(256, 224), (96, 84)])
def test_host_center_crop_is_byte_identical(resize_to, img):
    """The feature cache's host-side center crop (feature_cache.py:148-163)
    claims byte-identity: for square frames at exactly ``resize_to``, a host
    numpy slice at offset (resize_to-img)//2 followed by the device transform
    with resize_to=img equals the full device transform. Pin that claim at
    both shipped geometries (224/256 and the 84/96 low-res family)."""
    rng = np.random.default_rng(3)
    u8 = rng.integers(0, 256, size=(2, 3, resize_to, resize_to, 3),
                      dtype=np.uint8)
    full = episode_device_transform(
        jnp.asarray(u8), jax.random.PRNGKey(0), train=False,
        img_size=img, resize_to=resize_to, normalize=True)
    off = (resize_to - img) // 2
    pre = np.ascontiguousarray(u8[..., off:off + img, off:off + img, :])
    cropped = episode_device_transform(
        jnp.asarray(pre), jax.random.PRNGKey(0), train=False,
        img_size=img, resize_to=img, normalize=True)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(cropped))
