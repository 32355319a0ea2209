"""Native C++ JPEG decoder: builds, decodes correctly, falls back cleanly."""

import os

import numpy as np
import pytest

from clipspm_tpu.data.native_decode import decode_frames, get_library

PIL = pytest.importorskip("PIL.Image")


@pytest.fixture(scope="module")
def jpeg_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("frames")
    rng = np.random.default_rng(0)
    paths, arrays = [], []
    for i in range(6):
        arr = rng.integers(0, 255, size=(48, 64, 3)).astype(np.uint8)
        p = str(d / f"f{i:03d}.jpg")
        PIL.fromarray(arr).save(p, quality=95)
        paths.append(p)
        arrays.append(arr)
    return paths, arrays


def test_library_builds():
    lib = get_library()
    assert lib is not None, "native decoder failed to build/load"


def test_decode_matches_pil(jpeg_dir):
    paths, _ = jpeg_dir
    got = decode_frames(paths, 48, 64, n_threads=3)
    assert got.shape == (6, 48, 64, 3)
    from PIL import Image

    for i, p in enumerate(paths):
        with Image.open(p) as im:
            want = np.asarray(im.convert("RGB"))
        # same file, two decoders: libjpeg and PIL(+libjpeg) should agree
        # exactly; allow tiny slack for idct implementation differences
        assert np.mean(np.abs(got[i].astype(int) - want.astype(int))) < 1.0


def test_geometry_mismatch_falls_back(jpeg_dir):
    paths, _ = jpeg_dir
    # request a different size: native path rejects, PIL fallback resizes
    got = decode_frames(paths, 24, 32)
    assert got.shape == (6, 24, 32, 3)


def test_missing_file_falls_back_with_error(jpeg_dir):
    paths, _ = jpeg_dir
    with pytest.raises(Exception):
        decode_frames(paths[:1] + ["/nonexistent.jpg"], 48, 64)
