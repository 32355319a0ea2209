"""Data layer: split parsing, sampler determinism, decode pipeline."""

import os

import numpy as np
import pytest

from clipspm_tpu.data.pipeline import EpisodeLoader, decode_plan, probe_frame_size
from clipspm_tpu.data.sampler import EpisodeSampler, plan_frame_indices
from clipspm_tpu.data.splits import load_split

PIL = pytest.importorskip("PIL.Image")


@pytest.fixture(scope="module")
def disk_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    data = root / "frames"
    splits = root / "splits"
    splits.mkdir()
    rng = np.random.default_rng(0)
    classes = ["run", "jump", "wave"]
    lines = []
    for ci, cls in enumerate(classes):
        for v in range(4):
            vid = f"v{v}"
            d = data / "train" / cls / vid
            d.mkdir(parents=True)
            n_frames = 6 + v  # variable lengths
            for fidx in range(n_frames):
                arr = rng.integers(0, 255, size=(32, 32, 3)).astype(np.uint8)
                PIL.fromarray(arr).save(str(d / f"{fidx:05d}.jpg"))
            lines.append(f"{cls}/{vid}")
    (splits / "trainlist03.txt").write_text("\n".join(lines) + "\n")
    return str(splits), str(data)


def test_split_parsing(disk_dataset):
    splits, data = disk_dataset
    cat = load_split(splits, data, "train", "generic", seq_len=4)
    assert len(cat) == 12
    assert cat.classes == [0, 1, 2]
    assert cat.num_videos_for_class(0) == 4
    # min-frame filtering (reference: video_reader.py:142-143)
    cat2 = load_split(splits, data, "train", "generic", seq_len=7)
    assert len(cat2) == 9  # v0 (6 frames) dropped per class


def test_sampler_determinism_and_layout(disk_dataset):
    splits, data = disk_dataset
    cat = load_split(splits, data, "train", "generic", seq_len=4)
    s1 = EpisodeSampler(cat, way=2, shot=1, queries=2, seq_len=4,
                        train=True, seed=7)
    s2 = EpisodeSampler(cat, way=2, shot=1, queries=2, seq_len=4,
                        train=True, seed=7)
    p1, p2 = s1.sample(), s2.sample()
    np.testing.assert_array_equal(p1.support_video_idx, p2.support_video_idx)
    np.testing.assert_array_equal(p1.target_frame_idx, p2.target_frame_idx)
    # label layout: relative labels cover 0..way-1 with right multiplicity
    assert sorted(p1.support_labels.tolist()) == [0, 1]
    assert sorted(p1.target_labels.tolist()) == [0, 0, 1, 1]
    # real labels consistent with relative labels
    for rel, real in zip(p1.support_labels, p1.real_support_labels):
        assert p1.batch_class_list[rel] == real


def test_frame_index_policy_eval_trims():
    # eval: trim first/last frame (reference: video_reader.py:249-251)
    rng = np.random.default_rng(0)
    idx = plan_frame_indices(12, 4, train=False, rng=rng)
    assert idx[0] == 1 and idx[-1] == 10
    idx = plan_frame_indices(4, 4, train=False, rng=rng)
    np.testing.assert_array_equal(idx, [0, 1, 2, 3])


def test_decode_plan_native(disk_dataset):
    splits, data = disk_dataset
    cat = load_split(splits, data, "train", "generic", seq_len=4)
    sampler = EpisodeSampler(cat, way=2, shot=1, queries=1, seq_len=4,
                             train=False, seed=0)
    size = probe_frame_size(cat)
    assert size == (32, 32)
    ep = decode_plan(sampler.sample(), cat, frame_size=size)
    assert ep.support_images.shape == (2, 4, 32, 32, 3)
    assert ep.target_images.shape == (2, 4, 32, 32, 3)
    assert ep.support_images.dtype == np.uint8


def test_episode_loader_stream(disk_dataset):
    splits, data = disk_dataset
    cat = load_split(splits, data, "train", "generic", seq_len=4)
    sampler = EpisodeSampler(cat, way=2, shot=1, queries=1, seq_len=4,
                             train=True, seed=0)
    loader = EpisodeLoader(sampler, num_workers=2, prefetch=2)
    it = iter(loader)
    eps = [next(it) for _ in range(3)]
    loader.close()
    for ep in eps:
        assert ep.support_images.shape == (2, 4, 32, 32, 3)


def test_loader_skips_corrupt_episodes(disk_dataset, tmp_path):
    """A corrupt frame file drops the episode and the stream continues
    (the reference hard-exits; SURVEY §5 failure detection gap)."""
    splits, data = disk_dataset
    cat = load_split(splits, data, "train", "generic", seq_len=4)
    # corrupt one video's frames on the catalog (point at a missing file)
    cat.records[0].frame_paths[0] = str(tmp_path / "missing.jpg")
    sampler = EpisodeSampler(cat, way=3, shot=2, queries=1, seq_len=4,
                             train=False, seed=0)
    loader = EpisodeLoader(sampler, num_workers=2, prefetch=2)
    it = iter(loader)
    eps = [next(it) for _ in range(5)]
    loader.close()
    assert all(ep.support_images.shape == (6, 4, 32, 32, 3) for ep in eps)


def test_loader_surfaces_fatal_pipeline_errors(disk_dataset):
    """A persistent pipeline failure (e.g. a sampler error from a class
    with too few videos) must raise at the consumer, not kill the producer
    thread silently and leave ``next(it)`` blocked forever."""
    splits, data = disk_dataset
    cat = load_split(splits, data, "train", "generic", seq_len=4)

    class BrokenSampler(EpisodeSampler):
        def sample(self):
            raise ValueError("class has fewer videos than shot+queries")

    sampler = BrokenSampler(cat, way=3, shot=2, queries=1, seq_len=4,
                            train=False, seed=0)
    loader = EpisodeLoader(sampler, num_workers=2, prefetch=2)
    it = iter(loader)
    with pytest.raises(RuntimeError, match="100 times"):
        next(it)
    # the terminal error is sticky, not one-shot: a later consumption (or a
    # second consumer) must re-raise instead of blocking forever on the
    # empty queue with a dead producer
    with pytest.raises(RuntimeError, match="100 times"):
        next(iter(loader))
    loader.close()


def test_transform_resize_never_smaller_than_crop():
    """Reference wiring is 224->256 and 84->96; any other IMG_SIZE must
    still get resize_to >= img_size (a flat 96 made crops LARGER than the
    resized image for img in (96, 224), i.e. corrupt crops under jit)."""
    from clipspm_tpu.train.learner import TransformSpec
    from clipspm_tpu.utils.config import ConfigNode

    def spec(img):
        return TransformSpec.from_config(ConfigNode(
            {"DATA": {"DATASET": "hmdb", "IMG_SIZE": img}}))

    assert spec(224).resize_to == 256
    assert spec(84).resize_to == 96
    assert spec(32).resize_to == 96   # unchanged for the test-tiny size
    for img in (96, 128, 200, 256, 336):
        s = spec(img)
        assert s.resize_to > img, (img, s.resize_to)
