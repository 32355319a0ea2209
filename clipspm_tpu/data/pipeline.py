"""Host-side episode loader: plan -> threaded JPEG decode -> uint8 batches.

Replaces the reference's fork-per-worker ``DataLoader(batch_size=1)`` whose
workers decode + transform with PIL per video (reference:
run/main_run.py:71, video_reader.py:264-273). Here workers only *decode*
(crop/flip/scale run fused on device, data/transforms.py); a thread pool
prefetches episodes ahead of the training loop so the accelerator never waits
on IO.
"""

from __future__ import annotations

import concurrent.futures as cf
import os
import queue
import threading
from typing import Iterator, List, Optional

import numpy as np

from .episode import Episode
from .sampler import EpisodePlan, EpisodeSampler
from .splits import SplitCatalog


def _decode_image(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        im.load()
        if im.mode != "RGB":
            im = im.convert("RGB")
        return np.asarray(im, dtype=np.uint8)


def probe_frame_size(catalog: SplitCatalog) -> Optional[tuple]:
    """(H, W) of the first decodable frame (None when empty/unreadable)."""
    for rec in catalog.records[:16]:
        if rec.frame_paths:
            try:
                h, w = _decode_image(rec.frame_paths[0]).shape[:2]
            except Exception:
                continue
            return (h, w)
    return None


def decode_path_lists(path_lists: List[List[str]],
                      pool: Optional[cf.ThreadPoolExecutor] = None,
                      frame_size: Optional[tuple] = None,
                      native_threads: int = 8) -> np.ndarray:
    """Decode ``[clips][t]`` frame paths into a uint8 ``[N, t, H, W, 3]``.

    With ``frame_size`` (the benchmark dumps are uniform 256x256), the whole
    frame list goes through the native C++ batch decoder
    (data/native_decode.py); otherwise per-frame PIL in the thread pool.
    """
    flat = [p for clip in path_lists for p in clip]
    t = len(path_lists[0])
    if frame_size is not None:
        from .native_decode import decode_frames

        arr = decode_frames(flat, frame_size[0], frame_size[1],
                            n_threads=native_threads)
        return arr.reshape((len(path_lists), t) + arr.shape[1:])
    if pool is not None:
        frames = list(pool.map(_decode_image, flat))
    else:
        frames = [_decode_image(p) for p in flat]
    arr = np.stack(frames)
    return arr.reshape((len(path_lists), t) + arr.shape[1:])


def decode_plan(plan: EpisodePlan, catalog: SplitCatalog,
                pool: Optional[cf.ThreadPoolExecutor] = None,
                frame_size: Optional[tuple] = None,
                native_threads: int = 8) -> Episode:
    """Decode every frame of an episode plan into a uint8 Episode."""
    sup_paths = plan.frame_paths(catalog, "support")
    tgt_paths = plan.frame_paths(catalog, "target")

    def decode_clips(path_lists: List[List[str]]) -> np.ndarray:
        return decode_path_lists(path_lists, pool, frame_size, native_threads)

    return Episode(
        support_images=decode_clips(sup_paths),
        support_labels=plan.support_labels,
        target_images=decode_clips(tgt_paths),
        target_labels=plan.target_labels,
        real_support_labels=plan.real_support_labels,
        real_target_labels=plan.real_target_labels,
        batch_class_list=plan.batch_class_list,
    )


class EpisodeLoader:
    """Prefetching episode stream over (sampler, catalog).

    A sampler thread plans episodes; a decode pool turns plans into uint8
    arrays; a bounded queue provides back-pressure. Iterating yields
    ``Episode`` pytrees ready for ``jnp.asarray``.
    """

    def __init__(self, sampler: EpisodeSampler, num_workers: int = 8,
                 prefetch: int = 4, use_native: bool = True):
        self.sampler = sampler
        self.catalog = sampler.catalog
        # only pin a frame geometry when the native batch decoder is
        # actually loadable — otherwise decode_plan would bypass the thread
        # pool and fall into the serial per-frame PIL loop
        if use_native:
            from .native_decode import get_library

            use_native = get_library() is not None
        self.frame_size = probe_frame_size(self.catalog) if use_native else None
        self.num_workers = max(1, num_workers)
        # native decode threads beyond the physical core count actively hurt
        # (measured on a 1-vCPU host: 736 fps at 1 thread vs 547-580 at
        # 2-16 — contention, no parallelism; scripts/bench_decoder.py)
        self.native_threads = max(1, min(self.num_workers,
                                         os.cpu_count() or self.num_workers))
        self.prefetch = max(1, prefetch)
        self._queue: "queue.Queue[Episode]" = queue.Queue(self.prefetch)
        self._pool = cf.ThreadPoolExecutor(max_workers=self.num_workers)
        self._error: Optional[Exception] = None   # terminal producer failure
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._thread.start()

    def _producer(self):
        consecutive_failures = 0
        while not self._stop.is_set():
            try:
                plan = self.sampler.sample()
                ep = decode_plan(plan, self.catalog, self._pool,
                                 frame_size=self.frame_size,
                                 native_threads=self.native_threads)
                consecutive_failures = 0
            except Exception as exc:  # corrupt/missing frames: skip episode
                # (the reference hard-exits on any IO problem — SURVEY §5
                # "failure detection: none"; here a bad episode is dropped
                # and resampled, with a bounded retry budget). Sampler
                # errors (e.g. a class with < shot+queries videos) hit the
                # same budget and surface quickly instead of hanging.
                consecutive_failures += 1
                if consecutive_failures >= 100:
                    # surface the failure to the consumer — a raise here
                    # would kill this daemon thread silently and leave
                    # __iter__ blocked on the queue forever
                    ep = RuntimeError(
                        "episode pipeline failed 100 times in a row; "
                        f"last error: {exc!r}")
                    ep.__cause__ = exc
                    # terminal state must outlive the single queue item:
                    # any later/second consumer re-raises instead of
                    # blocking forever on an empty queue with a dead
                    # producer
                    self._error = ep
                else:
                    continue
            while not self._stop.is_set():
                try:
                    self._queue.put(ep, timeout=0.5)
                    break
                except queue.Full:
                    continue
            if isinstance(ep, Exception):
                return

    def __iter__(self) -> Iterator[Episode]:
        while True:
            try:
                item = self._queue.get(timeout=0.5)
            except queue.Empty:
                if self._error is not None:
                    raise self._error
                if self._stop.is_set():
                    return   # closed loader ends iteration
                continue
            if isinstance(item, Exception):
                raise item
            yield item

    def close(self):
        self._stop.set()
        self._pool.shutdown(wait=False, cancel_futures=True)
