"""Eval-time unique-video feature cache: the 10k-episode protocol without
re-encoding.

The reference's test loop re-runs the backbone on every frame of every
episode (reference: run/main_run.py:256-293 over video_reader.py:276-329):
10,000 episodes x way*(shot+queries) videos x T frames of CLIP encode. But
the eval-time frame-index policy (trim first/last frame, then ``linspace`` —
reference: video_reader.py:233-263) and the eval transform (Resize +
CenterCrop — reference: video_reader.py:104) are DETERMINISTIC per video:
the same test video contributes byte-identical pixels — hence identical
features — to every episode that samples it.

TPU-first redesign of that loop:

1. draw every episode's index plan up front (host-side numpy, cheap);
2. encode each UNIQUE sampled video once — batched, chunked, one jit — into
   a device-resident feature table ``[V, T, D]``;
3. run the cheap matching head over table gathers, hundreds of episodes per
   device dispatch (``lax.map``), with only int32 index/label arrays crossing
   the host->device boundary per batch.

For the published protocol (10,000 episodes x 30 videos at 5-way 5-shot
1-query) this removes ~99% of encode work: a split of V unique videos costs
``V*T`` frame encodes total instead of ~300,000 episode-video encodes.

Opt-in via ``TEST.CACHE_FEATURES: true`` (CLI ONLY_TEST path). Supported for
heads whose per-video features fully determine the episode forward — the
CLIP family (clipspm / clipfsar / sten / cpm2c-without-visual-prompts) and
the resnet family (otam's spatial tokens, trx's pooled frames, strm's
patch-attended frames, ta2n's post-TTM spatial maps — the TTM warp aligns
each video against itself, so it is episode-independent); each model
advertises via ``feature_cacheable()``. Pixel-space heads (soap's pixel
priors run before the backbone, molo's recon stream needs raw frame
differences) are out of scope by construction, as is training (random crop /
flip make features draw-dependent). The table shape follows the head's
``encode`` output (``[V,T,D]`` frame features up to ``[V,T,h,w,D]`` spatial
maps — the evaluator is shape-generic; spatial tables cost more HBM, scale
``CACHE_ENCODE_VIDEOS``/``CACHE_EVAL_BATCH`` down accordingly).
"""

from __future__ import annotations

import concurrent.futures as _cf
import time
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.pipeline import decode_path_lists, probe_frame_size
from ..data.sampler import EpisodePlan, EpisodeSampler
from ..data.transforms import episode_device_transform
from .learner import Learner, device_put_chunked
from .losses import loss_and_acc


def _model_feature_cacheable(model) -> bool:
    fn = getattr(model, "feature_cacheable", None)
    return bool(fn()) if callable(fn) else False


def _collect_plans(sampler: EpisodeSampler, n_episodes: int
                   ) -> List[EpisodePlan]:
    return [sampler.sample() for _ in range(n_episodes)]


def _frame_plans(plans: Sequence[EpisodePlan]) -> Dict[int, np.ndarray]:
    """vid -> its (deterministic) eval frame indices, in one pass.

    Cross-checks every re-occurrence: the eval frame-index policy must be
    deterministic per video or caching one feature row per video would be
    wrong."""
    out: Dict[int, np.ndarray] = {}
    for p in plans:
        for vids, frames in ((p.support_video_idx, p.support_frame_idx),
                             (p.target_video_idx, p.target_frame_idx)):
            for v, row in zip(vids.tolist(), frames):
                prev = out.get(int(v))
                if prev is None:
                    out[int(v)] = row
                elif not np.array_equal(prev, row):
                    raise AssertionError(
                        f"video {v} drew two different eval frame plans "
                        f"({prev} vs {row}) — eval sampling must be "
                        "deterministic per video for feature caching")
    return out


class FeatureCachedEvaluator:
    """Evaluate ``n_episodes`` of a seeded eval stream via a unique-video
    feature table. Metrics (mean accuracy, ``196*std/sqrt(n)`` CI, mean
    loss) match :meth:`Learner.evaluate` on the same stream.
    """

    def __init__(self, learner: Learner, catalog, sampler: EpisodeSampler, *,
                 encode_videos_per_step: int = 30,
                 eval_batch: int = 64,
                 num_decode_workers: int = 8,
                 mesh=None,
                 log_fn: Callable[[str], None] = print):
        if not _model_feature_cacheable(learner.model):
            raise ValueError(
                f"model {learner.model_name!r} does not support eval "
                "feature caching (needs per-video features that fully "
                "determine the episode forward; see "
                "train/feature_cache.py)")
        if sampler.train:
            raise ValueError("feature caching is eval-only: train-mode "
                             "frame jitter/crop/flip make features "
                             "draw-dependent")
        if sampler.seq_len < 2:
            raise ValueError(
                "feature caching requires DATA.SEQ_LEN >= 2: the eval "
                "frame-index policy is only deterministic per video for "
                "seq_len >= 2 (reference: video_reader.py:233-263)")
        self.learner = learner
        self.catalog = catalog
        self.sampler = sampler
        # Mesh-aware by default: inherit the learner's config-driven mesh
        # (train/setup.py:build_device_mesh) so the CLI's fastest eval path
        # scales with DEVICE.NUM_CHIPS like the uncached evaluator
        # (learner.py:_eval_batch_impl). The table-encode batch and the
        # head's episode axis shard over dp; the feature table and params
        # stay replicated (the table is small next to the frames it
        # replaces, and every chip gathers arbitrary rows from it).
        self.mesh = learner.mesh if mesh is None else mesh
        dp = self.mesh.shape.get("dp", 1) if self.mesh is not None else 1
        self.dp = int(dp)

        def _round_up(n: int) -> int:
            return -(-max(1, int(n)) // dp) * dp

        # both batch sizes pad to a static shape anyway; rounding them up to
        # a dp multiple keeps the sharded partitioning exact
        self.encode_videos_per_step = _round_up(encode_videos_per_step)
        self.eval_batch = _round_up(eval_batch)
        self.log = log_fn
        from ..data.native_decode import get_library

        use_native = get_library() is not None
        self.frame_size = probe_frame_size(catalog) if use_native else None
        self._pool = _cf.ThreadPoolExecutor(max_workers=num_decode_workers)

        model, transform = learner.model, learner.transform
        mesh_, dp_ = self.mesh, self.dp

        # Host-side center crop (bit-exact H2D cut): when decoded frames are
        # square at exactly ``resize_to``, the device transform's
        # resize_short_side is an identity (data/transforms.py:41) and
        # center_crop is a pure slice with offset (H-size)//2 — the same
        # numpy slice on the host uint8 array yields byte-identical model
        # input while shipping (img/resize_to)^2 of the pixels (224/256:
        # -23% host->device bytes; the tunneled table encode is
        # transfer-bound). ``_crop_off`` doubles as the enable flag.
        self._crop_off = None
        if (self.frame_size is not None
                and self.frame_size[0] == self.frame_size[1] == int(
                    transform.resize_to)
                and int(transform.img_size) < int(transform.resize_to)):
            self._crop_off = (int(transform.resize_to)
                              - int(transform.img_size)) // 2
        host_cropped = self._crop_off is not None

        def encode_clips(params, batch_stats, clips_u8):
            if dp_ > 1:
                # shard the video batch over dp: each chip decodes-transforms-
                # encodes B/dp videos; the gathered table rows come back
                # replicated via the concatenate in build_table
                from jax.sharding import NamedSharding, PartitionSpec as P

                clips_u8 = jax.lax.with_sharding_constraint(
                    clips_u8, NamedSharding(mesh_, P("dp")))
            # deterministic eval transform — the rng arg is unused in eval
            # mode (data/transforms.py:episode_device_transform). When the
            # host already center-cropped, resize_to=img_size makes both the
            # resize and the crop identities (the remaining work is the
            # float convert + normalize).
            x = episode_device_transform(
                clips_u8, jax.random.PRNGKey(0), train=False,
                img_size=transform.img_size,
                resize_to=(transform.img_size if host_cropped
                           else transform.resize_to),
                flip=transform.flip, normalize=transform.normalize)
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            return model.apply(variables, x, train=False, method="encode")

        self._encode_clips = jax.jit(encode_clips)

        name, tpb, cfg = (learner.model_name, learner.tasks_per_batch,
                          learner.cfg)

        def head_batch(params, batch_stats, table, su_idx, qu_idx,
                       sup_labels, real_sup, real_tgt, tgt_labels,
                       text_train, text_test, rng):
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats

            def one(args):
                si, qi, sl, rs, rt, tl = args
                su = jnp.take(table, si, axis=0)
                qu = jnp.take(table, qi, axis=0)
                out = model.apply(variables, su, qu, sl, rs, rt,
                                  text_train, text_test, train=False,
                                  method="match_features",
                                  rngs={"dropout": rng})
                loss, acc = loss_and_acc(name, out, tl, rs, rt, tpb,
                                         cfg=cfg, train=False)
                return loss, acc

            args = (su_idx, qu_idx, sup_labels, real_sup, real_tgt,
                    tgt_labels)
            if dp_ > 1:
                # episode axis over dp (the learner.py:_eval_batch_impl
                # pattern: vmap outer = parallel across chips, lax.map
                # inner = sequential per chip); the table is replicated —
                # every chip gathers arbitrary rows
                from jax.sharding import NamedSharding, PartitionSpec as P

                E = su_idx.shape[0]
                spec = NamedSharding(mesh_, P("dp"))
                args = tuple(
                    jax.lax.with_sharding_constraint(
                        a.reshape((dp_, E // dp_) + a.shape[1:]), spec)
                    for a in args)
                table = jax.lax.with_sharding_constraint(
                    table, NamedSharding(mesh_, P()))
                loss, acc = jax.vmap(
                    lambda t: jax.lax.map(one, t))(args)
                return loss.reshape(E), acc.reshape(E)
            return jax.lax.map(one, args)

        self._head_batch = jax.jit(head_batch)

    # -- table build --------------------------------------------------------

    def _decode_videos(self, vids: Sequence[int],
                       frame_plans: Dict[int, np.ndarray]) -> np.ndarray:
        path_lists = []
        for v in vids:
            paths = self.catalog.records[int(v)].frame_paths
            path_lists.append([paths[int(i)] for i in frame_plans[int(v)]])
        arr = decode_path_lists(path_lists, self._pool, self.frame_size)
        if self._crop_off is not None:
            off, size = self._crop_off, int(self.learner.transform.img_size)
            arr = np.ascontiguousarray(
                arr[..., off:off + size, off:off + size, :])
        return arr

    def build_table(self, plans: Sequence[EpisodePlan]
                    ) -> tuple:
        """Encode every unique video the plans sample.

        Returns ``(table [V, T, D] device array, row_of: vid -> row)``.
        Decode of batch i+1 overlaps the device encode of batch i via a
        staging thread (the Learner loops use the same pattern).
        """
        frame_plans = _frame_plans(plans)
        vids = np.asarray(sorted(frame_plans), dtype=np.int64)
        B = max(1, self.encode_videos_per_step)
        state = self.learner.state
        batches = [vids[i:i + B] for i in range(0, len(vids), B)]

        def _stage(batch):
            arr = self._decode_videos(batch, frame_plans)
            if len(batch) < B:  # pad: keep the jit shape static
                pad = np.repeat(arr[-1:], B - len(batch), axis=0)
                arr = np.concatenate([arr, pad], axis=0)
            return device_put_chunked(arr)

        rows: List[jnp.ndarray] = []
        stager = _cf.ThreadPoolExecutor(max_workers=1,
                                        thread_name_prefix="clipspm-fc")
        # stage telemetry: the encode loop is where a degraded link stalls
        # (H2D of ~1.2 GB of frames) and where the first call pays the jit
        # compile — log the first batch and then every ~25%, so a wedged
        # run's log shows WHERE it stopped instead of ending at
        # "Conduct Testing:" (measured round 5: two tunnel-outage 10k
        # sub-runs were indistinguishable from compile stalls without this)
        t_enc0 = time.perf_counter()
        log_every = max(1, len(batches) // 4)
        try:
            fut = stager.submit(_stage, batches[0])
            for i, batch in enumerate(batches):
                clips = fut.result()
                if i + 1 < len(batches):
                    fut = stager.submit(_stage, batches[i + 1])
                feats = self._encode_clips(state.params, state.batch_stats,
                                           clips)
                rows.append(feats[: len(batch)])
                if i == 0 or (i + 1) % log_every == 0 \
                        or i + 1 == len(batches):
                    jax.block_until_ready(feats)
                    self.log(f"  table encode: batch {i + 1}/{len(batches)}"
                             f" ({time.perf_counter() - t_enc0:.1f}s"
                             + (", incl. first-call compile)" if i == 0
                                else ")"))
        finally:
            stager.shutdown(wait=False, cancel_futures=True)
        table = jnp.concatenate(rows, axis=0)
        row_of = {int(v): i for i, v in enumerate(vids)}
        return table, row_of

    # -- evaluation ---------------------------------------------------------

    def evaluate(self, n_episodes: int) -> Dict[str, float]:
        t0 = time.perf_counter()
        plans = _collect_plans(self.sampler, n_episodes)
        t_plan = time.perf_counter() - t0

        t0 = time.perf_counter()
        table, row_of = self.build_table(plans)
        table.block_until_ready()
        t_encode = time.perf_counter() - t0
        n_vids = len(row_of)

        remap = np.vectorize(row_of.__getitem__, otypes=[np.int32])
        state = self.learner.state
        E = max(1, self.eval_batch)
        accs, losses = [], []
        rng = jax.random.fold_in(state.rng, 1)

        t0 = time.perf_counter()
        # enqueue every batch before reading ANY result: jax dispatch is
        # async, so the device (and the tunnel's request pipeline) works
        # through all batches back-to-back while the host stages the next
        # index arrays. Syncing per batch instead makes the stage
        # latency-bound — 40 serial round-trips collapsed 8.2 s -> 170.8 s
        # when the tunnel's RTT (not its bandwidth) degraded, measured on
        # back-to-back 10k runs. In-flight outputs are [E] scalars each.
        pending = []
        for start in range(0, n_episodes, E):
            chunk = plans[start:start + E]
            n = len(chunk)
            if n < E:  # pad: keep the jit shape static
                chunk = list(chunk) + [chunk[-1]] * (E - n)

            def stack(get):
                return np.stack([get(p) for p in chunk])

            m = self._head_batch(
                state.params, state.batch_stats, table,
                remap(stack(lambda p: p.support_video_idx)),
                remap(stack(lambda p: p.target_video_idx)),
                stack(lambda p: p.support_labels),
                stack(lambda p: p.real_support_labels),
                stack(lambda p: p.real_target_labels),
                stack(lambda p: p.target_labels),
                state.text_train, state.text_test, rng)
            pending.append((m, n))
        fetch_every = max(1, len(pending) // 4)
        for j, ((loss, acc), n) in enumerate(pending):
            losses.extend(np.asarray(loss)[:n].tolist())
            accs.extend(np.asarray(acc)[:n].tolist())
            if (j + 1) % fetch_every == 0 or j + 1 == len(pending):
                self.log(f"  head fetch: {j + 1}/{len(pending)} batches "
                         f"({time.perf_counter() - t0:.1f}s)")
        t_head = time.perf_counter() - t0

        self.log(f"feature-cached eval: {n_episodes} episodes over "
                 f"{n_vids} unique videos — plan {t_plan:.1f}s, "
                 f"encode {t_encode:.1f}s "
                 f"({n_vids * self.sampler.seq_len / max(t_encode, 1e-9):.0f}"
                 f" frames/s), head {t_head:.1f}s "
                 f"({n_episodes / max(t_head, 1e-9):.1f} eps/s)")
        accs_arr = np.asarray(accs)
        return {
            "accuracy": float(accs_arr.mean() * 100.0),
            "confidence": float(196.0 * accs_arr.std()
                                / np.sqrt(len(accs))),
            "loss": float(np.mean(losses)),
            "unique_videos": n_vids,
            "encode_seconds": t_encode,
            "head_seconds": t_head,
        }

    def close(self):
        self._pool.shutdown(wait=False, cancel_futures=True)


def evaluate_cached(cfg, learner: Learner, *, n_episodes: Optional[int] = None,
                    catalog=None, sampler: Optional[EpisodeSampler] = None,
                    log_fn: Callable[[str], None] = print) -> Dict[str, float]:
    """One-call cached evaluation of the config's test protocol.

    Builds the test catalog/sampler from ``cfg`` when not supplied — seeded
    identically to the Learner's test loader, so the episode stream (and
    therefore the reported accuracy) matches :meth:`Learner.evaluate` on a
    fresh learner (tests/test_feature_cache.py).
    """
    if catalog is None or sampler is None:
        from .setup import build_catalog_and_sampler

        catalog, sampler = build_catalog_and_sampler(
            cfg, "test", False, int(cfg.TEST.QUERY_PER_CLASS))
    n = int(n_episodes if n_episodes is not None
            else cfg.TEST.TEST_EPISODES)
    ev = FeatureCachedEvaluator(
        learner, catalog, sampler,
        encode_videos_per_step=int(
            cfg.TEST.get("CACHE_ENCODE_VIDEOS", 30) or 30),
        eval_batch=int(cfg.TEST.get("CACHE_EVAL_BATCH", 64) or 64),
        num_decode_workers=int(cfg.DATA.NUM_WORKERS),
        log_fn=log_fn)
    try:
        return ev.evaluate(n)
    finally:
        ev.close()
