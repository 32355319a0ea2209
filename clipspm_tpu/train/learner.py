"""Episodic Learner: the trainer/evaluator runtime.

Fresh TPU-native design of the reference ``Learner``
(reference: run/main_run.py:27-427):

- gradient accumulation over ``TASKS_PER_BATCH`` episodes happens *inside*
  one jitted ``train_step`` via ``lax.scan`` (sum of per-episode gradients —
  bit-equivalent to the reference's ``backward()`` accumulation,
  run/main_run.py:204-209) instead of 16 python-side steps;
- device-side transforms fuse into the same jitted step;
- bf16 compute replaces torch AMP + GradScaler (bf16 needs no loss scaling);
- text tables are device constants gathered per episode;
- evaluation runs episodes under a separate eval-shaped jit (test
  QUERY_PER_CLASS differs from train; reference: configs/base.yaml:20,29) and
  reports mean accuracy with the reference's ``196 * std / sqrt(n)``
  confidence radius (reference: run/main_run.py:288).
"""

from __future__ import annotations

import concurrent.futures as _cf
import dataclasses
import os
from typing import Any, Callable, Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..data.episode import Episode
from ..data.transforms import episode_device_transform
from .losses import loss_and_acc
from .optim import make_optimizer


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    episode: jnp.ndarray          # episodes consumed (int32)
    rng: jax.Array
    text_train: jnp.ndarray       # [C_train, D] (zeros for non-CLIP heads)
    text_test: jnp.ndarray        # [C_test, D]


@dataclasses.dataclass
class TransformSpec:
    img_size: int = 224
    resize_to: int = 256
    flip: bool = True            # False for SSv2 (reference: video_reader.py:97-101)
    normalize: bool = False

    @classmethod
    def from_config(cls, cfg) -> "TransformSpec":
        dataset = cfg.DATA.DATASET
        img = int(cfg.DATA.IMG_SIZE)
        # reference wiring: 224->256, 84->96 (video_reader.py:83-111). For
        # any other size, scale by the same 8/7 ratio — a flat 96 would
        # make the crop LARGER than the resized image for img in (96, 224)
        # or img > 224 (negative-range randint under jit = corrupt crops).
        if img == 224:
            resize_to = 256
        elif img == 84:
            resize_to = 96
        else:
            resize_to = max(96, -(-img * 8 // 7))
        return cls(img_size=img, resize_to=resize_to,
                   flip=dataset not in ("ssv2", "ssv2_cmn"),
                   normalize=bool(cfg.DATA.get("IMG_NORM", False)))


class Learner:
    """Config-driven trainer/evaluator over an episode stream."""

    def __init__(self, cfg, model, variables,
                 train_source: Optional[Iterator[Episode]] = None,
                 test_source: Optional[Iterator[Episode]] = None,
                 text_train: Optional[jnp.ndarray] = None,
                 text_test: Optional[jnp.ndarray] = None,
                 transform: Optional[TransformSpec] = None,
                 mesh=None, parallel_episodes: Optional[int] = None,
                 log_fn: Callable[[str], None] = print):
        self.cfg = cfg
        self.model = model
        self.model_name = cfg.MODEL.NAME
        self.tasks_per_batch = int(cfg.TRAIN.TASKS_PER_BATCH)
        self.train_source = train_source
        self.test_source = test_source
        self.transform = transform or TransformSpec.from_config(cfg)
        self.log = log_fn
        self.tx = make_optimizer(cfg)
        # data-parallel microbatch width: episodes processed concurrently
        # (vmapped, sharded over the mesh 'dp' axis); the remaining
        # tasks_per_batch/M accumulate sequentially via scan.
        self.mesh = mesh
        if parallel_episodes is None:
            parallel_episodes = mesh.shape["dp"] if mesh is not None else 1
        self.parallel_episodes = int(parallel_episodes)
        # SOLVER.ACCUM_DTYPE: 'bfloat16' accumulates the per-episode
        # gradient sum in bf16 (halving the scan-carried accumulator
        # read/write bytes — the profiled 16.5% select_add slice) with the
        # optimizer update still fp32. Opt-in: summing E bf16 terms costs
        # ~2^-9 relative error vs the reference's fp32 accumulation.
        accum = str(cfg.get("SOLVER", {}).get("ACCUM_DTYPE", "float32")
                    or "float32")
        if accum not in ("float32", "bfloat16"):
            raise ValueError(f"SOLVER.ACCUM_DTYPE must be float32 or "
                             f"bfloat16, got {accum!r}")
        self.accum_dtype = jnp.bfloat16 if accum == "bfloat16" else None

        # SOLVER.DONATE_STATE=true donates the TrainState into the step (see
        # the jit construction below); resolved here because donation also
        # dictates buffer ownership at init.
        donate = bool(cfg.get("SOLVER", {}).get("DONATE_STATE", False))
        self._donate = donate

        # Under donation the TrainState must OWN its buffers: the donated
        # train step frees the input state's memory, so aliasing the
        # caller's ``variables`` (or the same text array twice — XLA rejects
        # a buffer donated via two leaves with INVALID_ARGUMENT) would free
        # arrays the caller still holds. jnp.array(copy=True) breaks every
        # alias once at init. On the default non-donating path the copy is
        # skipped — it would only double the transient host/device footprint
        # of a large checkpoint (e.g. ViT-L/14) for no benefit.
        def _own(tree):
            if not donate:
                return tree
            return jax.tree.map(lambda x: jnp.array(x, copy=True), tree)

        params = _own(variables["params"])
        batch_stats = _own(variables.get("batch_stats", {}))
        dim = 1
        if text_train is None:
            text_train = jnp.zeros((1, dim), jnp.float32)
        if text_test is None:
            text_test = jnp.zeros((1, dim), jnp.float32)
        self.state = TrainState(
            params=params, batch_stats=batch_stats,
            opt_state=self.tx.init(params),
            episode=jnp.asarray(0, jnp.int32),
            rng=jax.random.PRNGKey(int(cfg.MODEL.SEED)),
            text_train=jnp.array(text_train, copy=True),
            text_test=jnp.array(text_test, copy=True))
        if mesh is not None and mesh.shape.get("tp", 1) > 1:
            # megatron tensor sharding of the params (and Adam moments);
            # GSPMD inserts the row-parallel psums — see parallel/tensor.py
            from ..parallel.tensor import shard_train_state
            self.state = shard_train_state(self.state, mesh)

        # Donation: XLA aliases the new params/Adam moments onto the old
        # buffers (~3x params bytes of peak HBM). Callers never touch a
        # pre-step state after stepping (train_episodes replaces
        # self.state), and the state owns its buffers (_own above), so
        # donation is safe by construction — but it ships DEFAULT OFF:
        # measured throughput-neutral on v5e (3.475 vs 3.474 eps/s
        # accumulated), and a long tunneled-TPU training run with donation
        # enabled leaked ~1.4 G host RSS per step (the donated tree's size —
        # consistent with a backend that ignores the alias hint never
        # freeing the donation-marked inputs) until the host OOM'd at 93 G.
        # Enable only after watching RSS over >=20 steps on your platform
        # (scripts/donation_check.py is the one-command gate).
        self._train_step = jax.jit(self._train_step_impl,
                                   donate_argnums=(0,) if donate else ())
        self._eval_step = jax.jit(self._eval_step_impl)
        self._eval_batch = jax.jit(self._eval_batch_impl)

    # -- model application ----------------------------------------------------

    def _apply(self, params, batch_stats, episode: Episode, rng, *,
               train: bool, text_train, text_test):
        t = self.transform
        k_t, k_s, k_d = jax.random.split(rng, 3)
        sup = episode_device_transform(
            episode.support_images, k_s, train=train, img_size=t.img_size,
            resize_to=t.resize_to, flip=t.flip, normalize=t.normalize)
        tgt = episode_device_transform(
            episode.target_images, k_t, train=train, img_size=t.img_size,
            resize_to=t.resize_to, flip=t.flip, normalize=t.normalize)

        variables = {"params": params}
        mutable = False
        if batch_stats:
            variables["batch_stats"] = batch_stats
            mutable = ["batch_stats"] if train else False

        args = (sup, tgt, episode.support_labels,
                episode.real_support_labels, episode.real_target_labels,
                text_train, text_test)
        if mutable:
            outputs, updated = self.model.apply(
                variables, *args, rngs={"dropout": k_d},
                mutable=mutable, train=train)
            new_stats = updated["batch_stats"]
        else:
            outputs = self.model.apply(
                variables, *args, rngs={"dropout": k_d}, train=train)
            new_stats = batch_stats
        return outputs, new_stats

    def _episode_loss(self, params, batch_stats, episode, rng, *, train,
                      text_train, text_test):
        outputs, new_stats = self._apply(params, batch_stats, episode, rng,
                                         train=train, text_train=text_train,
                                         text_test=text_test)
        loss, acc = loss_and_acc(
            self.model_name, outputs, episode.target_labels,
            episode.real_support_labels, episode.real_target_labels,
            self.tasks_per_batch, cfg=self.cfg, train=train)
        return loss, (acc, new_stats)

    # -- steps -----------------------------------------------------------------

    def _train_step_impl(self, state: TrainState, batch: Episode,
                         weights=None):
        """One optimizer step over ``[E, ...]``-batched episodes.

        Sequentially scans episodes (the backbone batch inside one episode is
        already large) and sums gradients — the reference's accumulate-16
        loop in one compiled step (reference: run/main_run.py:193-210).

        ``weights`` ([E] float32, default all-ones) masks padded episodes:
        a zero-weight episode contributes NOTHING — no gradient, no
        batch-stats update, no metric mass, no episode-counter increment.
        The trailer of a run whose TRAIN_EPISODES isn't a TASKS_PER_BATCH
        multiple pads with duplicates to keep the jit shape static
        (:meth:`run`); the reference instead silently DROPS the trailing
        partial accumulation (reference: run/main_run.py:204-209) — here the
        real trailing episodes still train, at full per-episode weight.
        """
        E = batch.support_labels.shape[0]
        M = self.parallel_episodes
        if weights is None:
            weights = jnp.ones((E,), jnp.float32)
        rng, step_rng = jax.random.split(state.rng)
        ep_rngs = jax.random.split(step_rng, E)

        def loss_for_grad(params, stats, ep, k, w):
            loss, (acc, new_stats) = self._episode_loss(
                params, stats, ep, k, train=True,
                text_train=state.text_train, text_test=state.text_test)
            # w scales the episode's loss (hence its gradient); acc carries
            # the same mass so the metric means divide by sum(weights)
            return w * loss, (w * acc, new_stats)

        vg = jax.value_and_grad(loss_for_grad, has_aux=True)

        if M > 1:
            # [E] -> [E//M, M]: vmap M episodes concurrently (sharded over
            # the mesh dp axis), scan-accumulate the E//M microsteps.
            assert E % M == 0, f"batch of {E} episodes not divisible by M={M}"
            batch = jax.tree.map(
                lambda x: x.reshape((E // M, M) + x.shape[1:]), batch)
            ep_rngs = ep_rngs.reshape(E // M, M, -1)
            weights = weights.reshape(E // M, M)
            if self.mesh is not None:
                # pin the concurrent-episode axis to the mesh dp axis; XLA
                # partitions the microbatch and psums gradients over ICI.
                from jax.sharding import NamedSharding, PartitionSpec as P
                spec = NamedSharding(self.mesh, P(None, "dp"))
                batch = jax.tree.map(
                    lambda x: jax.lax.with_sharding_constraint(x, spec),
                    batch)
            vg_m = jax.vmap(vg, in_axes=(None, None, 0, 0, 0))

            def micro(params, stats, eps, ks, ws):
                (loss, (acc, new_stats)), grads = vg_m(params, stats, eps,
                                                       ks, ws)
                grads = jax.tree.map(lambda g: jnp.sum(g, axis=0), grads)
                # weighted stats mean; an all-padding microbatch keeps the
                # carried stats (wsum guards the 0/0)
                wsum = jnp.sum(ws)
                new_stats = jax.tree.map(
                    lambda s_old, s_new: jnp.where(
                        wsum > 0,
                        jnp.tensordot(ws, s_new, axes=(0, 0))
                        / jnp.maximum(wsum, 1.0), s_old),
                    stats, new_stats)
                return (jnp.sum(loss), (jnp.sum(acc), new_stats)), grads
        else:
            micro = None

        acc_dt = self.accum_dtype

        def body(carry, inp):
            grads_acc, stats, loss_acc, acc_acc = carry
            ep, k, w = inp
            step_fn = micro if M > 1 else vg
            (loss, (acc, new_stats)), grads = step_fn(state.params, stats,
                                                      ep, k, w)
            if M == 1:
                # gate batch-stats on the weight (micro handles M > 1)
                new_stats = jax.tree.map(lambda o, n: o + w * (n - o),
                                         stats, new_stats)
            if acc_dt is not None:
                grads = jax.tree.map(lambda g: g.astype(acc_dt), grads)
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            return (grads_acc, new_stats, loss_acc + loss, acc_acc + acc), None

        zero_grads = jax.tree.map(
            lambda p: jnp.zeros(p.shape, acc_dt or p.dtype), state.params)
        init = (zero_grads, state.batch_stats, jnp.asarray(0.0, jnp.float32),
                jnp.asarray(0.0, jnp.float32))
        (grads, new_stats, loss_sum, acc_sum), _ = jax.lax.scan(
            body, init, (batch, ep_rngs, weights))
        if acc_dt is not None:
            grads = jax.tree.map(
                lambda g, p: g.astype(p.dtype), grads, state.params)

        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        n_valid = jnp.sum(weights)
        new_state = state.replace(
            params=params, batch_stats=new_stats, opt_state=opt_state,
            episode=state.episode + n_valid.astype(jnp.int32), rng=rng)
        denom = jnp.maximum(n_valid, 1.0)
        metrics = {"loss": loss_sum / denom, "acc": acc_sum / denom}
        return new_state, metrics

    def _eval_step_impl(self, state: TrainState, episode: Episode):
        rng = jax.random.fold_in(state.rng, 1)
        loss, (acc, _) = self._episode_loss(
            state.params, state.batch_stats, episode, rng, train=False,
            text_train=state.text_train, text_test=state.text_test)
        return {"loss": loss, "acc": acc}

    def _eval_batch_impl(self, state: TrainState, batch: Episode):
        """Batched multi-episode eval: ``lax.map`` over the episode axis
        inside ONE device step — the fused decode->transform->encode->match
        pipeline across episodes.

        Sequential-in-one-dispatch beats vmap here: vmapping E episodes fuses
        the backbone into one (E*240)-frame batch, whose per-frame throughput
        *drops* with batch size on v5e (measured: 3068 fps at 240 frames,
        2657 at 960) and whose fp32 attention-score buffer grows to GBs
        (the round-1 E=24 remote-compile failure). ``lax.map`` keeps each
        episode's encode at the efficient 240-frame size while still
        amortizing the per-call host dispatch (~29 ms through the tunnel)
        over E episodes. On a mesh the episode axis is first split over dp
        (vmap outer = parallel across chips, map inner = sequential per chip).
        """
        rng = jax.random.fold_in(state.rng, 1)

        def one(ep):
            loss, (acc, _) = self._episode_loss(
                state.params, state.batch_stats, ep, rng, train=False,
                text_train=state.text_train, text_test=state.text_test)
            return loss, acc

        dp = self.mesh.shape.get("dp", 1) if self.mesh is not None else 1
        E = batch.support_labels.shape[0]
        if dp > 1 and E % dp == 0:
            from jax.sharding import NamedSharding, PartitionSpec as P
            spec = NamedSharding(self.mesh, P("dp"))
            batch = jax.tree.map(
                lambda x: jax.lax.with_sharding_constraint(
                    x.reshape((dp, E // dp) + x.shape[1:]), spec), batch)
            losses, accs = jax.vmap(lambda eps: jax.lax.map(one, eps))(batch)
            losses, accs = losses.reshape(E), accs.reshape(E)
        else:
            losses, accs = jax.lax.map(one, batch)
        return {"loss": losses, "acc": accs}

    # -- public API --------------------------------------------------------------

    def _step_state(self, batch: Episode, weights=None):
        """One optimizer step, replacing ``self.state``; returns device
        metrics (unfetched). Under donation, a failure after dispatch may
        already have consumed the old state's buffers — surface that
        explicitly instead of leaving later calls to die with opaque
        deleted-buffer errors."""
        try:
            self.state, metrics = self._train_step(self.state, batch,
                                                   weights)
            return metrics
        except Exception as e:
            if self._donate:
                raise RuntimeError(
                    "train step failed with SOLVER.DONATE_STATE=true — the "
                    "TrainState was donated and its buffers may already be "
                    "freed; this Learner cannot continue. Restart from the "
                    "last checkpoint (or rerun with SOLVER.DONATE_STATE="
                    "false)") from e
            raise

    def train_episodes(self, episodes,
                       n_valid: Optional[int] = None) -> Dict[str, float]:
        """Consume a list/batch of episodes as one optimizer step.

        ``n_valid`` marks only the first n episodes as real — the rest are
        shape-padding duplicates whose gradients/metrics are masked to zero
        (see :meth:`_train_step_impl`)."""
        from ..data.episode import stack_episodes

        if isinstance(episodes, Episode):
            batch = episodes
            E = int(batch.support_labels.shape[0])
        else:
            # stack on host, transfer once (see data/episode.py)
            E = len(episodes)
            batch = _device_episode(stack_episodes(episodes))
        weights = None
        if n_valid is not None and n_valid < E:
            weights = np.zeros((E,), np.float32)
            weights[:n_valid] = 1.0
        metrics = self._step_state(batch, weights)
        return {k: float(v) for k, v in metrics.items()}

    def evaluate(self, n_episodes: int,
                 source: Optional[Iterator[Episode]] = None,
                 batch_size: int = 1) -> Dict[str, float]:
        """(reference: run/main_run.py:256-293)

        ``batch_size > 1`` evaluates multiple episodes per device step
        (vmapped, mesh-sharded) — the reference has no equivalent; its eval
        loop is strictly one episode per iteration.
        """
        from ..data.episode import stack_episodes


        source = source or self.test_source
        dp = self.mesh.shape.get("dp", 1) if self.mesh is not None else 1
        if batch_size > 1 and batch_size % dp:
            # _eval_batch_impl shards over dp only when E % dp == 0 — round
            # the batch UP so the sharded path stays active (the padded
            # episodes are trimmed from the metrics below)
            batch_size += dp - batch_size % dp
        accs, losses = [], []
        it = iter(source)
        # Depth-1 pipeline + staging thread: results of step i are fetched
        # only after step i+1 has been dispatched, and host-side episode
        # staging (sampling, stacking, H2D copies — host-blocking through a
        # tunneled backend) runs on its own thread, so it overlaps the
        # device compute AND the result fetch instead of serializing with
        # them.
        pending = None

        def _stage(n):
            if batch_size > 1:
                eps = [next(it) for _ in range(n)]
                if n < batch_size:  # keep shapes static
                    eps += [eps[-1]] * (batch_size - n)
                # stack on host, transfer once (see data/episode.py)
                return _device_episode(stack_episodes(eps))
            return _device_episode(next(it))

        def _harvest(p):
            m, n = p
            accs.extend(np.asarray(m["acc"])[:n].tolist())
            losses.extend(np.asarray(m["loss"])[:n].tolist())

        stager = _cf.ThreadPoolExecutor(max_workers=1,
                                        thread_name_prefix="clipspm-eval")
        try:
            done = 0
            n = min(batch_size, n_episodes)
            fut = stager.submit(_stage, n) if n > 0 else None
            while done < n_episodes:
                staged = fut.result()
                done += n
                n_next = min(batch_size, n_episodes - done)
                if n_next > 0:
                    nxt_fut = stager.submit(_stage, n_next)
                if batch_size > 1:
                    m = self._eval_batch(self.state, staged)
                else:
                    m = self._eval_step(self.state, staged)
                    m = {"acc": m["acc"][None], "loss": m["loss"][None]}
                if pending is not None:
                    _harvest(pending)
                pending = (m, n)
                if n_next > 0:
                    fut, n = nxt_fut, n_next
            if pending is not None:
                _harvest(pending)
        finally:
            stager.shutdown(wait=False, cancel_futures=True)
        accs_arr = np.asarray(accs)
        return {
            "accuracy": float(accs_arr.mean() * 100.0),
            "confidence": float(196.0 * accs_arr.std() / np.sqrt(len(accs))),
            "loss": float(np.mean(losses)),
        }

    def run(self, train_episodes: Optional[int] = None,
            val_freq: Optional[int] = None,
            test_episodes: Optional[int] = None,
            print_freq: Optional[int] = None,
            checkpoint_fn: Optional[Callable[[int, float], None]] = None,
            periodic_checkpoint_fn: Optional[Callable[[int], None]] = None,
            metrics=None, eval_batch_size: int = 1,
            val_fn: Optional[Callable[[int], Dict[str, float]]] = None
            ) -> Dict[str, float]:
        """Training loop with periodic eval/checkpoints
        (reference: run/main_run.py:179-243).

        ``val_fn(n_episodes)`` overrides the mid-train validation path
        (must return the :meth:`evaluate` metric dict) — the CLI passes the
        unique-video feature-cached evaluator here when
        ``TEST.CACHE_FEATURES`` is set (train/feature_cache.py), which
        re-encodes the val split's videos at the CURRENT params each val
        and cuts the per-val wall from minutes to seconds."""
        import os as _os

        from ..data.episode import stack_episodes

        cfg = self.cfg
        total = train_episodes or int(cfg.TRAIN.TRAIN_EPISODES)
        val_freq = val_freq or int(cfg.TRAIN.VAL_FREQ)
        test_eps = test_episodes or int(cfg.TEST.TEST_EPISODES)
        print_freq = print_freq or int(cfg.TRAIN.PRINT_FREQ)
        save_freq = int(cfg.get("CHECKPOINT", {}).get("SAVE_FREQ", 0) or 0)
        tpb = self.tasks_per_batch

        it = iter(self.train_source)
        best_acc = 0.0
        window_loss, window_acc = [], []
        episode = int(self.state.episode)
        # opt-in jax.profiler trace of one optimizer step (SURVEY §5:
        # tracing as first-class; the reference has no profiling story)
        profile_dir = _os.environ.get("CLIPSPM_PROFILE_DIR")
        profiled = False

        # Pipelined loop (the reference stages and steps strictly serially,
        # run/main_run.py:193-210; the round-3 production convergence run
        # measured that serialization at ~0.2 eps/s wall against a 3.5 eps/s
        # chip). A single staging thread assembles + stacks + H2D-transfers
        # batch i+1 while the device executes the step on batch i (through
        # the tunnel device_put is host-blocking, so without the thread the
        # host path serializes with the step); metric fetches — the true
        # sync — are deferred one step (depth-1 pipeline) except at
        # print/val/checkpoint boundaries.
        def _stage(n):
            eps = [next(it) for _ in range(n)]
            w = None
            if len(eps) < tpb:
                # keep static shapes: pad the final partial batch with
                # duplicates, masked to zero weight in the train step (the
                # reference drops the trailing partial accumulation instead,
                # run/main_run.py:204-209)
                eps = eps + [eps[-1]] * (tpb - len(eps))
                w = np.zeros((tpb,), np.float32)
                w[:n] = 1.0
            return _device_episode(stack_episodes(eps)), w, n

        def _harvest(p):
            dm, ep = p
            m = {k: float(v) for k, v in dm.items()}
            window_loss.append(m["loss"])
            window_acc.append(m["acc"])
            if metrics is not None:
                metrics.scalars({"loss/Train_loss[it]": m["loss"],
                                 "acc/Train_acc[it]": m["acc"]}, ep)

        stager = _cf.ThreadPoolExecutor(max_workers=1,
                                        thread_name_prefix="clipspm-stage")
        pending = None
        # host-stall decomposition: time the main thread spends BLOCKED on
        # batch staging (decode+stack+H2D not hidden behind the device
        # step) vs total wall — printed per window so a host-bound run is
        # visible in the log, not inferred from a postmortem
        import time as _time

        stall_s, window_t0 = 0.0, _time.perf_counter()
        try:
            fut = stager.submit(_stage, min(tpb, total - episode))
            while episode < total:
                t_w = _time.perf_counter()
                batch, w, n = fut.result()
                stall_s += _time.perf_counter() - t_w
                nxt = episode + n
                if nxt < total:
                    fut = stager.submit(_stage, min(tpb, total - nxt))
                if profile_dir and not profiled and episode > 0:
                    from ..utils.metrics import profile_trace

                    with profile_trace(profile_dir):
                        dm = {k: float(v) for k, v in
                              self._step_state(batch, w).items()}  # sync
                    profiled = True
                    self.log(f"profiler trace written to {profile_dir}")
                else:
                    dm = self._step_state(batch, w)
                episode = nxt
                if pending is not None:
                    _harvest(pending)
                pending = (dm, episode)

                at_print = episode % print_freq < tpb
                at_save = (save_freq and periodic_checkpoint_fn
                           and episode % save_freq < tpb and episode < total)
                at_val = (val_freq and episode % val_freq < tpb
                          and episode < total)
                if at_print or at_save or at_val or episode >= total:
                    _harvest(pending)
                    pending = None

                if at_print:
                    from ..utils.metrics import host_rss_gb

                    rss = host_rss_gb()
                    wall = _time.perf_counter() - window_t0
                    stall_pct = 100.0 * stall_s / max(wall, 1e-9)
                    self.log(f"Task [{episode}/{total}], Train Loss: "
                             f"{np.mean(window_loss):.7f}, Train Accuracy: "
                             f"{np.mean(window_acc):.7f}, RSS: {rss:.1f}G, "
                             f"{wall / max(len(window_loss), 1) / tpb:.3f}"
                             f"s/ep (host-stall {stall_pct:.0f}%)")
                    if metrics is not None:
                        metrics.scalars(
                            {"loss/Train_loss[mean]":
                                 float(np.mean(window_loss)),
                             "acc/Train_acc[mean]":
                                 float(np.mean(window_acc)),
                             "sys/host_rss_gb": rss,
                             "sys/host_stall_pct": stall_pct},
                            episode // print_freq)
                    window_loss, window_acc = [], []
                    stall_s, window_t0 = 0.0, _time.perf_counter()

                if at_save:
                    periodic_checkpoint_fn(episode)

                if at_val:
                    if val_fn is not None:
                        res = val_fn(test_eps)
                    else:
                        res = self.evaluate(test_eps,
                                            batch_size=eval_batch_size)
                    self.log(f"Val @ {episode}: acc {res['accuracy']:.2f} "
                             f"+/- {res['confidence']:.2f}")
                    if res["accuracy"] > best_acc:
                        best_acc = res["accuracy"]
                        if checkpoint_fn:
                            checkpoint_fn(episode, best_acc)
                    if metrics is not None:
                        metrics.scalars(
                            {"loss/Test_loss": res["loss"],
                             "acc/Test_acc": res["accuracy"],
                             "acc/Best_acc": best_acc}, episode // val_freq)
            if pending is not None:
                _harvest(pending)
        finally:
            stager.shutdown(wait=False, cancel_futures=True)
        # The reference never evaluates or saves after its loop (val/save
        # are skipped at the final iteration, run/main_run.py:225-241), so
        # VAL_FREQ >= TRAIN_EPISODES would silently discard ALL progress.
        # Additive safety net: if no validation ever ran, persist the final
        # state so ONLY_TEST has something to restore.
        if best_acc == 0.0 and checkpoint_fn and episode > 0:
            self.log(f"no validation ran (VAL_FREQ={val_freq} vs "
                     f"{total} episodes) — saving final state as best")
            checkpoint_fn(episode, 0.0)
        return {"best_accuracy": best_acc, "episodes": episode}


_H2D_POOL = None
# Through a tunneled backend a single device_put stream tops out ~50 MB/s
# while 4 concurrent streams reach ~62 MB/s aggregate (measured v5e via
# axon, 47-188 MB uint8 payloads); episode frame tensors are 10s of MB
# each, so large leaves are split along their leading axis, transferred on
# CLIPSPM_H2D_STREAMS threads, and concatenated on-device. Bytes and
# results are identical to a single transfer (tests/test_h2d_chunked.py).
# 0 or 1 disables chunking (the plain jnp.asarray path).
_H2D_STREAMS = int(os.environ.get("CLIPSPM_H2D_STREAMS", "4") or "0")
_H2D_MIN_BYTES = 32 * 1024 * 1024


def _h2d_pool() -> "_cf.ThreadPoolExecutor":
    global _H2D_POOL
    if _H2D_POOL is None:
        _H2D_POOL = _cf.ThreadPoolExecutor(
            max_workers=_H2D_STREAMS, thread_name_prefix="clipspm-h2d")
    return _H2D_POOL


def device_put_chunked(tree):
    """Move a pytree of host arrays to the device, large leaves over
    parallel streams.

    The reference moves batches with a blocking ``.cuda()`` per tensor
    (run/main_run.py:296-318); here the big frame tensors additionally go
    over parallel streams when that pays (tunneled backends — see
    ``_H2D_STREAMS`` above)."""
    streams = _H2D_STREAMS
    if streams <= 1:
        return jax.tree.map(jnp.asarray, tree)

    def _put(x):
        n = getattr(x, "nbytes", 0)
        if (n < _H2D_MIN_BYTES or not isinstance(x, np.ndarray)
                or x.shape[0] < streams):
            return jnp.asarray(x)
        chunks = np.array_split(x, streams)
        futs = [_h2d_pool().submit(jax.device_put, c) for c in chunks]
        return jnp.concatenate([f.result() for f in futs])

    return jax.tree.map(_put, tree)


def _device_episode(e: Episode) -> Episode:
    return device_put_chunked(e)
