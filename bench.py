"""Benchmark: episodes/sec/chip on the flagship eval path.

Measures the BASELINE.json north-star metric — 5-way 5-shot 8-frame episodic
inference (device transform + CLIP ViT-B/16 + CLIP-SPM head + logits) on one
chip, bf16, randomly initialised weights, synthetic episodes.

Primary value = **production eval throughput**: E=32 episodes evaluated per
device step via ``lax.map`` (each episode's 240-frame encode runs at its
VMEM-friendly chunk size; see clipspm_tpu/models/visual.py:encode_chunked),
amortizing the ~29 ms per-call tunnel dispatch. This is the mode the
evaluator uses for the reference's 10,000-episode protocol
(reference: run/main_run.py:256-293). Extras carry the single-episode
latency path (sync per call), frames/s, and train-step throughput.

Timing protocol: sync via host fetch (block_until_ready is a no-op through
the tunnel), warm medians with the first block discarded, inputs varied
across calls (the remote helper dedupes identical executions).

``vs_baseline``: the reference publishes no throughput numbers (BASELINE.md)
and its CLIP heads cannot run in this environment (hard ``.cuda()`` calls +
checkpoint download at init; reference: models/model_clipspm.py:19,26). The
baseline is this repo's first recorded measurement (bench_baseline.json,
8.59 eps/s single-episode eval, round 1) so later rounds report progress.

Output protocol (robust to an external timeout): the primary JSON line is
printed IMMEDIATELY after the batched-eval measurement — the first and most
important compile — and re-printed with merged extras after every later
stage completes. A consumer that takes either the first or the last JSON
line of the tail gets a valid record; a kill mid-stage loses only the
not-yet-finished stages. Every stage after the primary is guarded by a
wall-clock deadline (``BENCH_DEADLINE_S``, default 1200 s): if the elapsed
time plus a conservative estimate of the stage's cold-compile cost would
cross the deadline, the stage is skipped and noted in extras. With a warm
persistent compile cache (``JAX_COMPILATION_CACHE_DIR``, default
/tmp/jax_cache — verified to survive process boundaries on the tunneled
backend) the full default run takes a few minutes.

Flags: ``--quick`` (fewer iters). Env: ``BENCH_TRAIN=0`` skips the
train-step measurements (their backward compiles take minutes on a cold
remote compile cache); ``BENCH_CHUNK`` overrides the eval encode chunk width
(default 30 for ViT, off for RN50); ``BENCH_TRAIN_CHUNK`` the train width
(default 40 for ViT); ``BENCH_E`` the eval batch (default 32; measured
asymptote — 17.34/17.43/17.48 eps/s at E=32/48/64); ``BENCH_TRAIN_ACCUM``
the accumulated-step episode count (default 16); ``BENCH_ARCH`` the CLIP
backbone (default ViT-B/16; RN50 benches the ModifiedResNet tower);
``BENCH_SINGLE=0`` / ``BENCH_INT8=0`` / ``BENCH_RN50=0`` /
``BENCH_CACHED=0`` skip those extra eval stages (``BENCH_CACHED_VIDEOS``
sizes the feature-cache stage's unique-video table, default 120);
``BENCH_CACHED_10K=0`` skips the measured 10k-protocol CLI subprocess
(which otherwise runs FIRST, before this process contacts the exclusive
tunnel; ``BENCH_10K_EPISODES`` / ``BENCH_10K_ROOT`` size it);
``BENCH_TRAIN_SINGLE=0`` skips the per-episode train stage
(keeps A/B sweeps of the accumulated step to one backward compile);
``BENCH_DEADLINE_S`` the wall-clock budget (0 = no deadline).
"""

import json
import os
import sys
import time

import numpy as np

# set by main()'s emit(): once a valid primary JSON line is on stdout, the
# top-level handler must not append an error record over it
_PRIMARY_EMITTED = [False]


def _sync(x):
    # block_until_ready is a no-op on tunneled remote platforms; fetching a
    # scalar is a true sync
    return float(x.sum())


_PROVISIONAL_EMITTED = [False]


def _emit_provisional_outage(msg):
    """Outage detected at init: put a parseable record on stdout NOW, so
    even an external kill (rc=124) mid-retry leaves the round documented.
    Any later JSON line (a real measurement, or the terminal error record)
    supersedes this one."""
    if _PROVISIONAL_EMITTED[0] or _PRIMARY_EMITTED[0]:
        return
    _PROVISIONAL_EMITTED[0] = True
    print(json.dumps({
        "metric": "episodes/sec/chip (5w5s 8f eval)",
        "value": None,
        "unit": "episodes/s",
        "vs_baseline": None,
        "error": msg[:500],
        "note": "provisional record: TPU backend outage at init, retrying "
                "within budget — any LATER JSON line supersedes this one",
    }))
    sys.stdout.flush()


def _contact_retry_loop(time_left):
    """In-process device contact, retried on clean transient exceptions
    (the round-3 failure: init raises ``UNAVAILABLE`` before any JSON)."""
    import jax
    import jax.numpy as jnp

    attempt = 0
    while True:
        attempt += 1
        try:
            dev = jax.devices()[0]
            x = jnp.ones((128, 128), jnp.bfloat16)
            _sync((x @ x).astype(jnp.float32))
            return dev, attempt
        except Exception as e:
            msg = f"{type(e).__name__}: {e}"
            transient = any(s in msg for s in (
                "UNAVAILABLE", "Unavailable", "unavailable",
                "Unable to initialize backend", "DEADLINE_EXCEEDED",
                "INTERNAL", "500", "502", "503", "Connection",
                "RESOURCE_EXHAUSTED"))
            wait = min(45.0, 10.0 * attempt)
            if not transient or time_left() < wait + 120:
                raise RuntimeError(
                    f"device contact failed after {attempt} attempt(s) "
                    f"({'transient' if transient else 'non-transient'}, "
                    f"{time_left():.0f}s budget left): {msg}") from e
            _emit_provisional_outage(msg)
            print(f"[bench] device contact failed (attempt {attempt}): "
                  f"{msg[:200]} — retrying in {wait:.0f}s", file=sys.stderr)
            sys.stderr.flush()
            time.sleep(wait)
            try:
                from jax.extend.backend import clear_backends
                clear_backends()
            except Exception:
                pass


def _recover_from_hang(time_left, hang_s):
    """Backend init HUNG in-process (the round-2 failure: rc=124, no JSON).

    A hung init holds the backend lock, so further in-process attempts are
    useless. Probe the tunnel from fresh subprocesses until it recovers,
    then re-exec this bench in a clean process (the compile cache persists,
    and the remaining budget is carried via BENCH_DEADLINE_S). Raises when
    the budget runs out or re-exec already happened twice."""
    import subprocess

    probe_src = ("import jax, jax.numpy as jnp; "
                 "x = jnp.ones((128, 128), jnp.bfloat16); "
                 "print(float((x @ x).astype(jnp.float32).sum()))")
    n = 0
    while time_left() > 180:
        n += 1
        try:
            r = subprocess.run([sys.executable, "-c", probe_src],
                               timeout=120, capture_output=True)
            ok = r.returncode == 0
        except subprocess.TimeoutExpired:
            ok = False
        print(f"[bench] tunnel probe {n}: {'ok' if ok else 'down'} "
              f"({time_left():.0f}s budget left)", file=sys.stderr)
        sys.stderr.flush()
        if ok:
            reexec = int(os.environ.get("BENCH_REEXEC", "0"))
            if reexec >= 2:
                raise RuntimeError(
                    f"backend healthy in a subprocess probe but init is "
                    f"wedged in-process even after {reexec} re-execs")
            os.environ["BENCH_REEXEC"] = str(reexec + 1)
            os.environ["BENCH_DEADLINE_S"] = str(max(300, int(time_left())))
            print(f"[bench] tunnel recovered on probe {n}; re-exec with "
                  f"{os.environ['BENCH_DEADLINE_S']}s budget",
                  file=sys.stderr)
            sys.stderr.flush()
            sys.stdout.flush()
            os.execv(sys.executable, [sys.executable] + sys.argv)
        time.sleep(30)
    raise RuntimeError(
        f"backend init hung in-process for {hang_s:.0f}s and {n} subprocess "
        f"probe(s) stayed down until the budget ran out")


def _first_device_contact(time_left):
    """First device op, defended against BOTH recorded failure modes of the
    tunneled backend: a clean transient exception at init (round 3, rc=1)
    and a silent hang at init (round 2, rc=124). Runs the retry loop under a
    hang-guard thread; on hang, falls back to subprocess probing + re-exec.
    Returns (device, attempts); raises with a descriptive message when the
    wall-clock budget is exhausted (caller turns that into the terminal
    error record)."""
    import queue
    import threading

    q = queue.Queue()

    def loop():
        try:
            q.put(("ok",) + _contact_retry_loop(time_left))
        except Exception as e:
            q.put(("err", e))

    th = threading.Thread(target=loop, daemon=True)
    th.start()
    # an init that hasn't returned in 3 min will not return — detect fast
    # and keep the budget for the probe/recover/measure phases
    hang_wait = max(60.0, min(time_left() - 180.0, 180.0))
    try:
        res = q.get(timeout=hang_wait)
    except queue.Empty:
        _emit_provisional_outage(
            f"backend init hung in-process for {hang_wait:.0f}s")
        _recover_from_hang(time_left, hang_wait)   # re-execs or raises
        raise AssertionError("unreachable")
    if res[0] == "err":
        raise res[1]
    return res[1], res[2]


def _emit_error_record(exc, note):
    """Terminal failure before the primary measurement: the record must
    still carry a JSON line (``parsed`` must never be null) documenting why.
    """
    import traceback

    print(json.dumps({
        "metric": "episodes/sec/chip (5w5s 8f eval)",
        "value": None,
        "unit": "episodes/s",
        "vs_baseline": None,
        "error": f"{type(exc).__name__}: {exc}"[:500],
        "note": note,
    }))
    sys.stdout.flush()
    traceback.print_exc(file=sys.stderr)


def _warm_median(fn, args_list, inner, blocks=3):
    """Median over warm blocks (block 0 discarded), inputs cycled."""
    med = []
    for b in range(blocks + 1):
        ts = []
        for i in range(inner):
            a = args_list[(b * inner + i) % len(args_list)]
            t0 = time.perf_counter()
            _sync(fn(*a))
            ts.append(time.perf_counter() - t0)
        med.append(float(np.median(ts)))
    return float(np.median(med[1:]))


def _bench_train(jax, jnp, model, variables, episodes, n_staged, text, img,
                 Q, key, n_iters):
    from clipspm_tpu.data.transforms import episode_device_transform
    from clipspm_tpu.train.losses import loss_and_acc

    @jax.jit
    def train_grad(variables, sup_u8, tgt_u8, sup_labels, real_sup, real_tgt,
                   key):
        def loss_fn(params):
            sup = episode_device_transform(sup_u8, key, train=True,
                                           img_size=img, resize_to=256,
                                           dtype=jnp.bfloat16)
            tgt = episode_device_transform(tgt_u8, key, train=True,
                                           img_size=img, resize_to=256,
                                           dtype=jnp.bfloat16)
            v = dict(variables, params=params)
            if "batch_stats" in variables:   # RN50 tower: BN batch stats
                out, _ = model.apply(v, sup, tgt, sup_labels,
                                     real_sup, real_tgt, text, text,
                                     train=True, rngs={"dropout": key},
                                     mutable=["batch_stats"])
            else:
                out = model.apply(v, sup, tgt, sup_labels,
                                  real_sup, real_tgt, text, text, train=True,
                                  rngs={"dropout": key})
            loss, _ = loss_and_acc("clipspm", out, sup_labels[:Q] * 0,
                                   real_sup, real_tgt, 16, train=True)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
        return loss + sum(jnp.sum(g) * 0 for g in jax.tree.leaves(grads))

    t_c0 = time.perf_counter()
    _sync(train_grad(variables, *episodes[0], key))
    compile_s = time.perf_counter() - t_c0
    n_t = max(3, n_iters // 6)
    t = _warm_median(train_grad,
                     [(variables,) + episodes[i % n_staged] + (key,)
                      for i in range(n_staged)], inner=n_t, blocks=2)
    return 1.0 / t, compile_s


def _bench_train_accum(jax, jnp, model, variables, episodes, n_staged, text,
                       quick: bool):
    """Production train step: the Learner's own jitted scan-accumulated
    TASKS_PER_BATCH-episode step (grads summed over E episodes, ONE optax
    update, one device dispatch — reference: run/main_run.py:193-210).
    Reported as eps/s so it is comparable with the single-episode number;
    the accumulated step amortizes both the ~29 ms dispatch and the
    optimizer update over E episodes."""
    from clipspm_tpu.data.episode import Episode, stack_episodes
    from clipspm_tpu.train.learner import Learner
    from clipspm_tpu.utils.config import ConfigNode

    E = int(os.environ.get("BENCH_TRAIN_ACCUM", "8" if quick else "16"))
    cfg = ConfigNode({
        # BACKBONE here is informational only — the Learner receives the
        # already-built ``model`` (whatever BENCH_ARCH selected)
        "MODEL": {"NAME": "clipspm", "BACKBONE": "bench", "SEED": 0},
        "TRAIN": {"WAY": 5, "SHOT": 5, "TASKS_PER_BATCH": E},
        "SOLVER": {"LR": 1e-4, "WEIGHT_DECAY": 5e-5, "LR_SCH": 1000000,
                   "OPTIM_METHOD": "adam",
                   # BENCH_ACCUM_DTYPE=bfloat16 A/Bs the bf16 gradient
                   # accumulator (see Learner)
                   "ACCUM_DTYPE": os.environ.get("BENCH_ACCUM_DTYPE",
                                                 "float32")},
        "DATA": {"SEQ_LEN": 8, "IMG_SIZE": 224, "DATASET": "hmdb"},
    })
    learner = Learner(cfg, model, dict(variables), text_train=text,
                      text_test=text)

    def batch_of(shift):
        eps = []
        for i in range(E):
            s, t, sl, rs, rt = episodes[(i + shift) % n_staged]
            eps.append(Episode(
                support_images=s, target_images=t, support_labels=sl,
                target_labels=sl[: t.shape[0]],
                real_support_labels=rs, real_target_labels=rt,
                batch_class_list=jnp.arange(5, dtype=jnp.int32)))
        return stack_episodes(eps)

    batches = [batch_of(s) for s in range(2)]
    t_c0 = time.perf_counter()
    st, _ = learner._train_step(learner.state, batches[0])
    _sync(st.episode)
    compile_s = time.perf_counter() - t_c0
    ts = []
    for i in range(2 if quick else 3):
        t0 = time.perf_counter()
        st, _ = learner._train_step(st, batches[i % 2])
        _sync(st.episode.astype(jnp.float32))
        ts.append(time.perf_counter() - t0)
    t = float(np.median(ts))

    # Train MFU accounting — HAND-COUNTED dominant matmul FLOPs. XLA's
    # `compiled.cost_analysis()` is unusable for this program: it counts
    # each `lax.scan` BODY once, not x trip count, and this step nests two
    # scans (E-episode gradient accumulation x chunked encode) — it
    # reported 5.65 TFLOP where the analytic count is ~490 (measured here,
    # round 5). Count: per-frame ViT encoder matmul FLOPs x frames x
    # (fwd 1 + bwd 2 + the remat policy's fwd recompute); conv stem /
    # matching head / norms are <2% and excluded, so the number is a
    # slight UNDER-estimate of the chip's executed FLOPs.
    mfu = None
    arch = getattr(model, "arch", None)
    if arch is not None and arch.is_vit:
        D = arch.vision_width
        P = arch.vision_patch_size
        L = (224 // P) ** 2 + 1
        per_block = 12 * L * D * D + 2 * L * L * D            # MACs
        attn = 4 * L * D * D + 2 * L * L * D                  # qkv+scores+av+proj
        fwd = 2.0 * arch.vision_layers * per_block            # FLOPs/frame
        # backward ~2x fwd; remat recompute re-runs the chunk-body fwd
        # minus what the policy saved (visual.encode_chunked)
        policy = getattr(model, "train_remat_policy", "full")
        chunked = int(getattr(model, "train_encode_chunk", 0) or 0) > 0
        saved_share = {"full": 0.0,
                       "attn": (2 * L * L * D) / per_block,
                       "attn_out": attn / per_block,
                       "mlp": (attn + 4 * L * D * D) / per_block}
        recompute = (1.0 - saved_share.get(policy, 0.0)) if chunked else 0.0
        S_f = int(batches[0].support_images.shape[1])
        Q_f = int(batches[0].target_images.shape[1])
        T_f = int(batches[0].support_images.shape[2])
        frames = (S_f + Q_f) * T_f
        step_flops = E * frames * fwd * (3.0 + recompute)
        tflops = step_flops / t / 1e12
        peak = float(os.environ.get("BENCH_PEAK_TFLOPS", "197"))
        mfu = {"train_step_tflop": round(step_flops / 1e12, 1),
               "train_flops_factor": round(3.0 + recompute, 2),
               "train_achieved_tflops": round(tflops, 1),
               "train_mfu_pct": round(100.0 * tflops / peak, 1)}
    return E / t, compile_s, E, mfu


def _bench_cached_10k_subprocess(time_left):
    """The LITERAL published protocol, measured — not derived: 10,000
    episodes end-to-end through the shipped CLI (TEST.ONLY_TEST + the
    default-on TEST.CACHE_FEATURES) over a reference-scale on-disk test
    split (HMDB test = 1292 videos / 10 classes; reference
    configs/base.yaml:30 TEST_EPISODES=10000) at full production shape
    (ViT-B/16 5w5s1q, T=8, 224², 1300 unique videos).

    Runs in a FRESH subprocess BEFORE this process contacts the device,
    for two measured reasons (round 5): the axon tunnel is EXCLUSIVE — a
    second client hangs while the first holds it — and an in-process run
    after the other bench stages measures this process's accumulated HBM
    pressure, not the protocol (head stage: 14.2 eps/s in-process after
    all stages vs 2201 eps/s in a fresh process at identical shapes).
    A fresh CLI process is also the honest unit: it is exactly what a
    user runs. `cached_10k_protocol_measured_s` = plan + decode/encode +
    head from the CLI's own log line; `cached_10k_cli_wall_s` adds model
    build. The dataset is written once (host-only, no jax) and reused;
    the result is carried across a bench re-exec via BENCH_10K_RESULT."""
    import re as _re
    import shutil
    import subprocess

    prev = os.environ.get("BENCH_10K_RESULT")
    if prev:
        try:
            return json.loads(prev)
        except Exception:
            pass
    extras = {}
    try:
        here = os.path.dirname(os.path.abspath(__file__))
        sys.path.insert(0, os.path.join(here, "scripts"))
        from make_synthetic_dataset import make_dataset

        root = os.environ.get("BENCH_10K_ROOT", "/tmp/bench_10k_ds")
        marker = os.path.join(root, "hmdb_256x256q5_l8", "test",
                              "class09", "v129")
        if not os.path.isdir(marker):
            t_ds = time.perf_counter()
            make_dataset(root, classes=10, videos=6, test_videos=130,
                         frames=12, size=256, img_size=224, seq_len=8)
            extras["cached_10k_dataset_write_s"] = round(
                time.perf_counter() - t_ds, 1)
        ck = os.path.join(root, "ck10k")
        shutil.rmtree(ck, ignore_errors=True)
        n_eps = int(os.environ.get("BENCH_10K_EPISODES", "10000"))
        # a healthy run measures ~230-300 s CLI wall; a run that straddles
        # a tunnel-outage window stalls mid-protocol and completes only on
        # recovery (measured 741 s — which then starved the main stages'
        # own outage-retry budget and killed the whole record). Reserve
        # 650 s for the main stages + retry machinery; a sub-run that
        # cannot finish inside the remainder is a degraded-tunnel datum,
        # not a protocol number.
        budget = time_left() - 650.0
        timeout = min(900.0, max(300.0, budget))
        cmd = [sys.executable, "-m", "clipspm_tpu.cli.run",
               "--cfg", os.path.join(root, "tiny.yaml"),
               "--splits-root", root, "--allow-random-weights",
               f"CHECKPOINT.CHECKPOINT_DIR={ck}",
               "MODEL.BACKBONE=ViT-B/16", "USE_AMP=true",
               "TRAIN.WAY=5", "TRAIN.SHOT=5",
               "TEST.QUERY_PER_CLASS=1", "TEST.ONLY_TEST=true",
               f"TEST.TEST_EPISODES={n_eps}",
               "TEST.CACHE_FEATURES=true",
               "TEST.CACHE_ENCODE_VIDEOS=60",
               "TEST.CACHE_EVAL_BATCH=250",
               "DATA.IMG_SIZE=224", "DATA.SEQ_LEN=8",
               "DATA.NUM_WORKERS=8"]
        t0 = time.perf_counter()
        try:
            r = subprocess.run(cmd, cwd=here, timeout=timeout,
                               capture_output=True, text=True)
        except subprocess.TimeoutExpired:
            # a cold compile cache (fresh metal after a live migration)
            # can eat the whole window in compiles — but every jit that
            # FINISHED persisted its cache entry, so one immediate retry
            # skips straight past them. Bounded: only when the remaining
            # budget still covers a warm protocol run (~150 s CLI wall)
            # plus a reduced main-stage reserve; a second timeout is a
            # tunnel-outage datum and propagates as before.
            shutil.rmtree(ck, ignore_errors=True)
            retry = time_left() - 500.0
            if retry < 150.0:
                raise
            extras["cached_10k_cold_timeout_s"] = round(timeout, 1)
            print(f"[bench] 10k subprocess timed out after {timeout:.0f}s "
                  f"(cold cache?); one warm retry with {retry:.0f}s",
                  file=sys.stderr)
            t0 = time.perf_counter()
            r = subprocess.run(cmd, cwd=here, timeout=retry,
                               capture_output=True, text=True)
        cli_wall = time.perf_counter() - t0
        if r.returncode != 0:
            raise RuntimeError(
                f"CLI rc={r.returncode}: {(r.stderr or '')[-300:]}")
        with open(os.path.join(ck, "log.txt")) as f:
            logtxt = f.read()
        m = _re.search(
            r"feature-cached eval: (\d+) episodes over (\d+) unique "
            r"videos — plan ([\d.]+)s, encode ([\d.]+)s "
            r"\(([\d.]+) frames/s\), head ([\d.]+)s "
            r"\(([\d.]+) eps/s\)", logtxt)
        if m is None:
            raise RuntimeError("cached-eval line missing from CLI log")
        plan_s, enc_s, head_s = (float(m.group(3)), float(m.group(4)),
                                 float(m.group(6)))
        measured = plan_s + enc_s + head_s
        extras["cached_10k_protocol_measured_s"] = round(measured, 1)
        extras["cached_10k_measured_eps_per_sec"] = round(
            int(m.group(1)) / measured, 1)
        extras["cached_10k_unique_videos"] = int(m.group(2))
        extras["cached_10k_stage_plan_s"] = round(plan_s, 1)
        extras["cached_10k_stage_encode_s"] = round(enc_s, 1)
        extras["cached_10k_stage_encode_fps"] = round(float(m.group(5)), 1)
        extras["cached_10k_stage_head_s"] = round(head_s, 1)
        extras["cached_10k_stage_head_eps_per_sec"] = round(
            float(m.group(7)), 1)
        extras["cached_10k_cli_wall_s"] = round(cli_wall, 1)
        # build-phase decomposition (train/setup.py stage marks): the text
        # tables dominated the pre-fix build (1189 s of cold per-shape
        # text-tower compiles, measured round 5 — now one shared shape)
        for stage, key in [("model init", "build_model_init_s"),
                           ("CLIP tower init", "build_clip_init_s"),
                           ("text tables", "build_text_tables_s")]:
            sm = _re.search(
                rf"build_learner: {_re.escape(stage)} in ([\d.]+)s", logtxt)
            if sm:
                extras[f"cached_10k_{key}"] = float(sm.group(1))
        print(f"[bench] 10k protocol subprocess: measured {measured:.1f}s "
              f"(cli wall {cli_wall:.1f}s)", file=sys.stderr)
        try:  # keep the last good measurement for outage windows
            with open(os.path.join(root, "last_result.json"), "w") as f:
                json.dump(extras, f)
        except OSError:
            pass
    except Exception as e:  # pragma: no cover - depends on chip state
        extras["cached_10k_bench_error"] = f"{type(e).__name__}: {e}"[:200]
        print(f"[bench] 10k protocol subprocess failed: "
              f"{extras['cached_10k_bench_error']}", file=sys.stderr)
        try:
            # a failed attempt usually means the sub-run straddled a
            # tunnel-outage window; surface the round's PREVIOUS successful
            # measurement, explicitly labeled as such, so the record keeps
            # a measured protocol number next to the failure
            with open(os.path.join(root, "last_result.json")) as f:
                prev_ok = json.load(f)
            for k, v in prev_ok.items():
                extras[k.replace("cached_10k_", "cached_10k_prev_", 1)] = v
            extras["cached_10k_prev_note"] = (
                "previous successful measurement this round; the current "
                "attempt failed (see cached_10k_bench_error)")
        except Exception:
            pass
    sys.stderr.flush()
    os.environ["BENCH_10K_RESULT"] = json.dumps(extras)
    return extras


def bench_e2e(quick: bool):
    """Disk->device end-to-end eval: real JPEG dataset + threaded loader +
    native decoder + device transform + encode (reference eval loop:
    run/main_run.py:256-293 + video_reader.py:233-273). Reports eps/s
    *including* host I/O, so loader/compute overlap is a measured number."""
    from clipspm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import dataclasses

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "scripts"))
    from make_synthetic_dataset import make_dataset

    from clipspm_tpu.data.episode import stack_episodes
    from clipspm_tpu.data.pipeline import EpisodeLoader
    from clipspm_tpu.data.sampler import EpisodeSampler
    from clipspm_tpu.data.splits import load_split
    from clipspm_tpu.data.transforms import episode_device_transform
    from clipspm_tpu.models.backbones.clip import CLIP_ARCHS
    from clipspm_tpu.models.fsar import CLIPSPMModel
    from clipspm_tpu.utils.config import SPM_DEFAULT_PARAMS

    way, shot, queries, T, img = 5, 5, 1, 8, 224
    root = os.environ.get("BENCH_E2E_ROOT", "/tmp/bench_e2e_ds")
    if not os.path.exists(os.path.join(root, "hmdb_256x256q5_l8")):
        make_dataset(root, classes=8, videos=8, frames=12, size=256,
                     img_size=img, seq_len=T)
    catalog = load_split(os.path.join(root, "splits/hmdb_ARN"),
                         os.path.join(root, "hmdb_256x256q5_l8"),
                         "test", dataset="hmdb", seq_len=T)
    sampler = EpisodeSampler(catalog, way=way, shot=shot, queries=queries,
                             seq_len=T, train=False, seed=0)
    loader = EpisodeLoader(sampler, num_workers=8, prefetch=4)

    chunk = int(os.environ.get("BENCH_CHUNK", "30"))
    E = int(os.environ.get("BENCH_E", "8" if quick else "16"))
    arch = dataclasses.replace(CLIP_ARCHS["ViT-B/16"], fast_softmax=True,
                               bf16_norms=True)
    model = CLIPSPMModel(arch=arch, way=way, shot=shot,
                         spm=SPM_DEFAULT_PARAMS["hmdb"], dtype=jnp.bfloat16,
                         encode_chunk=chunk)
    S, Q, D = way * shot, way * queries, arch.embed_dim
    text = jax.random.normal(jax.random.PRNGKey(1), (16, D), jnp.bfloat16)
    key = jax.random.PRNGKey(2)

    def eval_one(variables, ep):
        sup = episode_device_transform(ep[0], key, train=False, img_size=img,
                                       resize_to=256, dtype=jnp.bfloat16)
        tgt = episode_device_transform(ep[1], key, train=False, img_size=img,
                                       resize_to=256, dtype=jnp.bfloat16)
        out = model.apply(variables, sup, tgt, ep[2], ep[3], ep[4],
                          text, text, train=False)
        return out["logits"]

    batched = jax.jit(lambda v, batch: jax.lax.map(
        lambda ep: eval_one(v, ep), batch))

    it = iter(loader)

    def next_batch():
        from clipspm_tpu.train.learner import device_put_chunked

        eps = [next(it) for _ in range(E)]
        b = stack_episodes(eps)
        return device_put_chunked(tuple(
            (b.support_images, b.target_images, b.support_labels,
             b.real_support_labels, b.real_target_labels)))

    # host-side decomposition: loader-only rate and tunnel H2D bandwidth
    # (on real TPU-VM hosts H2D is PCIe-speed; through the axon tunnel it is
    # the binding constraint — report it so the e2e number is interpretable)
    [next(it) for _ in range(8)]          # drain the prefetch queue
    t0 = time.perf_counter()
    raw = [next(it) for _ in range(E)]    # steady-state decode rate
    loader_eps = E / (time.perf_counter() - t0)
    from clipspm_tpu.data.episode import stack_episodes as _stack
    sb = _stack(raw)
    t0 = time.perf_counter()
    d = jax.device_put(np.asarray(sb.support_images))
    _sync(d[:, 0, 0, 0, 0, 0].astype(jnp.float32))
    h2d_mbps = sb.support_images.nbytes / 1e6 / (time.perf_counter() - t0)

    b0 = next_batch()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0),
                           jnp.zeros((S, T, img, img, 3), jnp.bfloat16),
                           jnp.zeros((Q, T, img, img, 3), jnp.bfloat16),
                           b0[2][0], b0[3][0], b0[4][0], text, text)
    _sync(batched(variables, b0))   # compile

    n_b = 3 if quick else 6
    # steady-state: loader prefetch threads fill while the device computes;
    # depth-1 pipeline (dispatch batch i+1 before syncing batch i) PLUS a
    # staging thread so episode assembly + H2D for batch i+1 overlaps the
    # host-side sync wait on batch i (through the tunnel the device_put is
    # host-blocking, so without the thread it serializes with decode). The
    # timed window contains the SAME number of host-staging cycles as
    # batches credited — crediting n_b+1 batches against n_b stagings would
    # overstate throughput by (n_b+1)/n_b when the host path is the
    # bottleneck.
    import concurrent.futures as cf

    stager = cf.ThreadPoolExecutor(max_workers=1)
    t0 = time.perf_counter()
    # exactly n_b+1 staging jobs inside the window, run serially by the
    # one staging thread, each overlapping the main thread's sync waits
    futs = [stager.submit(next_batch) for _ in range(n_b + 1)]
    pend = batched(variables, futs[0].result())
    for i in range(1, n_b + 1):
        nxt = batched(variables, futs[i].result())
        _sync(pend)
        pend = nxt
    _sync(pend)
    wall = time.perf_counter() - t0
    e2e_eps = (n_b + 1) * E / wall
    stager.shutdown(wait=False)
    loader.close()

    print(json.dumps({
        "metric": f"episodes/sec/chip (e2e disk->device, batched E={E})",
        "value": round(e2e_eps, 3),
        "unit": "episodes/s",
        "vs_baseline": None,
        "extras": {"eval_batch_E": E, "encode_chunk": chunk,
                   "includes": "JPEG decode + episode assembly + H2D + "
                               "transform + encode + head",
                   "loader_only_eps_per_sec": round(loader_eps, 3),
                   "h2d_MB_per_sec": round(h2d_mbps, 1),
                   "device": str(jax.devices()[0])},
    }))


def main():
    quick = "--quick" in sys.argv
    if "--e2e" in sys.argv:
        return bench_e2e(quick)
    # per-host cache path: a foreign host's CPU AOT artifacts under a shared
    # path poison every compile (clipspm_tpu/utils/cache.py)
    from clipspm_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    t_start = time.perf_counter()
    deadline = float(os.environ.get("BENCH_DEADLINE_S", "1200"))

    def time_left():
        if deadline <= 0:
            return float("inf")
        return deadline - (time.perf_counter() - t_start)

    # 10k-protocol stage FIRST, in a fresh subprocess, before this process
    # makes any device contact: the axon tunnel is exclusive (a second
    # client hangs while the first holds one), so the only window for a
    # clean-process measurement is before our own client exists.
    ten_k = {}
    arch_name = os.environ.get("BENCH_ARCH", "ViT-B/16")
    if (not quick and arch_name == "ViT-B/16"
            and os.environ.get("BENCH_CACHED_10K", "1") == "1"):
        if (os.environ.get("BENCH_10K_RESULT")   # carried over a re-exec:
                or time_left() > 650             # returns instantly
                or deadline <= 0):
            ten_k = _bench_cached_10k_subprocess(time_left)
        else:
            ten_k = {"cached_10k_skipped":
                     f"deadline ({time_left():.0f}s left)"}

    import jax
    import jax.numpy as jnp
    from clipspm_tpu.data import SyntheticEpisodeSource
    from clipspm_tpu.data.transforms import episode_device_transform
    from clipspm_tpu.models.backbones.clip import CLIP_ARCHS
    from clipspm_tpu.models.fsar import CLIPSPMModel
    from clipspm_tpu.utils.config import SPM_DEFAULT_PARAMS

    import dataclasses

    # first device contact, retried: a transient tunnel outage must delay
    # the bench, not erase the round's record (round-3 failure mode)
    try:
        _dev, n_attempts = _first_device_contact(time_left)
    except Exception as e:
        _emit_error_record(e, "TPU backend unavailable for the whole bench "
                              "window (bounded retry exhausted); no "
                              "throughput measured")
        # skip interpreter teardown: the wedged init thread's XLA client
        # aborts in its C++ destructor (observed rc=134 AFTER the terminal
        # record printed); the record is flushed, exit with a clean rc=1
        os._exit(1)
    if n_attempts > 1:
        print(f"[bench] backend up after {n_attempts} attempts",
              file=sys.stderr)

    way, shot, queries, T, img = 5, 5, 1, 8, 224
    # BENCH_ARCH=RN50 benches the reference's other headline backbone (the
    # CLIP ModifiedResNet tower); chunking defaults are ViT-measured, so
    # RN50 runs unchunked unless BENCH_CHUNK is set.
    is_vit = CLIP_ARCHS[arch_name].is_vit
    chunk = int(os.environ.get("BENCH_CHUNK", "30" if is_vit else "0"))
    E = int(os.environ.get("BENCH_E", "16" if quick else "32"))
    # fast_softmax: bf16 attention softmax (max-shifted), ~10% faster on v5e
    # bf16_norms: LayerNorms in bf16; encode_chunk: VMEM-resident encode
    arch = dataclasses.replace(CLIP_ARCHS[arch_name], fast_softmax=True,
                               bf16_norms=True)
    # train_encode_chunk: remat-chunked train encode caps backward peak HBM
    # (the unchunked 240-frame ViT-B/16 backward wants 44.9 G); identical
    # math for the ViT tower (no BN batch stats / dropout inside) — see
    # tests/test_train_encode_chunk.py. Width 40 is the measured train
    # optimum (eval's is 30). ViT-only: per-chunk BN batch statistics would
    # change RN50 training semantics.
    train_chunk = int(os.environ.get("BENCH_TRAIN_CHUNK",
                                     "40" if is_vit else "0"))
    # BENCH_REMAT picks the backward recompute policy for the chunked train
    # encode (see visual.encode_chunked). Default "attn_out" = production
    # default: saves the per-chunk attention outputs (~0.9 G) so the
    # backward skips the memory-bound qk^T+softmax recompute — measured
    # 3.744 vs 3.475 eps/s (+7.7%) over "full" at this step; "dots"
    # (~7.9 G) and "attn" at chunk>=80 OOM a 15.75 G v5e.
    remat = os.environ.get("BENCH_REMAT", "attn_out" if is_vit else "full")
    model = CLIPSPMModel(arch=arch, way=way, shot=shot,
                         spm=SPM_DEFAULT_PARAMS["hmdb"], dtype=jnp.bfloat16,
                         encode_chunk=chunk, train_encode_chunk=train_chunk,
                         train_remat_policy=remat)
    S, Q, D = way * shot, way * queries, arch.embed_dim

    rng = jax.random.PRNGKey(0)
    text = jax.random.normal(jax.random.PRNGKey(1), (16, D), jnp.bfloat16)
    dummy = (
        jnp.zeros((S, T, img, img, 3), jnp.bfloat16),
        jnp.zeros((Q, T, img, img, 3), jnp.bfloat16),
        jnp.arange(S, dtype=jnp.int32) % way,
        jnp.zeros((S,), jnp.int32),
        jnp.zeros((Q,), jnp.int32),
        text, text,
    )
    # jitted init: eager flax init is one tunnel round-trip per op
    variables = jax.jit(model.init)(rng, *dummy)

    @jax.jit
    def eval_episode(variables, sup_u8, tgt_u8, sup_labels, real_sup,
                     real_tgt, key):
        sup = episode_device_transform(sup_u8, key, train=False,
                                       img_size=img, resize_to=256,
                                       dtype=jnp.bfloat16)
        tgt = episode_device_transform(tgt_u8, key, train=False,
                                       img_size=img, resize_to=256,
                                       dtype=jnp.bfloat16)
        out = model.apply(variables, sup, tgt, sup_labels, real_sup,
                          real_tgt, text, text, train=False)
        return out["logits"]

    src = SyntheticEpisodeSource(way=way, shot=shot, queries=queries,
                                 seq_len=T, img_size=256, num_classes=16)
    n_staged = 4
    episodes = []
    for _ in range(n_staged):
        ep = src.sample()
        episodes.append(tuple(jax.device_put(x) for x in (
            ep.support_images, ep.target_images, ep.support_labels,
            ep.real_support_labels, ep.real_target_labels)))

    key = jax.random.PRNGKey(2)

    # -- production batched eval (lax.map over E episodes, one dispatch) -----
    # FIRST measurement and FIRST compile: the primary metric must hit stdout
    # before any slower optional stage can eat the external time budget.
    def _eval_one(variables, ep):
        return eval_episode(variables, *ep, key)

    batched = jax.jit(lambda v, batch: jax.lax.map(
        lambda ep: _eval_one(v, ep), batch))
    staged = [
        tuple(jax.device_put(jnp.stack(
            [episodes[(i + s) % n_staged][j] for i in range(E)]))
            for j in range(5))
        for s in range(2)]
    _sync(batched(variables, staged[0]))
    n_b = 2 if quick else 3
    t_b = _warm_median(batched, [(variables, st) for st in staged],
                       inner=n_b, blocks=2)
    batched_eps_per_sec = E / t_b

    frames_per_sec = batched_eps_per_sec * (S + Q) * T
    extras = {
        "frames_per_sec": round(frames_per_sec, 1),
        "eval_batch_E": E,
        "encode_chunk": chunk,
        "device": str(jax.devices()[0]),
    }
    extras.update(ten_k)   # measured 10k protocol (fresh-subprocess stage)

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "bench_baseline.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)["value"]
    elif arch_name == "ViT-B/16":
        # only the default backbone may seed the permanent baseline pin —
        # an RN50-class number would poison every later ViT vs_baseline
        baseline = batched_eps_per_sec
        with open(baseline_path, "w") as f:
            json.dump({"metric": "episodes/sec/chip", "value": baseline,
                       "recorded": time.strftime("%Y-%m-%d"),
                       "note": "first measured value; reference publishes "
                               "no throughput numbers"}, f)
    else:
        baseline = None

    result = {
        "metric": f"episodes/sec/chip (5w5s 8f {arch_name} eval, batched "
                  f"E={E})",
        "value": round(batched_eps_per_sec, 3),
        "unit": "episodes/s",
        # the baseline pin is the round-1 ViT-B/16 number; a non-default
        # arch is not comparable to it
        "vs_baseline": (round(batched_eps_per_sec / baseline, 3)
                        if arch_name == "ViT-B/16" else None),
        "extras": extras,
    }

    def emit():
        print(json.dumps(result))
        sys.stdout.flush()
        _PRIMARY_EMITTED[0] = True

    emit()   # primary metric is now on record whatever happens below

    def stage_fits(name, est_cold_s):
        """Skip a stage that could blow the wall-clock budget. est_cold_s is
        a conservative cold-compile estimate; with a warm persistent cache
        the stage costs a fraction of that, so when >60% of the budget is
        still unspent we let the stage try regardless."""
        left = time_left()
        if left > est_cold_s or left > 0.6 * deadline:
            return True
        extras[f"{name}_skipped"] = f"deadline ({left:.0f}s left)"
        return False

    # -- single-episode latency path (sync per call) -------------------------
    n_iters = 6 if quick else 15
    if os.environ.get("BENCH_SINGLE", "1") == "1" and stage_fits(
            "single_episode", 240):
        _sync(eval_episode(variables, *episodes[0], key))   # compile
        t_ep = _warm_median(eval_episode,
                            [(variables,) + episodes[i % n_staged] + (key,)
                             for i in range(n_staged)],
                            inner=n_iters, blocks=2)
        extras["single_episode_eps_per_sec"] = round(1.0 / t_ep, 3)
        extras["p50_episode_latency_ms"] = round(t_ep * 1e3, 2)
        emit()

    if os.environ.get("BENCH_TRAIN", "1") == "1":
        # never lose the eval numbers to a train-step failure (the shared
        # TPU occasionally throws transient RESOURCE_EXHAUSTED on the large
        # backward compile). The accumulated step runs FIRST — it is the
        # production train path and the number the record must carry.
        if stage_fits("train_accum", 420):
            try:
                acc_eps, acc_compile_s, acc_E, acc_mfu = _bench_train_accum(
                    jax, jnp, model, variables, episodes, n_staged, text,
                    quick)
                extras["train_accum_eps_per_sec"] = round(acc_eps, 3)
                extras["train_accum_E"] = acc_E
                extras["train_accum_compile_s"] = round(acc_compile_s, 1)
                if acc_mfu:
                    extras.update(acc_mfu)
            except Exception as e:  # pragma: no cover - chip state
                extras["train_accum_bench_error"] = (
                    f"{type(e).__name__}: {e}"[:200])
            emit()
        if os.environ.get("BENCH_TRAIN_SINGLE", "1") == "1" and stage_fits(
                "train_single", 360):
            try:
                train_eps, compile_s = _bench_train(
                    jax, jnp, model, variables, episodes, n_staged, text,
                    img, Q, key, n_iters)
                extras["train_eps_per_sec"] = round(train_eps, 3)
                extras["train_step_compile_s"] = round(compile_s, 1)
            except Exception as e:  # pragma: no cover - chip state
                extras["train_bench_error"] = f"{type(e).__name__}: {e}"[:200]
            emit()

    if is_vit and os.environ.get("BENCH_INT8", "1") == "1" and stage_fits(
            "int8", 300):
        # dynamic-int8 projection/MLP matmuls (MODEL.INT8_EVAL, opt-in in
        # production — accuracy on real checkpoints unvalidated here, see
        # README "Known limitations"): measured +19% E2E with 100% argmax
        # agreement vs bf16 on random weights. Same params drive both.
        try:
            q_model = CLIPSPMModel(
                arch=dataclasses.replace(arch, int8_eval=True),
                way=way, shot=shot, spm=SPM_DEFAULT_PARAMS["hmdb"],
                dtype=jnp.bfloat16, encode_chunk=chunk)

            def q_eval(v, sup_u8, tgt_u8, sl, rs, rt):
                sup = episode_device_transform(sup_u8, key, train=False,
                                               img_size=img, resize_to=256,
                                               dtype=jnp.bfloat16)
                tgt = episode_device_transform(tgt_u8, key, train=False,
                                               img_size=img, resize_to=256,
                                               dtype=jnp.bfloat16)
                return q_model.apply(v, sup, tgt, sl, rs, rt, text, text,
                                     train=False)["logits"]

            q_E = 16
            q_batched = jax.jit(lambda v, b: jax.lax.map(
                lambda ep: q_eval(v, *ep), b))
            q_staged = [
                tuple(jax.device_put(jnp.stack(
                    [episodes[(i + s) % n_staged][j] for i in range(q_E)]))
                    for j in range(5))
                for s in range(2)]
            _sync(q_batched(variables, q_staged[0]))
            t_q = _warm_median(q_batched,
                               [(variables, st) for st in q_staged],
                               inner=2, blocks=2)
            extras["int8_batched_eps_per_sec"] = round(q_E / t_q, 3)
        except Exception as e:  # pragma: no cover - depends on chip state
            extras["int8_bench_error"] = f"{type(e).__name__}: {e}"[:200]
        emit()

    if (arch_name == "ViT-B/16" and os.environ.get("BENCH_RN50", "1") == "1"
            and stage_fits("rn50", 300)):
        # also record the reference's other headline backbone in extras so
        # one bench artifact carries both flagships (RN50 runs unchunked by
        # design — see README "RN50 flagship"); eval only, quick protocol
        try:
            rn = dataclasses.replace(CLIP_ARCHS["RN50"], fast_softmax=True,
                                     bf16_norms=True)
            rn_model = CLIPSPMModel(arch=rn, way=way, shot=shot,
                                    spm=SPM_DEFAULT_PARAMS["hmdb"],
                                    dtype=jnp.bfloat16)
            rn_D = rn.embed_dim
            rn_text = jax.random.normal(jax.random.PRNGKey(1), (16, rn_D),
                                        jnp.bfloat16)
            rn_vars = jax.jit(rn_model.init)(
                rng, dummy[0], dummy[1], dummy[2], dummy[3], dummy[4],
                rn_text, rn_text)

            def rn_eval(v, sup_u8, tgt_u8, sl, rs, rt):
                sup = episode_device_transform(sup_u8, key, train=False,
                                               img_size=img, resize_to=256,
                                               dtype=jnp.bfloat16)
                tgt = episode_device_transform(tgt_u8, key, train=False,
                                               img_size=img, resize_to=256,
                                               dtype=jnp.bfloat16)
                return rn_model.apply(v, sup, tgt, sl, rs, rt, rn_text,
                                      rn_text, train=False)["logits"]

            rn_E = 16
            rn_batched = jax.jit(lambda v, b: jax.lax.map(
                lambda ep: rn_eval(v, *ep), b))
            rn_staged = [
                tuple(jax.device_put(jnp.stack(
                    [episodes[(i + s) % n_staged][j] for i in range(rn_E)]))
                    for j in range(5))
                for s in range(2)]
            _sync(rn_batched(rn_vars, rn_staged[0]))
            t_rn = _warm_median(rn_batched,
                                [(rn_vars, st) for st in rn_staged],
                                inner=2, blocks=2)
            extras["rn50_batched_eps_per_sec"] = round(rn_E / t_rn, 3)
        except Exception as e:  # pragma: no cover - depends on chip state
            extras["rn50_bench_error"] = f"{type(e).__name__}: {e}"[:200]
        emit()

    if os.environ.get("BENCH_CACHED", "1") == "1" and stage_fits(
            "cached_eval", 240):
        # unique-video feature-cache eval (TEST.CACHE_FEATURES,
        # train/feature_cache.py): the published 10k-episode protocol
        # resamples a small unique test-video set, so each video's
        # (deterministic) eval features are encoded ONCE into a device
        # table and the head runs over table gathers. This stage measures
        # both halves on synthetic in-memory frames: the one-time table
        # build for V unique videos and the steady-state head rate, then
        # derives the full-protocol e2e rate for the config default
        # TEST_EPISODES=10000 (disk decode is a host-side one-time cost on
        # top — measured live: 120-video table in 24.1 s through this
        # tunnel, README "Feature-cached evaluation").
        try:
            V = int(os.environ.get("BENCH_CACHED_VIDEOS", "120"))
            enc_B = 30   # videos per encode dispatch (TEST.CACHE_ENCODE_VIDEOS)
            c_E = 16 if quick else 64   # episodes per head dispatch

            def encode_batch(v, clips_u8):
                x = episode_device_transform(clips_u8, key, train=False,
                                             img_size=img, resize_to=256,
                                             dtype=jnp.bfloat16)
                return model.apply(v, x, train=False, method="encode")

            encode_batch = jax.jit(encode_batch)
            rng_np = np.random.default_rng(0)
            bank = [rng_np.integers(0, 255, (enc_B, T, 256, 256, 3),
                                    dtype=np.uint8)
                    for _ in range(-(-V // enc_B))]
            _sync(encode_batch(variables, jax.device_put(bank[0])))  # compile
            t0 = time.perf_counter()
            rows = [encode_batch(variables, jax.device_put(b)) for b in bank]
            table = jnp.concatenate(rows, axis=0)[:V]
            table.block_until_ready()
            t_table = time.perf_counter() - t0

            def head_one(v, tb, si, qi, sl, rs, rt):
                su = jnp.take(tb, si, axis=0)
                qu = jnp.take(tb, qi, axis=0)
                return model.apply(v, su, qu, sl, rs, rt, text, text,
                                   train=False,
                                   method="match_features")["logits"]

            head_batched = jax.jit(lambda v, tb, b: jax.lax.map(
                lambda ep: head_one(v, tb, *ep), b))

            def plan_batch(seed):
                g = np.random.default_rng(seed)
                si = np.stack([g.permutation(V)[:S] for _ in range(c_E)])
                qi = np.stack([g.permutation(V)[:Q] for _ in range(c_E)])
                sl = np.tile(np.arange(S, dtype=np.int32) % way, (c_E, 1))
                rs = g.integers(0, 16, (c_E, S), dtype=np.int64)
                rt = g.integers(0, 16, (c_E, Q), dtype=np.int64)
                return tuple(jax.device_put(a.astype(np.int32))
                             for a in (si, qi, sl, rs, rt))

            c_staged = [plan_batch(s) for s in range(2)]
            _sync(head_batched(variables, table, c_staged[0]))   # compile
            t_h = _warm_median(head_batched,
                               [(variables, table, st) for st in c_staged],
                               inner=2, blocks=2)
            head_eps = c_E / t_h
            n_proto = 10000   # config default TEST.TEST_EPISODES
            extras["cached_head_eps_per_sec"] = round(head_eps, 1)
            extras["cached_table_videos"] = V
            extras["cached_table_encode_s"] = round(t_table, 2)
            extras["cached_10k_protocol_eps_per_sec"] = round(
                n_proto / (t_table + n_proto / head_eps), 1)
        except Exception as e:  # pragma: no cover - depends on chip state
            extras["cached_bench_error"] = f"{type(e).__name__}: {e}"[:200]
        emit()

    extras["bench_wall_s"] = round(time.perf_counter() - t_start, 1)
    emit()   # final merged record (last JSON line of the tail)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # pragma: no cover - environment failures
        if _PRIMARY_EMITTED[0]:
            # a valid primary record is already on stdout — never shadow it
            # with an error line (consumers take the last JSON line)
            import traceback

            traceback.print_exc(file=sys.stderr)
        else:
            _emit_error_record(
                e, "bench died before the primary measurement; see the "
                   "stderr tail for the traceback")
        sys.exit(1)
