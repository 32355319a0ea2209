"""Minimal, self-contained reproducer for the donated-buffer host-RSS leak.

``jax.jit(step, donate_argnums=(0,))`` marks the input tree's buffers as
donated: the runtime may alias the outputs onto them and MUST free whatever
it does not reuse. On a backend that honors the hint, host RSS stays flat
while stepping. On the tunneled remote TPU backend used to develop
clipspm_tpu, each donated step leaked host memory equal to roughly the
donated tree's size (~1.4 G/step at production scale) until the host OOM'd
— consistent with the tunnel client pinning a host copy of every
donation-marked input and never releasing it. That leak is why
``SOLVER.DONATE_STATE`` ships default-off (see DESIGN.md and
scripts/donation_check.py for the production-shaped gate).

This file has NO clipspm_tpu imports — hand it to the backend owners as-is.

Usage:
    python scripts/donation_repro.py                 # default device, 256 MB
    python scripts/donation_repro.py --mb 1024 --steps 12
    python scripts/donation_repro.py --no-donate     # control arm A
    python scripts/donation_repro.py --cpu           # control arm B (local)
    python scripts/donation_repro.py --h2d           # arm C: fresh H2D/step

Expected on a healthy platform: "gb_per_step" ~0 in every arm.
Leak signature: gb_per_step ~= tree size with donation on, ~0 with it off.

Arm C (``--h2d``) probes a second, independent leak the donation arms
cannot see: each step transfers a FRESH host array to the device (the
shape of a training loop staging a new episode batch every step — no
donation anywhere), consumes it, and drops every reference. A healthy
runtime frees both the host staging copy and the device buffer; the
tunneled backend observed during clipspm_tpu's production convergence
runs grew host RSS by ~the transferred bytes per step (donation OFF),
which this arm isolates without any model code.
"""

from __future__ import annotations

import argparse
import json
import time


def rss_gb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1e6
    return -1.0


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mb", type=int, default=256,
                   help="approximate donated-tree size in MB")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--no-donate", action="store_true",
                   help="control arm: same step without donation")
    p.add_argument("--cpu", action="store_true",
                   help="pin the local CPU backend (donation is honored "
                        "there; expect a flat RSS)")
    p.add_argument("--h2d", action="store_true",
                   help="arm C: no donation at all — device_put a fresh "
                        "host array every step and drop it (isolates a "
                        "transfer-staging leak)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    if args.h2d:
        import numpy as np

        nbytes = args.mb << 20
        host = np.random.randint(0, 255, (args.mb, 1 << 20), np.uint8)
        reduce_fn = jax.jit(lambda x: x[::4096, ::4096].astype(jnp.float32)
                            .sum())
        d = jax.device_put(host)            # warm transfer + compile
        float(reduce_fn(d)); del d
        r0, t0 = rss_gb(), time.perf_counter()
        print(json.dumps({"device": str(jax.devices()[0]), "arm": "h2d",
                          "transfer_gb": round(nbytes / 1e9, 3),
                          "steps": args.steps}), flush=True)
        for i in range(args.steps):
            host[i % args.mb, 0] ^= 1       # defeat any content dedup
            d = jax.device_put(host)
            float(reduce_fn(d))             # sync: transfer fully consumed
            del d
            print(json.dumps({"step": i + 1,
                              "rss_gb": round(rss_gb(), 3)}), flush=True)
        wall = time.perf_counter() - t0
        r1 = rss_gb()
        gb_per_step = (r1 - r0) / args.steps
        print(json.dumps({
            "arm": "h2d", "rss_start_gb": round(r0, 3),
            "rss_end_gb": round(r1, 3),
            "gb_per_step": round(gb_per_step, 4),
            "s_per_step": round(wall / args.steps, 4),
            "verdict": ("LEAK: per-step RSS growth ~ transferred bytes"
                        if gb_per_step > max(0.05, 0.5 * nbytes / 1e9)
                        else "flat: H2D staging is freed on this platform"),
        }), flush=True)
        return

    donate = not args.no_donate
    # a handful of leaves so the aliasing path matches a real params tree,
    # not one giant array
    n_leaves = 8
    elems = args.mb * (1 << 20) // 4 // n_leaves
    side = max(128, int(elems ** 0.5))
    tree = {f"w{i}": jnp.full((side, side), float(i + 1), jnp.float32)
            for i in range(n_leaves)}
    tree_gb = sum(x.size * 4 for x in tree.values()) / 1e9

    def step_fn(t):
        # shape/dtype-preserving update so outputs CAN alias inputs
        return jax.tree.map(lambda x: x * 1.000001 + 1e-7, t)

    step = jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    dev = jax.devices()[0]
    print(json.dumps({"device": str(dev), "donate": donate,
                      "tree_gb": round(tree_gb, 3), "steps": args.steps}),
          flush=True)

    tree = step(tree)                       # compile + first step
    float(tree["w0"].sum())                 # true sync through the tunnel
    r0 = rss_gb()
    t0 = time.perf_counter()
    for i in range(args.steps):
        tree = step(tree)
        float(tree["w0"].sum())
        print(json.dumps({"step": i + 1, "rss_gb": round(rss_gb(), 3)}),
              flush=True)
    wall = time.perf_counter() - t0
    r1 = rss_gb()
    gb_per_step = (r1 - r0) / args.steps
    print(json.dumps({
        "arm": "donate" if donate else "no_donate",
        "rss_start_gb": round(r0, 3),
        "rss_end_gb": round(r1, 3),
        "gb_per_step": round(gb_per_step, 4),
        "s_per_step": round(wall / args.steps, 4),
        "verdict": ("LEAK: per-step RSS growth ~ donated tree size"
                    if gb_per_step > max(0.05, 0.5 * tree_gb)
                    else "flat: donation is honored on this platform"),
    }), flush=True)


if __name__ == "__main__":
    main()
