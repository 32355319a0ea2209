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

Expected on a healthy platform: "gb_per_step" ~0 in every arm.
Leak signature: gb_per_step ~= tree size with donation on, ~0 with it off.
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
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

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
