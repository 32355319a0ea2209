"""Per-host JAX compilation-cache directory.

The persistent compilation cache stores CPU AOT executables compiled for the
exact CPU feature set of the *writing* host, but its cache key does NOT
include those features. A cache written on one machine therefore poisons a
different machine: every lookup hits, the AOT load fails ("Machine type used
for XLA:CPU compilation doesn't match the machine type for execution" error
spam from cpu_aot_loader), XLA recompiles from scratch anyway — so the cache
never warms and cold-compile costs recur forever (observed: the 22-min CPU
test suite blowing a 40-min budget after a host migration left a foreign
cache at the shared /tmp path). Keying the directory by a host CPU
fingerprint gives each distinct machine its own warm cache.

TPU (tunneled-backend) executables have no such problem — they are compiled
for the TPU, not the host — but sharing the directory costs nothing beyond a
one-time re-warm per new host.
"""

from __future__ import annotations

import hashlib
import os
import platform


def host_fingerprint() -> str:
    """Short stable id of this host's CPU feature set."""
    bits = [platform.machine(), platform.system()]
    # x86 'flags' / arm64 'Features' — the set the AOT loader validates
    # against — plus the CPU identity lines (family/model/stepping/name):
    # LLVM's host detection keys on these, so two hosts with identical
    # cpuinfo flags can still produce incompatible AOT entries (observed
    # on migrated VMs: one foreign entry spamming "machine type ...
    # doesn't match" into every run that touched it)
    want = ("flags", "Features", "model name", "cpu family", "model\t",
            "model ", "stepping", "vendor_id")
    try:
        seen = set()
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":")[0].strip()
                if key not in seen and line.startswith(want):
                    bits.append(line.strip())
                    seen.add(key)
                if line.strip() == "":  # first core's block is enough
                    break
    except OSError:
        bits.append(platform.processor() or "")
    # cpuinfo is not enough: XLA tunes its LLVM target by kernel-reported
    # mitigation state too (e.g. +prefer-no-gather/-scatter on
    # Downfall-affected hosts), so two hosts with byte-identical cpuinfo
    # blocks can still write mutually-unloadable AOT entries (observed:
    # "gather_data_sampling: Not affected" here vs a mitigated twin VM
    # spamming machine-type mismatches from the shared dir)
    vuln_dir = "/sys/devices/system/cpu/vulnerabilities"
    try:
        for name in sorted(os.listdir(vuln_dir)):
            try:
                with open(os.path.join(vuln_dir, name)) as f:
                    bits.append(f"{name}:{f.read().strip()}")
            except OSError:
                pass
    except OSError:
        pass
    return hashlib.md5("|".join(bits).encode()).hexdigest()[:10]


def compilation_cache_dir(base: str = "/tmp/jax_cache") -> str:
    """The per-host cache path (explicit ``$JAX_COMPILATION_CACHE_DIR``
    wins — a user pinning a path knows their fleet)."""
    return (os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or f"{base}-{host_fingerprint()}")


def enable_compilation_cache() -> str:
    """Point jax at the per-host cache; exported to the environment so
    subprocesses (retry re-execs, dryrun children) inherit the same path.
    Safe to call before or after backend init."""
    path = compilation_cache_dir()
    os.environ["JAX_COMPILATION_CACHE_DIR"] = path
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
    except Exception:
        pass
    return path
