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

/proc/cpuinfo and /sys are NOT sufficient fingerprint inputs on virtualized
hosts: both are boot-time snapshots of the guest kernel, while LLVM detects
host features via *live CPUID* at compile time. A live-migrated guest (no
reboot, files unchanged) can land on metal whose CPUID differs — observed
here: AOT entries written at 09:57 failed to load at 12:12 within one boot
(+prefer-no-gather/-scatter target mismatch). The fingerprint therefore also
executes CPUID directly (same source LLVM uses) via a tiny mmap'd shim.
"""

from __future__ import annotations

import hashlib
import os
import platform


def _cpuid_words():
    """Live CPUID feature words (x86_64 only; [] elsewhere or on failure).

    Executes the CPUID instruction in-process via a 24-byte mmap'd shim —
    the only host-feature source that tracks live migration (guest /proc
    and /sys are frozen at boot). Per-core-variable fields (initial APIC id
    in leaf 1 EBX[31:24]) are masked so the result is core-independent.

    Constraint: the shim maps one PROT_WRITE|PROT_EXEC page. Hardened hosts
    that *deny* W^X mappings (PaX/SELinux execmem → mmap fails with
    EPERM/EACCES) fall through the ``except`` to the fileless fingerprint;
    a seccomp policy that KILLS on such mmaps instead would terminate the
    process — on such fleets pin ``$JAX_COMPILATION_CACHE_DIR`` explicitly,
    which bypasses fingerprinting entirely (see compilation_cache_dir).

    The reads are pinned to one CPU for their duration: on heterogeneous
    (hybrid P/E-core) hosts leaves 1/7/0xD can differ per core type, and an
    unpinned thread would fingerprint whichever core it happened to be
    scheduled on — fragmenting the cache run-to-run.
    """
    if platform.machine() != "x86_64":
        return []
    prev_affinity = None
    try:
        allowed = sorted(os.sched_getaffinity(0))
        if len(allowed) > 1:
            prev_affinity = set(allowed)
            os.sched_setaffinity(0, {allowed[0]})
    except (AttributeError, OSError):
        prev_affinity = None
    try:
        import ctypes
        import mmap

        # void cpuid(uint32 leaf /*edi*/, uint32 sub /*esi*/, uint32* out /*rdx*/)
        code = bytes([
            0x53,                     # push rbx (callee-saved, cpuid clobbers)
            0x89, 0xF8,               # mov eax, edi
            0x89, 0xF1,               # mov ecx, esi
            0x49, 0x89, 0xD0,         # mov r8, rdx
            0x0F, 0xA2,               # cpuid
            0x41, 0x89, 0x00,         # mov [r8], eax
            0x41, 0x89, 0x58, 0x04,   # mov [r8+4], ebx
            0x41, 0x89, 0x48, 0x08,   # mov [r8+8], ecx
            0x41, 0x89, 0x50, 0x0C,   # mov [r8+12], edx
            0x5B,                     # pop rbx
            0xC3,                     # ret
        ])
        buf = mmap.mmap(-1, len(code),
                        prot=mmap.PROT_READ | mmap.PROT_WRITE | mmap.PROT_EXEC)
        buf.write(code)
        fn = ctypes.CFUNCTYPE(
            None, ctypes.c_uint32, ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_uint32 * 4))(
            ctypes.addressof(ctypes.c_char.from_buffer(buf)))
        out = (ctypes.c_uint32 * 4)()

        def cpuid(leaf, sub=0):
            fn(leaf, sub, ctypes.byref(out))
            return list(out)

        words = []
        max_basic = cpuid(0)[0]
        # the leaves LLVM's getHostCPUInfo/Features reads: vendor+max (0),
        # family/model/stepping + base features (1), structured extended
        # features (7.0/7.1/7.2), xsave state (0xD.0/0xD.1), AMD/extended
        # features (0x80000001, 0x80000008)
        for leaf, sub in ((0, 0), (1, 0), (7, 0), (7, 1), (7, 2),
                          (0xD, 0), (0xD, 1)):
            if leaf > max_basic:
                continue
            regs = cpuid(leaf, sub)
            if leaf == 1:
                regs[1] &= 0x00FFFFFF  # drop per-core initial APIC id
            words.append((leaf, sub, regs))
        max_ext = cpuid(0x80000000)[0]
        for leaf in (0x80000001, 0x80000008):
            if leaf <= max_ext:
                words.append((leaf, 0, cpuid(leaf)))
        del fn  # release the buffer reference before the mmap closes
        return words
    except Exception:
        return []
    finally:
        if prev_affinity is not None:
            try:
                os.sched_setaffinity(0, prev_affinity)
            except OSError:
                pass


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
    # ... and the files are not enough either: a live-migrated guest keeps
    # its boot-time /proc + /sys while the metal's CPUID changes underneath
    # (see module docstring). Hash the live CPUID words LLVM actually reads.
    for leaf, sub, regs in _cpuid_words():
        bits.append("cpuid:%x.%x:%08x,%08x,%08x,%08x" % (leaf, sub, *regs))
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
