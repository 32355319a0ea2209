"""Per-host compilation-cache directory (clipspm_tpu/utils/cache.py).

The cache key must distinguish hosts whose CPU *identity* differs even when
the cpuinfo feature flags match — LLVM's host detection keys on
family/model/stepping, and a foreign AOT entry poisons every run that
touches it ("machine type ... doesn't match" + permanent cold compiles).
"""

import os

from clipspm_tpu.utils.cache import compilation_cache_dir, host_fingerprint


def test_fingerprint_stable_and_short():
    a, b = host_fingerprint(), host_fingerprint()
    assert a == b
    assert len(a) == 10
    assert all(c in "0123456789abcdef" for c in a)


def test_cache_dir_uses_fingerprint(monkeypatch):
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    assert compilation_cache_dir() == f"/tmp/jax_cache-{host_fingerprint()}"
    assert compilation_cache_dir("/x/y") == f"/x/y-{host_fingerprint()}"


def test_explicit_env_wins(monkeypatch):
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "/pinned/cache")
    assert compilation_cache_dir() == "/pinned/cache"


def test_fingerprint_covers_cpu_identity(monkeypatch):
    """Two hosts that differ only in CPU identity lines (same flags) must
    hash differently — the observed foreign-AOT failure mode."""
    import clipspm_tpu.utils.cache as cache_mod

    base = ("processor\t: 0\n"
            "vendor_id\t: GenuineIntel\n"
            "cpu family\t: 6\n"
            "model\t\t: {model}\n"
            "model name\t: Intel(R) Xeon(R) Processor @ 2.10GHz\n"
            "stepping\t: {stepping}\n"
            "flags\t\t: fpu vme de pse avx2 avx512f amx-tile\n"
            "\n")

    import builtins
    import io

    real_open = builtins.open

    def fake_open_factory(text):
        def fake_open(path, *a, **k):
            if path == "/proc/cpuinfo":
                return io.StringIO(text)
            return real_open(path, *a, **k)
        return fake_open

    monkeypatch.setattr(builtins, "open",
                        fake_open_factory(base.format(model=85, stepping=4)))
    fp_skylake = cache_mod.host_fingerprint()
    monkeypatch.setattr(builtins, "open",
                        fake_open_factory(base.format(model=143, stepping=8)))
    fp_spr = cache_mod.host_fingerprint()
    assert fp_skylake != fp_spr


def test_cpuid_words_live_and_deterministic():
    """On x86_64 the shim must execute and return stable, core-independent
    words (per-core APIC id masked); elsewhere it must return []."""
    import platform

    from clipspm_tpu.utils.cache import _cpuid_words

    a, b = _cpuid_words(), _cpuid_words()
    assert a == b
    if platform.machine() == "x86_64":
        assert a, "CPUID shim failed on x86_64"
        leaves = [(leaf, sub) for leaf, sub, _ in a]
        assert (0, 0) in leaves and (1, 0) in leaves and (7, 0) in leaves
        regs1 = dict(((l, s), r) for l, s, r in a)[(1, 0)]
        assert regs1[1] >> 24 == 0, "per-core APIC id leaked into leaf 1 EBX"


def test_fingerprint_covers_live_cpuid(monkeypatch):
    """A live-migrated guest keeps boot-frozen /proc + /sys while the
    metal's CPUID changes underneath — the fingerprint must change with the
    CPUID words alone (the observed same-boot foreign-AOT failure mode)."""
    import clipspm_tpu.utils.cache as cache_mod

    monkeypatch.setattr(
        cache_mod, "_cpuid_words",
        lambda: [(7, 0, [2, 0xF1BF2FFB, 0x1A415F46, 0xAFC14410])])
    fp_metal_a = cache_mod.host_fingerprint()
    monkeypatch.setattr(
        cache_mod, "_cpuid_words",
        lambda: [(7, 0, [2, 0xF1BF2FFB, 0x1A415F46, 0xAFC10410])])
    fp_metal_b = cache_mod.host_fingerprint()
    assert fp_metal_a != fp_metal_b
