"""Test harness: force an 8-virtual-device CPU mesh before JAX imports.

All tests run on the CPU backend so they are hermetic and fast; multi-chip
sharding is validated on 8 virtual host devices
(``--xla_force_host_platform_device_count=8``).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# /root/.axon_site/sitecustomize.py force-sets jax_platforms="axon,cpu"
# (remote TPU tunnel first); tests must be hermetic + local.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# compile times dominate on shared CPU runners; persist compiled executables
# per-host cache path: a foreign host's CPU AOT artifacts under a shared
# path poison every compile (clipspm_tpu/utils/cache.py)
from clipspm_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
