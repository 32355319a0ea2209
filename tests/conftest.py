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

jax.config.update("jax_enable_x64", False)
