"""Test configuration.

All tests run on CPU with 8 virtual devices (SURVEY §4: multi-device tests
via --xla_force_host_platform_device_count) and 64-bit mode enabled — the
reference's FLOAT default is double (include/common.h).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
