"""Test configuration.

All tests run on CPU with 8 virtual devices (SURVEY §4: multi-device tests
via --xla_force_host_platform_device_count) and 64-bit mode enabled — the
reference's FLOAT default is double (include/common.h).

NOTE: this image registers the 'axon' TPU plugin from sitecustomize at
interpreter startup and pins jax_platforms=axon, overriding the
JAX_PLATFORMS env var; the jax.config update below is the only reliable
way to force CPU.  Only one JAX process may use the TPU tunnel at a time —
never run tests concurrently with a bench on the real chip.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
