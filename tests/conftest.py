"""Test config: force an 8-device virtual CPU mesh so tests run fast anywhere.

The axon TPU plugin ignores the JAX_PLATFORMS env var in this image, so we set
the config flag programmatically before any test imports jax modules, plus the
XLA host-device-count flag for sharding tests.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
