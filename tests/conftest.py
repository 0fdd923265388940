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


import pytest


@pytest.fixture(autouse=True, scope="module")
def _bound_jit_cache():
    """Clear jax's compiled-executable caches after each test module.

    One long pytest process accumulates hundreds of compiled frame
    programs; past ~400 tests the in-process XLA CPU compiler degrades
    pathologically (a compile that takes 11 s in a fresh process was
    observed stuck >20 min). Bounding the cache per module keeps compile
    behavior flat for the whole suite at the cost of cross-module
    recompiles (modules rarely share scene shapes anyway).
    """
    yield
    jax.clear_caches()
