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

# Compile-heavy modules (full frame programs / Pallas kernels / golden-image
# comparisons — the long tail of the 46-min full suite). Everything else is
# marked `fast`: `python -m pytest -m fast` is the CI-style run (<15 min)
# without dropping object-model/API coverage; `-m slow` runs the rest.
_SLOW_MODULES = {
    "test_raster_parity", "test_integration_capstone", "test_soak",
    "test_api_fuzz", "test_pallas_ordered", "test_pallas_peel",
    "test_pallas_reduce", "test_pallas_tiled", "test_tiled_raster",
    "test_ordered_tiled", "test_tile_sharding", "test_context_batching",
    "test_transparent_order", "test_antialias", "test_channels",
    "test_chunk_cull", "test_end_to_end", "test_frame_window",
    "test_graft_entry", "test_cubemap", "test_material_effects",
    "test_texgen", "test_mipmaps", "test_pixel_shader",
    "test_vertex_shader", "test_serialization", "test_animation",
    "test_patchmesh", "test_peel_correction", "test_atest_pregate",
    "test_clip_planes", "test_fog_modes", "test_lighting_model",
    "test_scene_structure", "test_2d_overlay", "test_robustness",
    "test_draw_kinds", "test_portal_traversal",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        item.add_marker("slow" if mod in _SLOW_MODULES else "fast")


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
