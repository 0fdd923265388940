"""Tile-binned rasterizer parity: the tiled visibility solve must match the
flat deferred reduce pixel-for-pixel (same winner ids / depths)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ckrenderengine_tpu.raster import deferred as df
from ckrenderengine_tpu.raster.tiled import depth_reduce_tiled
from ckrenderengine_tpu.raster.types import RasterState, pack_states


def _random_batch(t, h, w, seed=0, big_frac=0.1):
    rng = np.random.default_rng(seed)
    # screen-space triangles as homogeneous (x*w', y*w', w')
    centers = rng.uniform([0, 0], [w, h], (t, 2)).astype(np.float32)
    sizes = rng.uniform(2, 25, (t, 1)).astype(np.float32)
    big = rng.random(t) < big_frac
    sizes[big] = rng.uniform(100, 400, (big.sum(), 1)).astype(np.float32)
    offs = rng.normal(0, 1, (t, 3, 2)).astype(np.float32)
    pts = centers[:, None] + offs * sizes[:, None]
    ws = rng.uniform(0.5, 4.0, (t, 3, 1)).astype(np.float32)
    xyw = np.concatenate([pts * ws, ws], axis=-1)
    z = rng.uniform(0.05, 0.95, (t, 3)).astype(np.float32)
    valid = np.ones(t, bool)
    state_idx = np.zeros(t, np.int32)
    return (jnp.asarray(xyw), jnp.asarray(z), jnp.asarray(state_idx),
            jnp.asarray(valid))


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("hw", [(64, 64), (48, 80)])
def test_tiled_matches_flat(seed, hw):
    h, w = hw
    t = 300
    xyw, z, state_idx, valid = _random_batch(t, h, w, seed)
    si, sf = pack_states([RasterState()])
    setup = df.triangle_setup(xyw, z, state_idx, valid, jnp.asarray(si))
    defer = jnp.ones(t, bool)
    viewport = jnp.asarray([0, 0, w, h], jnp.float32)

    bi_flat, bd_flat = df.depth_reduce(setup, defer, 1.0, viewport, h, w)
    bi_tiled, bd_tiled, peak = depth_reduce_tiled(
        setup, defer, 1.0, viewport, xyw, h, w, tile=16, max_span=36)
    assert int(peak) > 0
    np.testing.assert_array_equal(np.asarray(bi_tiled), np.asarray(bi_flat))
    np.testing.assert_allclose(np.asarray(bd_tiled), np.asarray(bd_flat),
                               atol=1e-6)


def _run_both(xyw, z, h, w, tile=16, max_span=36):
    t = xyw.shape[0]
    si, sf = pack_states([RasterState()])
    setup = df.triangle_setup(xyw, z, jnp.zeros(t, jnp.int32),
                              jnp.ones(t, bool), jnp.asarray(si))
    defer = jnp.ones(t, bool)
    viewport = jnp.asarray([0, 0, w, h], jnp.float32)
    bi_flat, bd_flat = df.depth_reduce(setup, defer, 1.0, viewport, h, w)
    bi_t, bd_t, peak = depth_reduce_tiled(
        setup, defer, 1.0, viewport, jnp.asarray(xyw), h, w, tile=tile,
        max_span=max_span)
    return bi_flat, bd_flat, bi_t, bd_t, int(peak)


def test_dense_tile_exceeding_old_cap_is_exact():
    """800 triangles stacked inside ONE 16x16 tile (way past round-1's
    k_per_tile=512 static cap): the streaming reduce must keep them ALL —
    including the back-most — pixel-equal to the flat oracle."""
    rng = np.random.default_rng(7)
    t = 800
    h = w = 64
    # All triangles inside tile (1,1): pixels [16,32) x [16,32).
    centers = rng.uniform(18, 30, (t, 2)).astype(np.float32)
    offs = rng.normal(0, 1, (t, 3, 2)).astype(np.float32)
    pts = centers[:, None] + offs * 3.0
    pts = np.clip(pts, 16.5, 31.5)          # stay inside the tile
    # consistent winding so none get backface-rejected before binning
    e1 = pts[:, 1] - pts[:, 0]
    e2 = pts[:, 2] - pts[:, 0]
    flip = (e1[:, 0] * e2[:, 1] - e1[:, 1] * e2[:, 0]) < 0
    pts[flip] = pts[flip][:, ::-1]
    ws = np.ones((t, 3, 1), np.float32)
    xyw = np.concatenate([pts * ws, ws], axis=-1)
    # Depth strictly increasing with id: the back-most (highest-z) triangles
    # are exactly the ones a top-K truncation would have dropped.
    z = np.linspace(0.05, 0.95, t).astype(np.float32)[:, None].repeat(3, 1)
    bi_f, bd_f, bi_t, bd_t, peak = _run_both(xyw, z, h, w)
    assert peak > 512                        # past round-1's static cap
    np.testing.assert_array_equal(np.asarray(bi_t), np.asarray(bi_f))
    # Winner ids are exactly equal; depths may differ by FMA-contraction
    # noise between the two differently-fused XLA graphs (observed 1.6e-6).
    np.testing.assert_allclose(np.asarray(bd_t), np.asarray(bd_f), atol=4e-6)
    # the farthest triangles must still be visible where nothing covers them
    assert (np.asarray(bi_t) >= 0).sum() > 0


def test_many_global_triangles_exceeding_old_gcap():
    """150 screen-spanning triangles (every one lands in the global bin —
    past round-1's g_cap=64 truncation): exact vs the flat oracle."""
    rng = np.random.default_rng(11)
    t = 150
    h = w = 48
    centers = rng.uniform([0, 0], [w, h], (t, 2)).astype(np.float32)
    offs = rng.normal(0, 1, (t, 3, 2)).astype(np.float32)
    pts = centers[:, None] + offs * 200.0    # huge -> span > max_span tiles
    ws = np.ones((t, 3, 1), np.float32)
    xyw = np.concatenate([pts * ws, ws], axis=-1)
    z = rng.uniform(0.05, 0.95, (t, 3)).astype(np.float32)
    bi_f, bd_f, bi_t, bd_t, _ = _run_both(xyw, z, h, w, max_span=4)
    np.testing.assert_array_equal(np.asarray(bi_t), np.asarray(bi_f))
    np.testing.assert_allclose(np.asarray(bd_t), np.asarray(bd_f), atol=1e-6)


def test_level2_overflow_spills_to_global_bin():
    """More mid-span triangles than the level-2 slab holds (g_cap): the
    overflow must stream through the all-tiles global bin, still exact."""
    rng = np.random.default_rng(23)
    t = 60
    h = w = 64
    centers = rng.uniform([10, 10], [w - 10, h - 10], (t, 2)).astype(np.float32)
    offs = rng.normal(0, 1, (t, 3, 2)).astype(np.float32)
    pts = centers[:, None] + offs * 30.0     # ~2-4 tile span each
    ws = np.ones((t, 3, 1), np.float32)
    xyw = np.concatenate([pts * ws, ws], axis=-1)
    z = rng.uniform(0.05, 0.95, (t, 3)).astype(np.float32)
    si, sf = pack_states([RasterState()])
    setup = df.triangle_setup(jnp.asarray(xyw), jnp.asarray(z),
                              jnp.zeros(t, jnp.int32), jnp.ones(t, bool),
                              jnp.asarray(si))
    defer = jnp.ones(t, bool)
    viewport = jnp.asarray([0, 0, w, h], jnp.float32)
    bi_f, bd_f = df.depth_reduce(setup, defer, 1.0, viewport, h, w)
    # g_cap=4 forces most mid-span triangles past the slab into the global
    # while-loop; max_span=1 forces nearly everything to be mid-span.
    bi_t, bd_t, _ = depth_reduce_tiled(
        setup, defer, 1.0, viewport, jnp.asarray(xyw), h, w, tile=16,
        max_span=1, span2=9, g_cap=4)
    np.testing.assert_array_equal(np.asarray(bi_t), np.asarray(bi_f))
    np.testing.assert_allclose(np.asarray(bd_t), np.asarray(bd_f), atol=4e-6)


def test_wcross_triangles_route_global():
    """Triangles crossing w=0 have unbounded screen bboxes and must render
    through the global bin (exact vs the flat oracle)."""
    rng = np.random.default_rng(31)
    t = 40
    h = w = 48
    centers = rng.uniform([0, 0], [w, h], (t, 2)).astype(np.float32)
    offs = rng.normal(0, 1, (t, 3, 2)).astype(np.float32)
    pts = centers[:, None] + offs * 15.0
    ws = rng.uniform(0.5, 2.0, (t, 3, 1)).astype(np.float32)
    ws[::5, 0] = -0.3                        # every 5th crosses w=0
    xyw = np.concatenate([pts * ws, ws], axis=-1)
    z = rng.uniform(0.05, 0.95, (t, 3)).astype(np.float32)
    bi_f, bd_f, bi_t, bd_t, _ = _run_both(xyw, z, h, w, max_span=4)
    np.testing.assert_array_equal(np.asarray(bi_t), np.asarray(bi_f))
    np.testing.assert_allclose(np.asarray(bd_t), np.asarray(bd_f), atol=4e-6)


def test_tiled_full_frame_in_pipeline():
    """A >4096-triangle mesh routes through the tiled path and renders."""
    from ckrenderengine_tpu.objects import (
        CK3dObject, CKCamera, CKContext, CKMaterial, CKMesh,
    )

    ctx = CKContext()
    n = 52
    xs = np.linspace(-2, 2, n + 1)
    ys = np.linspace(-2, 2, n + 1)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    verts = np.stack([gx, gy, 0.1 * np.sin(gx * 3) * np.cos(gy * 3)],
                     -1).reshape(-1, 3).astype(np.float32)
    faces = []
    for r in range(n):
        for c in range(n):
            a = r * (n + 1) + c
            faces += [[a, a + 1, a + n + 2], [a, a + n + 2, a + n + 1]]
    faces = np.asarray(faces, np.int32)
    assert faces.shape[0] > 4096
    mesh = CKMesh(ctx, "grid")
    mesh.SetPositions(verts)
    mesh.SetFaces(faces)
    mesh.BuildNormals()
    mat = CKMaterial(ctx, "m")
    mat.SetEmissive((0.2, 0.9, 0.3, 1))
    mat.SetTwoSided(True)
    mesh.ApplyGlobalMaterial(mat)
    obj = CK3dObject(ctx, "o")
    obj.SetCurrentMesh(mesh)
    rm = ctx.GetRenderManager()
    rc = rm.CreateRenderContext(96, 96)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0, 0, -5))
    rc.AttachViewpointToCamera(cam)
    rc.Render()
    fb = rc.framebuffer()
    assert (fb[..., 1] > 0.5).sum() > 1000    # the green sheet covers pixels
    # EnableDebugMode surfaces the tile-occupancy counter into VxStats.
    rm.SetRenderOptions("EnableDebugMode", 1)
    try:
        rc.Render()
        assert rc.GetStats().TileBinPeak > 0
    finally:
        rm.SetRenderOptions("EnableDebugMode", 0)
