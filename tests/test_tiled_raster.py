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
    bi_tiled, bd_tiled, overflow = depth_reduce_tiled(
        setup, defer, 1.0, viewport, xyw, h, w, tile=16, k_per_tile=300,
        g_cap=64, max_span=36)
    assert int(overflow) == 0
    np.testing.assert_array_equal(np.asarray(bi_tiled), np.asarray(bi_flat))
    np.testing.assert_allclose(np.asarray(bd_tiled), np.asarray(bd_flat),
                               atol=1e-6)


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
