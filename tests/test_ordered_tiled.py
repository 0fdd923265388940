"""Tile-binned ordered pass parity: alpha blending is order-sensitive, so
render_pass_tiled must apply the same triangle sequence per pixel as the flat
sequential render_pass (up to FMA-contraction float noise) for any mix of
transparent / opaque / scissored triangles."""

import numpy as np
import jax.numpy as jnp
import pytest

from ckrenderengine_tpu.raster import jax_backend as rb
from ckrenderengine_tpu.raster.types import RasterState, pack_states


def _batch(t, h, w, seed=0, big_frac=0.1, n_states=2):
    rng = np.random.default_rng(seed)
    centers = rng.uniform([0, 0], [w, h], (t, 2)).astype(np.float32)
    sizes = rng.uniform(3, 20, (t, 1)).astype(np.float32)
    big = rng.random(t) < big_frac
    sizes[big] = rng.uniform(w / 2, w * 1.5, (int(big.sum()), 1)).astype(
        np.float32)
    offs = rng.normal(0, 1, (t, 3, 2)).astype(np.float32)
    pts = centers[:, None] + offs * sizes[:, None]
    ws = rng.uniform(0.5, 4.0, (t, 3, 1)).astype(np.float32)
    xyw = np.concatenate([pts * ws, ws], axis=-1)
    z = rng.uniform(0.05, 0.95, (t, 3)).astype(np.float32)
    color = rng.uniform(0, 1, (t, 3, 4)).astype(np.float32)
    spec = np.zeros((t, 3, 3), np.float32)
    uv = rng.uniform(0, 1, (t, 3, 2)).astype(np.float32)
    fog = np.ones((t, 3), np.float32)
    state_idx = rng.integers(0, n_states, t).astype(np.int32)
    valid = np.ones(t, bool)
    bigr = 1.0e9
    clip_rect = np.tile(np.array([-bigr, -bigr, bigr, bigr], np.float32),
                        (t, 1))
    clipd = np.zeros((t, 3, 0), np.float32)
    refl = np.zeros((t, 3, 0), np.float32)
    return rb.DeviceBatch(
        xyw=jnp.asarray(xyw), z=jnp.asarray(z), color=jnp.asarray(color),
        specular=jnp.asarray(spec), uv=jnp.asarray(uv), fog=jnp.asarray(fog),
        state_idx=jnp.asarray(state_idx), valid=jnp.asarray(valid),
        clip_rect=jnp.asarray(clip_rect), clipd=jnp.asarray(clipd),
        refl=jnp.asarray(refl))


def _states():
    # state 0: alpha blend (src_alpha / inv_src_alpha), no z-write;
    # state 1: opaque z-write (interleaved opaque+transparent stresses order)
    from ckrenderengine_tpu.raster.types import VXBLEND
    blend = RasterState(alpha_blend=True, src_blend=int(VXBLEND.SRCALPHA),
                        dst_blend=int(VXBLEND.INVSRCALPHA), z_write=False)
    opaque = RasterState()
    si, sf = pack_states([blend, opaque])
    return jnp.asarray(si), jnp.asarray(sf)


def _run_pair(t, h, w, seed, tile, **kw):
    batch = _batch(t, h, w, seed, **kw)
    si, sf = _states()
    fb = jnp.zeros((4, h, w), jnp.float32)
    zb = jnp.ones((h, w), jnp.float32)
    texp = jnp.zeros((1, 4, 1, 1), jnp.float32)
    texhw = jnp.ones((1, 2), jnp.int32)
    fogc = jnp.zeros(3, jnp.float32)
    vp = jnp.asarray([0, 0, w, h], jnp.float32)
    fb1, zb1 = rb.render_pass(fb, zb, batch, si, sf, texp, texhw, fogc, vp,
                              chunk=1)
    fb2, zb2 = rb.render_pass_tiled(fb, zb, batch, si, sf, texp, texhw, fogc,
                                    vp, tile=tile, chunk=2)
    return np.asarray(fb1), np.asarray(zb1), np.asarray(fb2), np.asarray(zb2)


@pytest.mark.parametrize("seed", [0, 3])
@pytest.mark.parametrize("tile", [16, 32])
def test_tiled_ordered_matches_flat(seed, tile):
    fb1, zb1, fb2, zb2 = _run_pair(120, 64, 96, seed, tile)
    # identical triangle order per pixel; tolerance is FMA-contraction noise
    # between the two separately-compiled programs (see verify notes)
    np.testing.assert_allclose(fb2, fb1, atol=2e-5)
    np.testing.assert_allclose(zb2, zb1, atol=2e-6)


def test_tiled_ordered_fullscreen_triangles_every_tile():
    """Mostly screen-spanning transparent triangles: every tile's list holds
    nearly every triangle, order must still match exactly."""
    fb1, zb1, fb2, zb2 = _run_pair(40, 48, 48, 5, 16, big_frac=0.9)
    np.testing.assert_allclose(fb2, fb1, atol=2e-5)
    np.testing.assert_allclose(zb2, zb1, atol=2e-6)


def test_tiled_ordered_respects_viewport_scissor():
    batch = _batch(60, 64, 64, 2)
    si, sf = _states()
    fb = jnp.zeros((4, 64, 64), jnp.float32)
    zb = jnp.ones((64, 64), jnp.float32)
    texp = jnp.zeros((1, 4, 1, 1), jnp.float32)
    texhw = jnp.ones((1, 2), jnp.int32)
    fogc = jnp.zeros(3, jnp.float32)
    vp = jnp.asarray([8, 4, 40, 50], jnp.float32)
    fb1, zb1 = rb.render_pass(fb, zb, batch, si, sf, texp, texhw, fogc, vp,
                              chunk=1)
    fb2, zb2 = rb.render_pass_tiled(fb, zb, batch, si, sf, texp, texhw, fogc,
                                    vp, tile=16, chunk=2)
    np.testing.assert_allclose(np.asarray(fb2), np.asarray(fb1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(zb2), np.asarray(zb1), atol=2e-6)


def test_transparent_stress_through_pipeline():
    """A >1k-transparent-tri scene at 256x256 crosses the static switch into
    the tiled ordered path inside the frame program and renders blended."""
    from ckrenderengine_tpu.objects import (
        CK3dObject, CKCamera, CKContext, CKMaterial, CKMesh,
    )

    ctx = CKContext()
    rc = ctx.GetRenderManager().CreateRenderContext(256, 256)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0, 0, -6))
    rc.AttachViewpointToCamera(cam)
    rng = np.random.default_rng(0)
    n = 1200
    centers = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    centers[:, 2] = rng.uniform(0, 3, n)
    tris = centers[:, None] + rng.normal(0, 0.15, (n, 3, 3)).astype(np.float32)
    mesh = CKMesh(ctx, "cloud")
    mesh.SetPositions(tris.reshape(-1, 3))
    mesh.SetFaces(np.arange(n * 3, dtype=np.int32).reshape(-1, 3))
    mesh.BuildNormals()
    mat = CKMaterial(ctx, "glass")
    mat.SetEmissive((0.3, 0.6, 0.9, 1))
    mat.SetDiffuse((1, 1, 1, 0.4))
    mat.EnableAlphaBlend(True)
    mat.SetTwoSided(True)
    mesh.ApplyGlobalMaterial(mat)
    obj = CK3dObject(ctx, "o")
    obj.SetCurrentMesh(mesh)
    rc.SetBackgroundColor((0, 0, 0, 1))
    rc.Render()
    assert rc._compiled.ordered_cap >= n
    assert rc._compiled.ordered_cap * 256 * 256 > (1 << 26)  # tiled switch on
    fb = rc.framebuffer()
    assert (fb[..., :3].sum(-1) > 0.05).sum() > 2000
