"""One-gather quad-texel bilinear sampling: the baked-quad path must match
the 4-tap reference path pixel-for-pixel (up to FP associativity at clamped
edges) for wrap and clamp addressing, with and without mips."""

import numpy as np
import jax.numpy as jnp
import pytest

from ckrenderengine_tpu.objects import (
    CKContext, CK3dObject, CKCamera, CKMaterial, CKMesh, CKTexture,
)
from ckrenderengine_tpu.raster.types import VXTEXTURE_ADDRESS


def _scene(address_mode, uv_scale=3.0, mipmap=False):
    ctx = CKContext()
    rm = ctx.GetRenderManager()
    rc = rm.CreateRenderContext(96, 96)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0.0, 0.0, -2.2))
    rc.AttachViewpointToCamera(cam)

    tex = CKTexture(ctx, "t")
    rng = np.random.default_rng(5)
    img = rng.random((16, 16, 4)).astype(np.float32)
    img[..., 3] = 1.0
    tex.SetImage(img)
    tex.mipmap = mipmap

    mesh = CKMesh(ctx, "quad")
    mesh.SetPositions(np.array(
        [[-1.4, -1.0, 0], [1.4, -1.0, 0], [1.4, 1.0, 2.5], [-1.4, 1.0, 2.5]],
        np.float32))
    mesh.SetFaces(np.array([[0, 2, 1], [0, 3, 2]], np.int32))
    mesh.SetUVs(np.array([[-0.2, -0.2], [uv_scale, -0.2],
                          [uv_scale, uv_scale], [-0.2, uv_scale]], np.float32))
    mesh.BuildNormals()
    mat = CKMaterial(ctx, "m")
    mat.SetTexture(tex)
    mat.texture_address_mode = int(address_mode)
    mesh.ApplyGlobalMaterial(mat)
    obj = CK3dObject(ctx, "o")
    obj.SetCurrentMesh(mesh)
    return ctx, rc


@pytest.mark.parametrize("mode", [VXTEXTURE_ADDRESS.WRAP,
                                  VXTEXTURE_ADDRESS.CLAMP])
def test_quad_path_matches_four_taps(mode):
    ctx, rc = _scene(mode)
    rc.Render()
    fb_quad = np.asarray(rc.framebuffer())
    c = rc._compiled
    assert c._quad_ok, "quad bake should be eligible for this scene"

    # Force the 4-tap path by dropping the quad table, same frame.
    rc._tex_quad = None
    c._quad_ok = False
    rc._packed_static = None
    rc._compile_sig = None
    rc.Render()
    fb_taps = np.asarray(rc.framebuffer())
    np.testing.assert_allclose(fb_quad, fb_taps, atol=3e-6)
    # sanity: the texture actually shows (not a flat frame)
    assert fb_taps.std() > 0.01


@pytest.mark.parametrize("mode", [VXTEXTURE_ADDRESS.MIRROR,
                                  VXTEXTURE_ADDRESS.MIRRORONCE])
def test_mirror_modes_disable_quad_bake(mode):
    # MIRROR's +1 neighbor flips direction in odd periods; MIRRORONCE
    # misaligns below zero — both must fall back to the 4-tap path.
    ctx, rc = _scene(mode)
    rc.Render()
    assert not rc._compiled._quad_ok
    assert np.asarray(rc.framebuffer()).std() > 0.001
