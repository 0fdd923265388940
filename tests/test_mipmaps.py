"""Mipmap tests: atlas chain, LOD selection, trilinear blending, DisableMipmap
(reference texture mip handling, LoadTexture mipmaps
CKDX9RasterizerContext.cpp:1836-2060)."""

import numpy as np
import pytest

from ckrenderengine_tpu.objects import (
    CK3dObject, CKCamera, CKContext, CKMaterial, CKMesh, CKTexture,
)
from ckrenderengine_tpu.raster.types import VXTEXTURE_FILTER


def _mip_tex(ctx):
    """16x16 red base; user mip level 1 (8x8) green, level 2 (4x4) blue —
    makes the selected level directly observable."""
    tex = CKTexture(ctx, "m")
    img = np.zeros((16, 16, 4), np.float32)
    img[..., 0] = 1.0
    img[..., 3] = 1.0
    tex.SetImage(img)
    g = np.zeros((8, 8, 4), np.float32)
    g[..., 1] = 1.0
    g[..., 3] = 1.0
    b = np.zeros((4, 4, 4), np.float32)
    b[..., 2] = 1.0
    b[..., 3] = 1.0
    tex.user_mip_levels = [g, b]
    tex.UseMipmap(True)
    return tex


def _scene(ctx, filt, uv_scale=1.0, z=0.0):
    mesh = CKMesh(ctx, "q")
    mesh.SetPositions(np.array(
        [[-1, -1, z], [1, -1, z], [1, 1, z], [-1, 1, z]], np.float32))
    mesh.SetFaces(np.array([[0, 2, 1], [0, 3, 2]], np.int32))
    mesh.SetUVs(np.array([[0, 1], [1, 1], [1, 0], [0, 0]], np.float32) * uv_scale)
    mesh.BuildNormals()
    mat = CKMaterial(ctx, "mat")
    mat.SetEmissive((1, 1, 1, 1))
    mat.SetTwoSided(True)
    mat.SetTexture(_mip_tex(ctx))
    mat.SetTextureMagMode(int(filt))
    mesh.ApplyGlobalMaterial(mat)
    obj = CK3dObject(ctx, "o")
    obj.SetCurrentMesh(mesh)
    rm = ctx.GetRenderManager()
    rc = rm.CreateRenderContext(64, 64)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0, 0, -4))
    rc.AttachViewpointToCamera(cam)
    return rm, rc


class TestMipmaps:
    def test_magnified_uses_base_level(self):
        # quad covers ~32px with 1 UV repeat of a 16-texel image: magnified,
        # lod ~ 0 -> red base
        ctx = CKContext()
        rm, rc = _scene(ctx, VXTEXTURE_FILTER.LINEARMIPNEAREST)
        rc.Render()
        px = rc.framebuffer()[32, 32]
        assert px[0] > 0.8 and px[1] < 0.2

    def test_minified_picks_smaller_level(self):
        # quad covers ~62px; 16 uv repeats x 16 texels = 256 texels -> rho ~4
        # -> lod ~2 -> blue level
        ctx = CKContext()
        rm, rc = _scene(ctx, VXTEXTURE_FILTER.LINEARMIPNEAREST, uv_scale=16.0)
        rc.Render()
        px = rc.framebuffer()[32, 32]
        assert px[2] > 0.5, px
        assert px[0] < 0.4

    def test_trilinear_blends_levels(self):
        # ~96 texels over ~62px -> lod ~0.6: trilinear blends red toward green
        ctx = CKContext()
        rm, rc = _scene(ctx, VXTEXTURE_FILTER.LINEARMIPLINEAR, uv_scale=6.0)
        rc.Render()
        px = rc.framebuffer()[32, 32]
        assert px[1] > 0.3          # green mip contributes
        assert px[2] < 0.3          # not yet at blue level

    def test_nearest_filter_ignores_mips(self):
        ctx = CKContext()
        rm, rc = _scene(ctx, VXTEXTURE_FILTER.NEAREST, uv_scale=16.0)
        rc.Render()
        px = rc.framebuffer()[32, 32]
        assert px[0] > 0.8 and px[2] < 0.2   # base level regardless of lod

    def test_disable_mipmap_option(self):
        ctx = CKContext()
        rm, rc = _scene(ctx, VXTEXTURE_FILTER.LINEARMIPNEAREST, uv_scale=16.0)
        rm.SetRenderOptions("DisableMipmap", 1)
        rc.Render()
        px = rc.framebuffer()[32, 32]
        assert px[0] > 0.8 and px[2] < 0.2   # forced to base level


class TestSixteenBitVideoFormat:
    """16-bit TextureVideoFormat stores the device texture stack in
    bfloat16 (reference TextureVideoFormat option / SetDesiredVideoFormat —
    16-bit formats trade precision for half the texture memory)."""

    def test_bf16_stack_renders_close_and_halves_memory(self):
        import jax.numpy as jnp

        from ckrenderengine_tpu.objects import (CK3dObject, CKCamera,
                                                CKContext, CKMaterial,
                                                CKMesh, CKTexture)

        def scene(fmt):
            ctx = CKContext()
            rm = ctx.GetRenderManager()
            if fmt:
                rm.SetDesiredTexturesVideoFormat(fmt)
            rc = rm.CreateRenderContext(48, 48)
            cam = CKCamera(ctx, "cam")
            cam.SetPosition((0, 0, -3))
            rc.AttachViewpointToCamera(cam)
            mesh = CKMesh(ctx, "q")
            mesh.SetPositions(np.array([[-1, -1, 0], [1, -1, 0], [1, 1, 0],
                                        [-1, 1, 0]], np.float32))
            mesh.SetFaces(np.array([[0, 2, 1], [0, 3, 2]], np.int32))
            mesh.SetUVs(np.array([[0, 0], [1, 0], [1, 1], [0, 1]],
                                 np.float32))
            mesh.BuildNormals()
            tex = CKTexture(ctx, "t")
            rng = np.random.default_rng(5)
            tex.SetImage(rng.uniform(0, 1, (16, 16, 4)).astype(np.float32))
            mat = CKMaterial(ctx, "m")
            mat.SetEmissive((1, 1, 1, 1))
            mat.SetTwoSided(True)
            mat.SetTexture(tex)
            mesh.ApplyGlobalMaterial(mat)
            o = CK3dObject(ctx, "o")
            o.SetCurrentMesh(mesh)
            rc.Render()
            return rc

        rc32 = scene(None)
        rc16 = scene("_16_RGB565")
        assert rc32._tex_planes.dtype == jnp.float32
        assert rc16._tex_planes.dtype == jnp.bfloat16
        fb32 = rc32.framebuffer()
        fb16 = rc16.framebuffer()
        # bf16 quantization ~1/256 at full scale: images must agree closely
        assert np.abs(fb32 - fb16).max() < 0.02
        assert np.abs(fb32 - fb16).mean() < 0.005
