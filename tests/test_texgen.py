"""Material TexGen effects: planar / reflection / chrome UV generation
(reference CKMaterial::TexGenEffect, src/CKMaterial.cpp:1302-1362,1456+)."""

import numpy as np
import pytest

from ckrenderengine_tpu.objects.material import VXEFFECT_TEXGEN
from ckrenderengine_tpu.raster.types import TEXGEN_CHROME, TEXGEN_CUBE

from ckrenderengine_tpu.objects import (
    CK3dObject, CKCamera, CKContext, CKMaterial, CKMesh, CKTexture,
)


def _env_tex(ctx):
    """Environment texture: center green, edges red."""
    tex = CKTexture(ctx, "env")
    img = np.zeros((16, 16, 4), np.float32)
    img[..., 0] = 1.0
    img[6:10, 6:10] = (0, 1, 0, 1)
    img[..., 3] = 1.0
    tex.SetImage(img)
    return tex


def _scene(ctx, effect):
    mesh = CKMesh(ctx, "q")
    mesh.SetPositions(np.array(
        [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32))
    mesh.SetFaces(np.array([[0, 2, 1], [0, 3, 2]], np.int32))
    # base UVs point at a corner (red); texgen should override toward center
    mesh.SetUVs(np.zeros((4, 2), np.float32))
    mesh.BuildNormals()
    mat = CKMaterial(ctx, "m")
    mat.SetEmissive((1, 1, 1, 1))
    mat.SetTwoSided(True)
    mat.SetTexture(_env_tex(ctx))
    if effect in (TEXGEN_CHROME, TEXGEN_CUBE):   # texgen mode via parameter
        mat.SetEffect(VXEFFECT_TEXGEN)
        mat.SetEffectParameter(texgen=effect)
    else:
        mat.SetEffect(effect)                    # 0/1/2 = none/planar/reflect
    mesh.ApplyGlobalMaterial(mat)
    obj = CK3dObject(ctx, "o")
    obj.SetCurrentMesh(mesh)
    rm = ctx.GetRenderManager()
    rc = rm.CreateRenderContext(64, 64)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0, 0, -4))
    rc.AttachViewpointToCamera(cam)
    return rc, mat


class TestTexGen:
    def test_no_effect_uses_base_uvs(self):
        ctx = CKContext()
        rc, mat = _scene(ctx, effect=0)
        rc.Render()
        px = rc.framebuffer()[32, 32]
        assert px[0] > 0.9 and px[1] < 0.1   # corner texel = red

    def test_chrome_normal_facing_camera_hits_center(self):
        ctx = CKContext()
        rc, mat = _scene(ctx, effect=3)      # chrome
        rc.Render()
        px = rc.framebuffer()[32, 32]
        # normal (0,0,-1) toward camera -> uv (0.5, 0.5) -> green center
        assert px[1] > 0.9 and px[0] < 0.1

    def test_reflection_center_hits_center(self):
        ctx = CKContext()
        rc, mat = _scene(ctx, effect=2)      # reflection (sphere env)
        rc.Render()
        px = rc.framebuffer()[32, 32]
        assert px[1] > 0.5                    # reflected ray ~ -z -> center-ish

    def test_effect_changes_output(self):
        ctx = CKContext()
        rc, mat = _scene(ctx, effect=0)
        rc.Render()
        base = rc.framebuffer().copy()
        mat.SetEffect(VXEFFECT_TEXGEN)
        mat.SetEffectParameter(texgen=TEXGEN_CHROME)
        rc.Render()
        assert np.abs(rc.framebuffer() - base).sum() > 10
