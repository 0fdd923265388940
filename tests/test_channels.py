"""Material-channel rendering: extra UV sets blended over the base pass
(reference RCKMesh::RenderChannels, src/CKMesh.cpp:4390+)."""

import numpy as np
import pytest

from ckrenderengine_tpu.objects import (
    CK3dObject, CKCamera, CKContext, CKMaterial, CKMesh, CKTexture,
)
from ckrenderengine_tpu.raster.types import VXBLEND


def _quad_scene(ctx):
    mesh = CKMesh(ctx, "q")
    mesh.SetPositions(np.array(
        [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32))
    mesh.SetFaces(np.array([[0, 2, 1], [0, 3, 2]], np.int32))
    mesh.SetUVs(np.array([[0, 1], [1, 1], [1, 0], [0, 0]], np.float32))
    mesh.BuildNormals()
    base = CKMaterial(ctx, "base")
    base.SetEmissive((0.5, 0, 0, 1))     # self-lit red base
    base.SetTwoSided(True)
    mesh.ApplyGlobalMaterial(base)
    obj = CK3dObject(ctx, "o")
    obj.SetCurrentMesh(mesh)
    rm = ctx.GetRenderManager()
    rc = rm.CreateRenderContext(64, 64)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0, 0, -4))
    rc.AttachViewpointToCamera(cam)
    return rc, mesh, obj


class TestChannels:
    def test_additive_channel_brightens(self):
        ctx = CKContext()
        rc, mesh, obj = _quad_scene(ctx)
        rc.Render()
        base_px = rc.framebuffer()[32, 32].copy()

        tex = CKTexture(ctx, "glow")
        img = np.zeros((8, 8, 4), np.float32)
        img[..., 1] = 0.5     # green glow
        img[..., 3] = 1.0
        tex.SetImage(img)
        cmat = CKMaterial(ctx, "chan")
        cmat.SetTexture(tex)
        cmat.SetEmissive((1, 1, 1, 1))   # self-lit: no lights in this scene
        cmat.SetTwoSided(True)
        ci = mesh.AddChannel(cmat)
        mesh.SetChannelSourceBlend(ci, int(VXBLEND.ONE))
        mesh.SetChannelDestBlend(ci, int(VXBLEND.ONE))
        rc.Render()
        px = rc.framebuffer()[32, 32]
        assert px[1] > base_px[1] + 0.2      # green added
        assert px[0] == pytest.approx(base_px[0], abs=0.1)  # red kept

    def test_channel_deactivation(self):
        ctx = CKContext()
        rc, mesh, obj = _quad_scene(ctx)
        cmat = CKMaterial(ctx, "chan")
        cmat.SetEmissive((0, 0, 1, 1))
        cmat.SetTwoSided(True)
        ci = mesh.AddChannel(cmat)
        mesh.SetChannelSourceBlend(ci, int(VXBLEND.ONE))
        mesh.SetChannelDestBlend(ci, int(VXBLEND.ONE))
        rc.Render()
        with_chan = rc.framebuffer()[32, 32].copy()
        mesh.ActivateChannel(ci, False)
        rc.Render()
        without = rc.framebuffer()[32, 32]
        assert with_chan[2] > without[2] + 0.2

    def test_channel_uses_own_uvs(self):
        ctx = CKContext()
        rc, mesh, obj = _quad_scene(ctx)
        # texture: left half blue, right half yellow
        tex = CKTexture(ctx, "split")
        img = np.zeros((8, 8, 4), np.float32)
        img[:, :4] = (0, 0, 1, 1)
        img[:, 4:] = (1, 1, 0, 1)
        tex.SetImage(img)
        cmat = CKMaterial(ctx, "chan")
        cmat.SetTexture(tex)
        cmat.SetEmissive((1, 1, 1, 1))
        cmat.SetTwoSided(True)
        ci = mesh.AddChannel(cmat, copy_uvs=False)
        # channel UVs sample ONLY the left (blue) half everywhere
        mesh.channels[ci]["uvs"] = np.full((4, 2), 0.25, np.float32)
        mesh.SetChannelSourceBlend(ci, int(VXBLEND.ONE))
        mesh.SetChannelDestBlend(ci, int(VXBLEND.ZERO))   # replace
        rc.Render()
        px = rc.framebuffer()[32, 32]
        assert px[2] > 0.9 and px[0] < 0.1   # blue via channel UVs
