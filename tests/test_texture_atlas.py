"""Packed texture atlas: mixed-size texture sets shelf-pack into one plane
(instead of padding every texture to the max size) with per-texture offsets
applied by the samplers. Frames must be identical to the per-plane layout."""
import numpy as np
import pytest

from ckrenderengine_tpu.objects import (
    CK2dEntity, CK3dObject, CKCamera, CKContext, CKMaterial, CKMesh,
    CKTexture,
)


def _scene(sizes, mips=False, rotate=0.0, wrap_uvs=False, sprite2d=False):
    ctx = CKContext()
    rc = ctx.GetRenderManager().CreateRenderContext(64, 64)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0, 0, -4))
    rc.AttachViewpointToCamera(cam)
    rng = np.random.default_rng(9)
    x = -2.2
    texs = []
    for i, sz in enumerate(sizes):
        mesh = CKMesh(ctx, f"q{i}")
        mesh.SetPositions(np.array(
            [[x, -0.8, 0], [x + 1, -0.8, 0], [x + 1, 0.8, 0], [x, 0.8, 0]],
            np.float32))
        mesh.SetFaces(np.array([[0, 2, 1], [0, 3, 2]], np.int32))
        hi = 2.5 if wrap_uvs else 1.0
        mesh.SetUVs(np.array([[0, 0], [hi, 0], [hi, hi], [0, hi]],
                             np.float32))
        mesh.BuildNormals()
        tex = CKTexture(ctx, f"t{i}")
        tex.SetImage(rng.uniform(0, 1, (sz, sz, 4)).astype(np.float32))
        if mips:
            tex.UseMipmap(True)
        texs.append(tex)
        mat = CKMaterial(ctx, f"m{i}")
        mat.SetEmissive((1, 1, 1, 1))
        mat.SetTwoSided(True)
        mat.SetTexture(tex)
        mesh.ApplyGlobalMaterial(mat)
        o = CK3dObject(ctx, f"o{i}")
        o.SetCurrentMesh(mesh)
        if rotate:
            o.Rotate((0, 1, 0), rotate)
        x += 1.1
    if sprite2d:
        hud = CK2dEntity(ctx, "hud")
        hud.SetPosition((2, 2))
        hud.SetSize((20, 12))
        hud_mat = CKMaterial(ctx, "hudm")
        hud_mat.SetTexture(texs[0])
        hud.SetMaterial(hud_mat)
    rc.Render()
    return rc


MIXED = [64, 8, 8, 8, 16]


class TestAtlasEquivalence:
    def _pair(self, monkeypatch, **kw):
        rc_atlas = _scene(MIXED, **kw)
        assert rc_atlas._tex_hw.shape[1] >= 4, "atlas should activate"
        import ckrenderengine_tpu.objects.manager as M
        monkeypatch.setattr(M.CKRenderContext, "_atlas_enabled", False,
                            raising=False)
        rc_plain = _scene(MIXED, **kw)
        assert rc_plain._tex_hw.shape[1] < 4, "atlas should be disabled"
        return rc_atlas, rc_plain

    def test_base_sampling_identical(self, monkeypatch):
        a, b = self._pair(monkeypatch)
        np.testing.assert_allclose(a.framebuffer(), b.framebuffer(),
                                   atol=1e-6)

    def test_wrap_addressing_identical(self, monkeypatch):
        a, b = self._pair(monkeypatch, wrap_uvs=True)
        np.testing.assert_allclose(a.framebuffer(), b.framebuffer(),
                                   atol=1e-6)

    def test_mips_identical(self, monkeypatch):
        a, b = self._pair(monkeypatch, mips=True, rotate=1.0)
        np.testing.assert_allclose(a.framebuffer(), b.framebuffer(),
                                   atol=1e-5)

    def test_2d_overlay_identical(self, monkeypatch):
        a, b = self._pair(monkeypatch, sprite2d=True)
        np.testing.assert_allclose(a.framebuffer(), b.framebuffer(),
                                   atol=1e-6)

    def test_memory_shrinks(self, monkeypatch):
        a, b = self._pair(monkeypatch)
        atlas_texels = int(np.prod(a._tex_planes.shape))
        plain_texels = int(np.prod(b._tex_planes.shape))
        assert atlas_texels < plain_texels / 2


class TestAtlasActivation:
    def test_same_size_textures_stay_per_plane(self):
        rc = _scene([16, 16, 16])
        assert rc._tex_hw.shape[1] < 4
