"""Serialization tests: CKStateChunk round-trips, scene save/load with id
remap, render equivalence after reload (reference test layer 2:
tests/simple_mesh_test.cpp save->load->verify)."""

import numpy as np
import pytest

from ckrenderengine_tpu.io import CKStateChunk
from ckrenderengine_tpu.objects import (
    CK2dEntity, CK3dObject, CKCamera, CKContext, CKCurve, CKGrid, CKLight,
    CKMaterial, CKMesh, CKPlace, CKSprite3D, CKTexture,
)
from ckrenderengine_tpu.anim import (
    CKANIMATION_LINEAR_POS, CKCharacter, CKBodyPart, CKKeyedAnimation,
    CKObjectAnimation,
)


class TestStateChunk:
    def test_typed_roundtrip(self):
        ch = CKStateChunk()
        ch.WriteIdentifier(42)
        ch.WriteInt(-7)
        ch.WriteFloat(3.5)
        ch.WriteString("héllo")
        ch.WriteArray(np.arange(12, dtype=np.float32).reshape(3, 4))
        ch.WriteObjectID(99)
        ch.WriteIdentifier(43)
        ch.WriteMatrix(np.eye(4, dtype=np.float32) * 2)

        ch2 = CKStateChunk.from_bytes(ch.to_bytes())
        assert ch2.SeekIdentifier(42)
        assert ch2.ReadInt() == -7
        assert ch2.ReadFloat() == 3.5
        assert ch2.ReadString() == "héllo"
        np.testing.assert_array_equal(
            ch2.ReadArray(), np.arange(12, dtype=np.float32).reshape(3, 4))
        assert ch2.ReadObjectID() == 99
        assert ch2.SeekIdentifier(43)
        np.testing.assert_array_equal(ch2.ReadMatrix(),
                                      np.eye(4, dtype=np.float32) * 2)
        assert not ch2.SeekIdentifier(12345)

    def test_subchunk_and_remap(self):
        ch = CKStateChunk()
        ch.WriteIdentifier(1)
        sub = CKStateChunk()
        sub.WriteIdentifier(2)
        sub.WriteObjectID(10)
        ch.WriteSubChunk(sub)
        ch.WriteObjectID(10)
        ch.WriteObjectID(11)
        ch.RemapObjectIDs({10: 100})
        ch.SeekIdentifier(1)
        s = ch.ReadSubChunk()
        s.SeekIdentifier(2)
        assert s.ReadObjectID() == 100
        assert ch.ReadObjectID() == 100
        assert ch.ReadObjectID() == 0     # unmapped -> null, never aliased


def _build_scene(ctx):
    tex = CKTexture(ctx, "checker")
    img = (np.indices((8, 8)).sum(0) % 2).astype(np.float32)
    tex.SetImage(np.stack([img, img, img, np.ones_like(img)], -1))
    mat = CKMaterial(ctx, "mat")
    mat.SetDiffuse((0.9, 0.4, 0.2, 1.0))
    mat.SetTexture(tex)
    mesh = CKMesh(ctx, "cube")
    s = 0.5
    verts = np.array([[x, y, z] for x in (-s, s) for y in (-s, s)
                      for z in (-s, s)], np.float32)
    faces = np.array([[0, 2, 3], [0, 3, 1], [4, 5, 7], [4, 7, 6],
                      [0, 1, 5], [0, 5, 4], [2, 6, 7], [2, 7, 3],
                      [0, 4, 6], [0, 6, 2], [1, 3, 7], [1, 7, 5]], np.int32)
    mesh.SetPositions(verts)
    mesh.SetFaces(faces)
    mesh.SetUVs(np.zeros((8, 2), np.float32))
    mesh.BuildNormals()
    mesh.ApplyGlobalMaterial(mat)
    parent = CK3dObject(ctx, "parent")
    child = CK3dObject(ctx, "child")
    child.SetParent(parent)
    child.SetCurrentMesh(mesh)
    child.SetPosition((0, 1, 0), ref=parent)
    parent.Rotate((0, 1, 0), 0.5)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0, 1, -4))
    light = CKLight(ctx, "sun")
    light.SetType(1)
    light.SetColor((1, 0.9, 0.8, 1))
    return parent, child, mesh, cam


class TestSceneRoundtrip:
    def test_hierarchy_mesh_material_texture(self, tmp_path):
        ctx = CKContext()
        parent, child, mesh, cam = _build_scene(ctx)
        p = str(tmp_path / "scene.ck")
        n = ctx.Save(p)
        assert n >= 6

        ctx2 = CKContext()
        loaded = ctx2.Load(p)
        child2 = ctx2.GetObjectByName("child")
        parent2 = ctx2.GetObjectByName("parent")
        assert child2.GetParent() is parent2
        np.testing.assert_allclose(child2.GetWorldMatrix(),
                                   child.GetWorldMatrix(), atol=1e-5)
        mesh2 = child2.GetCurrentMesh()
        np.testing.assert_array_equal(mesh2.positions, mesh.positions)
        np.testing.assert_array_equal(mesh2.faces, mesh.faces)
        mat2 = mesh2.GetMaterial(0)
        assert mat2 is not None
        np.testing.assert_allclose(mat2.GetDiffuse(), (0.9, 0.4, 0.2, 1.0),
                                   atol=1e-6)
        tex2 = mat2.GetTexture(0)
        assert tex2 is not None and tex2.GetWidth() == 8

    def test_render_equivalence_after_reload(self, tmp_path):
        ctx = CKContext()
        _build_scene(ctx)
        rm = ctx.GetRenderManager()
        rc = rm.CreateRenderContext(64, 64)
        rc.AttachViewpointToCamera(ctx.GetObjectByName("cam"))
        rc.Render()
        fb1 = rc.framebuffer().copy()
        p = str(tmp_path / "scene.ck")
        ctx.Save(p)

        ctx2 = CKContext()
        ctx2.Load(p)
        rm2 = ctx2.GetRenderManager()
        rc2 = rm2.CreateRenderContext(64, 64)
        rc2.AttachViewpointToCamera(ctx2.GetObjectByName("cam"))
        rc2.Render()
        fb2 = rc2.framebuffer()
        assert fb1.sum() > 0
        np.testing.assert_allclose(fb2, fb1, atol=1e-5)

    def test_extended_objects_roundtrip(self, tmp_path):
        ctx = CKContext()
        place = CKPlace(ctx, "room")
        place.ViewportClip((0, 0, 32, 32))
        grid = CKGrid(ctx, "grid")
        grid.SetDimensions(4, 4, 2.0, 2.0)
        layer = grid.AddLayer("nav")
        layer.SetValue(1, 2, 9)
        curve = CKCurve(ctx, "path")
        curve.AddControlPoint((0, 0, 0))
        curve.AddControlPoint((1, 1, 1))
        sp = CKSprite3D(ctx, "board")
        sp.SetSize((2, 3))
        hud = CK2dEntity(ctx, "hud")
        hud.SetRect((1, 2, 11, 22))
        hud.SetColor((0, 1, 0, 0.5))
        p = str(tmp_path / "scene.ck")
        ctx.Save(p)

        ctx2 = CKContext()
        ctx2.Load(p)
        place2 = ctx2.GetObjectByName("room")
        assert place2.GetClipRect() == (0, 0, 32, 32)
        grid2 = ctx2.GetObjectByName("grid")
        assert grid2.GetLayer("nav").GetValue(1, 2) == 9
        curve2 = ctx2.GetObjectByName("path")
        assert curve2.GetControlPointCount() == 2
        assert curve2.GetLength() > 0
        sp2 = ctx2.GetObjectByName("board")
        np.testing.assert_allclose(sp2.GetSize(), (2, 3))
        hud2 = ctx2.GetObjectByName("hud")
        assert tuple(hud2.screen_rect(64, 64)) == (1, 2, 11, 22)
        np.testing.assert_allclose(hud2.color, (0, 1, 0, 0.5))

    def test_character_animation_roundtrip(self, tmp_path):
        ctx = CKContext()
        ch = CKCharacter(ctx, "bob")
        root = CKBodyPart(ctx, "hips")
        arm = CKBodyPart(ctx, "arm")
        ch.AddBodyPart(root)
        ch.AddBodyPart(arm)
        clip = CKKeyedAnimation(ctx, "walk")
        oa = CKObjectAnimation(ctx, "armtrack")
        oa.Set3dEntity(arm)
        pc = oa.CreateController(CKANIMATION_LINEAR_POS)
        pc.AddKey(0.0, (0, 0, 0))
        pc.AddKey(10.0, (0, 2, 0))
        clip.AddAnimation(oa)
        ch.AddAnimation(clip)
        p = str(tmp_path / "scene.ck")
        ctx.Save(p)

        ctx2 = CKContext()
        ctx2.Load(p)
        ch2 = ctx2.GetObjectByName("bob")
        assert ch2.GetBodyPartCount() == 2
        clip2 = ch2.GetAnimation(0)
        assert clip2.GetLength() == 10.0
        arm2 = ctx2.GetObjectByName("arm")
        clip2.SetFrame(5.0)
        np.testing.assert_allclose(arm2.GetLocalMatrix()[3, :3], [0, 1, 0],
                                   atol=1e-5)


class TestPatchMeshRoundtrip:
    def test_patchmesh_saves_and_retessellates(self, tmp_path):
        from ckrenderengine_tpu.objects import CKPatchMesh
        from tests.test_patchmesh import _flat_quad_patch

        ctx = CKContext()
        pm = CKPatchMesh(ctx, "patch")
        _flat_quad_patch(pm)
        pm.SetIterationCount(3)
        pm.BuildRenderMesh()
        faces_before = pm.GetFaceCount()
        p = str(tmp_path / "patch.ck")
        ctx.Save(p)

        ctx2 = CKContext()
        ctx2.Load(p)
        pm2 = ctx2.GetObjectByName("patch")
        assert isinstance(pm2, CKPatchMesh)
        assert pm2.GetIterationCount() == 3
        assert pm2.GetPatchCount() == 1
        pm2.BuildRenderMesh()
        assert pm2.GetFaceCount() == faces_before
        np.testing.assert_allclose(pm2.positions[:, 2], 0.0, atol=1e-5)
