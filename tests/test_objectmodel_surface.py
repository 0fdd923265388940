"""Object-model API-surface long tail, part 2 (reference RCKMesh /
RCKRenderObject / RCK2dEntity / RCKSprite / RCKSpriteText / RCKLayer /
RCKVertexBuffer headers)."""
import numpy as np

from ckrenderengine_tpu.objects import (
    CK2dEntity, CK3dObject, CKCamera, CKContext, CKGrid, CKMaterial, CKMesh,
    CKPlace, CKSprite, CKSpriteText,
)


def _ctx(size=64):
    ctx = CKContext()
    rc = ctx.GetRenderManager().CreateRenderContext(size, size)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0, 0, -5))
    rc.AttachViewpointToCamera(cam)
    return ctx, rc, cam


def _tri(ctx, z=0.0, name="o"):
    mesh = CKMesh(ctx, name + "_mesh")
    mesh.SetPositions(np.array([[-1, -1, z], [0, 1.5, z], [1, -1, z]],
                               np.float32))
    mesh.SetFaces(np.array([[0, 1, 2]], np.int32))
    mesh.BuildNormals()
    mat = CKMaterial(ctx, name + "_mat")
    mat.SetDiffuse((1, 1, 1, 1))
    mesh.ApplyGlobalMaterial(mat)
    obj = CK3dObject(ctx, name)
    obj.SetCurrentMesh(mesh)
    return obj, mesh, mat


def _lit(rc):
    return int((rc.framebuffer()[..., :3].sum(-1) > 0.05).sum())


class TestMeshSurface2:
    def test_dissociate_all_faces(self):
        ctx, rc, cam = _ctx()
        mesh = CKMesh(ctx, "m")
        # two triangles sharing an edge
        mesh.SetPositions(np.array([[-1, -1, 0], [0, 1, 0], [1, -1, 0],
                                    [2, 1, 0]], np.float32))
        mesh.SetFaces(np.array([[0, 1, 2], [2, 1, 3]], np.int32))
        mesh.BuildNormals()
        mesh.DissociateAllFaces()
        assert mesh.GetVertexCount() == 6
        np.testing.assert_array_equal(mesh.faces,
                                      [[0, 1, 2], [3, 4, 5]])
        # corner 3 (face1 v0) was global vertex 2
        np.testing.assert_allclose(mesh.GetVertexPosition(3), [1, -1, 0])

    def test_face_material_ex_and_spec_color(self):
        ctx, rc, cam = _ctx()
        obj, mesh, mat = _tri(ctx)
        mesh.SetFaceCount(3)
        mesh.SetFaces(np.array([[0, 1, 2]] * 3, np.int32))
        m2 = CKMaterial(ctx, "m2")
        mesh.SetFaceMaterialEx([0, 2], m2)
        assert mesh.GetFaceMaterial(0) is m2
        assert mesh.GetFaceMaterial(1) is mat
        assert mesh.GetFaceMaterial(2) is m2
        mesh.SetVertexSpecularColor(1, (0.5, 0.25, 0.125))
        r, g, b = mesh.GetVertexSpecularColor(1)
        assert abs(r - 0.5) < 1e-6 and abs(b - 0.125) < 1e-6

    def test_pm_geomorph_flag_and_save_flags(self):
        ctx, rc, cam = _ctx()
        obj, mesh, mat = _tri(ctx)
        assert mesh.IsPMGeoMorphEnabled()
        mesh.EnablePMGeoMorph(False)
        assert not mesh.IsPMGeoMorphEnabled()
        mesh.SetSaveFlags(0x3)
        assert mesh.GetSaveFlags() == 0x3

    def test_load_vertices_from_chunk(self):
        from ckrenderengine_tpu.io.serialize import save_object
        ctx, rc, cam = _ctx()
        obj, mesh, mat = _tri(ctx)
        chunk = save_object(mesh)
        m2 = CKMesh(ctx, "m2")
        assert m2.LoadVertices(chunk)
        np.testing.assert_allclose(m2.positions, mesh.positions)
        assert m2.GetFaceCount() == 0        # vertices only

    def test_update_channel_indices_and_valid_primitives(self):
        ctx, rc, cam = _ctx()
        obj, mesh, mat = _tri(ctx)
        m2 = CKMaterial(ctx, "ch")
        mesh.AddChannel(m2)
        mesh.SetVertexCount(6)
        mesh.UpdateChannelIndices()
        assert mesh.channels[0]["uvs"].shape == (6, 2)
        assert mesh.UpdateHasValidPrimitives()
        assert mesh.UpdateHasValidPrimitives(mesh.GetRenderGroups()[0])

    def test_immediate_default_render(self):
        ctx, rc, cam = _ctx()
        obj, mesh, mat = _tri(ctx)
        obj.Show(False)                      # not in the frame program
        rc.Render()
        assert _lit(rc) == 0
        assert mesh.Render(rc, obj)          # immediate draw now
        assert _lit(rc) > 0

    def test_immediate_render_channels(self):
        ctx, rc, cam = _ctx()
        obj, mesh, mat = _tri(ctx)
        ch_mat = CKMaterial(ctx, "chm")
        ch_mat.SetDiffuse((0, 1, 0, 1))
        mesh.AddChannel(ch_mat)
        obj.Show(False)
        rc.Render()
        assert mesh.DefaultRender(rc, obj)
        fb = rc.framebuffer()
        assert fb[..., 1].sum() > 0          # channel pass contributed


class TestRenderObjectSurface:
    def test_context_membership_api(self):
        ctx, rc, cam = _ctx()
        obj, mesh, mat = _tri(ctx)
        obj.AddToRenderContext(rc)
        assert obj.GetInRenderContextMask() & rc.mask
        obj.RemoveFromRenderContext(rc)
        assert not obj.GetInRenderContextMask() & rc.mask
        assert obj.IsRootObject()
        child, _, _ = _tri(ctx, name="c")
        child.SetParent(obj)
        assert not child.IsRootObject()
        assert obj.CanBeHide()
        obj.AddToScene()
        obj.RemoveFromScene()

    def test_remove_render_callback(self):
        ctx, rc, cam = _ctx()
        obj, mesh, mat = _tri(ctx)
        fn = lambda dev, o, a=None: None
        obj.AddPreRenderCallBack(fn)
        assert obj.id in ctx._cb_objects
        obj.RemoveRenderCallBack(fn)
        assert obj.id not in ctx._cb_objects

    def test_update_place(self):
        ctx, rc, cam = _ctx()
        place = CKPlace(ctx, "room")
        pm = CKMesh(ctx, "roommesh")
        pm.SetPositions(np.array([[-5, -5, -5], [5, 5, 5], [5, -5, 5],
                                  [-5, 5, -5]], np.float32))
        pm.SetFaces(np.array([[0, 1, 2], [0, 3, 1]], np.int32))
        place.SetCurrentMesh(pm)
        obj, mesh, mat = _tri(ctx)
        obj.SetPosition((0, 0, 0))
        assert obj.UpdatePlace() is place
        assert obj.GetPlace() is place
        obj.SetPosition((100, 0, 0))
        assert obj.UpdatePlace() is None


class Test2dSurface:
    def test_homogeneous_relative_rect(self):
        ctx, rc, cam = _ctx()
        parent = CK2dEntity(ctx, "p")
        parent.SetPosition((10, 10))
        parent.SetSize((40, 20))
        child = CK2dEntity(ctx, "c")
        child.SetParent(parent)
        child.SetPosition((10, 5))
        child.SetSize((20, 10))
        r = child.GetHomogeneousRelativeRect(64, 64)
        np.testing.assert_allclose(r, [0.25, 0.25, 0.75, 0.75], atol=1e-6)

    def test_hierarchy_set_background(self):
        ctx, rc, cam = _ctx()
        parent = CK2dEntity(ctx, "p")
        child = CK2dEntity(ctx, "c")
        child.SetParent(parent)
        parent.HierarchySetBackground(True)
        assert parent.IsBackground() and child.IsBackground()

    def test_update_extents_feeds_context(self):
        ctx, rc, cam = _ctx()
        e = CK2dEntity(ctx, "e")
        e.SetPosition((4, 8))
        e.SetSize((10, 12))
        rect = e.UpdateExtents(rc)
        assert rect == (4, 8, 14, 20)
        assert e.GetExtents() == rect
        assert rc.GetCurrentExtents()[2] >= 14


class TestSpriteSurface:
    def test_restore_initial_size_and_copy(self):
        ctx, rc, cam = _ctx()
        s = CKSprite(ctx, "s")
        img = np.random.default_rng(1).uniform(size=(16, 8, 4)).astype(
            np.float32)
        s.SetImage(img)
        s.SetSize((3, 3))
        s.RestoreInitialSize()
        np.testing.assert_allclose(s.GetSize(), [8, 16])
        s2 = CKSprite(ctx, "s2")
        assert s2.CopySpriteData(s)
        np.testing.assert_allclose(s2.GetImage(), img)
        assert s2.GetCurrentSlot() == s.GetCurrentSlot()

    def test_sprite_text_redraw_state(self):
        ctx, rc, cam = _ctx()
        t = CKSpriteText(ctx, "t")
        t.SetSize((64, 16))
        t.SetText("hi")
        assert not t.IsUpToDate()
        t.Redraw()
        assert t.IsUpToDate()
        t.ClearFont()
        assert not t.IsUpToDate()
        assert t.font_name is None


class TestLayerAndVB:
    def test_layer_value2_and_owner(self):
        ctx, rc, cam = _ctx()
        grid = CKGrid(ctx, "g")
        grid.SetDimensions(4, 3)
        layer = grid.AddLayer("heights")
        assert layer.SetValue2(2, 1, 7)
        assert layer.GetValue2(2, 1) == 7
        assert not layer.SetValue2(4, 0, 1)     # out of bounds
        assert layer.GetValue2(0, 3) is None
        layer.SetVisible(False)
        assert not layer.IsVisible()
        other = CKGrid(ctx, "g2")
        layer.SetOwner(other)
        assert layer.GetOwner() is other

    def test_vertex_buffer_destroy(self):
        from ckrenderengine_tpu.objects.vertexbuffer import CKVertexBuffer
        ctx, rc, cam = _ctx()
        vb = CKVertexBuffer(ctx, "vb", max_vertices=8)
        p, c, u = vb.Lock(0, 4)
        p[:] = 1.0
        vb.Unlock()
        vb.Destroy()
        assert vb.GetCount() == 0
        p, c, u = vb.Lock(0, 3)                 # re-check grows again
        assert p.shape == (3, 4)
