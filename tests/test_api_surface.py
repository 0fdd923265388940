"""API-surface parity: the long tail of RCKRenderContext public methods
(reference include/RCKRenderContext.h) — fog getters, clear toggles,
transform helpers, stencil bit allocator, global render mode, immediate-mode
DrawPrimitive, windowing stubs."""

import numpy as np

from ckrenderengine_tpu.objects import (
    CKContext, CK3dObject, CKCamera, CKMaterial, CKMesh, CKTexture,
)


def _ctx(size=64):
    ctx = CKContext()
    rc = ctx.GetRenderManager().CreateRenderContext(size, size)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0, 0, -5))
    rc.AttachViewpointToCamera(cam)
    return ctx, rc, cam


def _tri(ctx, z=0.0):
    mesh = CKMesh(ctx, "tri")
    mesh.SetPositions(np.array([[-1, -1, z], [0, 1.5, z], [1, -1, z]],
                               np.float32))
    mesh.SetFaces(np.array([[0, 1, 2]], np.int32))
    mesh.BuildNormals()
    mat = CKMaterial(ctx, "m")
    mat.SetDiffuse((1, 1, 1, 1))
    mesh.ApplyGlobalMaterial(mat)
    obj = CK3dObject(ctx, "o")
    obj.SetCurrentMesh(mesh)
    return obj, mesh, mat


class TestFogAndClear:
    def test_fog_getters(self):
        ctx, rc, cam = _ctx()
        rc.SetFogMode(3)
        rc.SetFogStart(2.5)
        rc.SetFogEnd(40.0)
        rc.SetFogDensity(0.7)
        rc.SetFogColor((0.1, 0.2, 0.3))
        assert rc.GetFogMode() == 3
        assert rc.GetFogStart() == 2.5
        assert rc.GetFogEnd() == 40.0
        assert rc.GetFogDensity() == np.float32(0.7)
        np.testing.assert_allclose(rc.GetFogColor()[:3], [0.1, 0.2, 0.3],
                                   atol=1e-6)

    def test_clear_toggles_accumulate(self):
        ctx, rc, cam = _ctx()
        obj, mesh, mat = _tri(ctx)
        assert rc.GetClearBackground() and rc.GetClearZBuffer()
        rc.Render()
        fb0 = rc.framebuffer().copy()
        rc.SetClearBackground(False)
        assert not rc.GetClearBackground()
        obj.SetPosition((0.7, 0, 0))
        rc.Render()                      # accumulates over previous frame
        fb1 = rc.framebuffer()
        lit0 = (fb0[..., :3].sum(-1) > 0.05).sum()
        lit1 = (fb1[..., :3].sum(-1) > 0.05).sum()
        assert lit1 > lit0               # old pixels remain + new ones
        rc.SetClearBackground(True)


class TestViewpointAndQueries:
    def test_detach_and_get_viewpoint(self):
        ctx, rc, cam = _ctx()
        assert rc.GetViewpoint() is cam
        rc.DetachViewpointFromCamera()
        assert rc.GetViewpoint() is None
        rc.ForceCameraSettingsUpdate()   # must not crash detached

    def test_bounding_box(self):
        ctx, rc, cam = _ctx()
        obj, mesh, mat = _tri(ctx)
        obj.SetPosition((10, 0, 0))
        lo, hi = rc.GetBoundingBox()
        assert lo[0] >= 8.5 and hi[0] <= 11.5
        assert lo[1] <= -0.9 and hi[1] >= 1.4

    def test_transform_vertices(self):
        ctx, rc, cam = _ctx(64)
        screen, flags, off = rc.TransformVertices([[0, 0, 0]])
        assert not off
        assert flags[0] == 0
        np.testing.assert_allclose(screen[0], [32, 32], atol=1.0)
        # far behind the camera -> clipped
        _s, flags2, off2 = rc.TransformVertices([[0, 0, -100.0]])
        assert flags2[0] != 0 and off2

    def test_windowing_stubs(self):
        ctx, rc, cam = _ctx()
        assert not rc.GoFullScreen()
        assert not rc.IsFullScreen()
        assert rc.GetWindowRect() == (0, 0, 64, 64)
        assert rc.ScreenToClient((3, 4)) == (3, 4)


class TestStencilBits:
    def test_allocator(self):
        ctx, rc, cam = _ctx()
        assert rc.GetFirstFreeStencilBits() == 0
        rc.UsedStencilBits(0b111)
        assert rc.GetFirstFreeStencilBits() == 3
        assert rc.GetStencilFreeMask() == 0b111


class TestGlobalRenderMode:
    def test_texture_off_kills_texturing(self):
        ctx, rc, cam = _ctx()
        obj, mesh, mat = _tri(ctx)
        tex = CKTexture(ctx, "t")
        img = np.zeros((4, 4, 4), np.float32)
        img[..., 0] = 1.0   # pure red texture
        img[..., 3] = 1.0
        tex.SetImage(img)
        mat.SetTexture(tex)
        mat.SetDiffuse((0, 1, 0, 1))    # green vertex color
        rc.Render()
        fb_tex = rc.framebuffer().copy()
        rc.SetGlobalRenderMode(texture=False)
        rc.Render()
        fb_plain = rc.framebuffer()
        # modulate by the pure-red texel zeroes green/blue; texture off
        # restores them (red channel is unchanged by a (1,0,0) modulate)
        assert fb_plain[..., 1].sum() > fb_tex[..., 1].sum() + 1
        assert rc.GetGlobalRenderMode()[1] is False


class TestImmediateDrawPrimitive:
    def test_transformed_clip_space_triangle(self):
        ctx, rc, cam = _ctx()
        rc.Render()                      # empty scene, cleared
        before = rc.framebuffer().copy()
        s = rc.GetDrawPrimitiveStructure(transformed=True, vertex_count=3)
        s["positions"][:] = [[-0.5, -0.5, 0.5, 1.0], [0.0, 0.8, 0.5, 1.0],
                             [0.5, -0.5, 0.5, 1.0]]
        s["colors"][:] = [1, 0, 0, 1]
        from ckrenderengine_tpu.raster.types import VXPRIMITIVE
        assert rc.DrawPrimitive(int(VXPRIMITIVE.TRIANGLELIST))
        after = rc.framebuffer()
        assert after[..., 0].sum() > before[..., 0].sum() + 10

    def test_untransformed_goes_through_dp_matrices(self):
        ctx, rc, cam = _ctx()
        rc.Render()
        s = rc.GetDrawPrimitiveStructure(transformed=False, vertex_count=3)
        s["positions"][:] = [[-1, -1, 0], [0, 1.5, 0], [1, -1, 0]]
        s["colors"][:] = [0, 0, 1, 1]
        from ckrenderengine_tpu.raster.types import VXPRIMITIVE
        rc.SetWorldTransformationMatrix(np.eye(4, dtype=np.float32))
        assert rc.DrawPrimitive(int(VXPRIMITIVE.TRIANGLELIST))
        assert rc.framebuffer()[..., 2].sum() > 10

    def test_misc_introspection(self):
        ctx, rc, cam = _ctx()
        _tri(ctx)
        rc.Render()
        assert rc.GetMemoryOccupation() > 0
        assert rc.GetPixelFormat()[0] == 32
        assert rc.GetRasterizerContext() is rc
        assert rc.GetDirectXInfo() is None
        assert rc.DumpToMemory("z").shape == (64, 64)
        rc.SetTransparentMode(True)
        assert rc.GetTransparentMode()


class TestManagerSurface:
    def test_manager_parity_batch(self):
        ctx, rc, cam = _ctx()
        rm = ctx.GetRenderManager()
        assert rm.GetDefaultMaterial() is not None
        free = rm.GetRenderContextMaskFree()
        assert not (free & rc.mask)          # this context's bit is taken
        assert rm.GetFullscreenContext() is None
        assert rm.GetRenderContextFromPoint((5, 5)) is rc
        assert rm.GetRenderContextFromPoint((9999, 5)) is None
        vb = rm.CreateVertexBuffer("vb")
        rm.DestroyVertexBuffer(vb)
        rm.DeleteAllVertexBuffers()
        i0 = rm.CreateObjectIndex()
        i1 = rm.CreateObjectIndex()
        assert i0 != i1
        rm.ReleaseObjectIndex(i0)
        assert rm.CreateObjectIndex() == i0   # recycled
        fmt = rm.GetDesiredTexturesVideoFormat()
        rm.SetDesiredTexturesVideoFormat(fmt)
        assert rm.GetPreferredSoftwareDriver() >= 0
        obj, mesh, mat = _tri(ctx)
        rm.AddMovedEntity(obj)
        assert obj in rm.GetMovedEntities()
        rm.RegisterLastFrameEntity(obj)
        rm.UnregisterLastFrameEntity(obj)
        rc.Render()
        rm.FlushTextures()
        rc.Render()                           # re-upload must not crash
        rm.PreClearAll()
        assert rc.GetViewpoint() is None
        rm.OnCKPause()
        rm.OnCKEnd()


class TestMeshSurface:
    def test_array_ptrs_and_face_queries(self):
        ctx, rc, cam = _ctx()
        obj, mesh, mat = _tri(ctx)
        assert mesh.GetPositionsPtr().shape == (3, 3)
        assert mesh.GetFacesIndices().shape == (1, 3)
        assert mesh.GetFaceVertex(0, 1) == 1
        n = mesh.GetFaceNormal(0)
        np.testing.assert_allclose(np.abs(n), [0, 0, 1], atol=1e-5)
        assert mesh.GetFaceNormalsPtr().shape == (1, 3)
        assert mesh.GetModifierVertexCount() == 3

    def test_bulk_vertex_transforms(self):
        ctx, rc, cam = _ctx()
        obj, mesh, mat = _tri(ctx)
        p0 = mesh.GetPositionsPtr().copy()
        mesh.TranslateVertices((1, 0, 0))
        np.testing.assert_allclose(mesh.GetPositionsPtr(), p0 + [1, 0, 0],
                                   atol=1e-6)
        mesh.ScaleVertices(2.0)
        mesh.RotateVertices((0, 0, 1), np.pi)
        assert np.isfinite(mesh.GetPositionsPtr()).all()

    def test_modifier_protocol_redraws(self):
        ctx, rc, cam = _ctx()
        obj, mesh, mat = _tri(ctx)
        rc.Render()
        fb0 = rc.framebuffer().copy()
        verts = mesh.GetModifierVertices()
        verts[:, 0] += 0.8
        mesh.ModifierVertexMove()
        rc.Render()
        assert np.abs(rc.framebuffer() - fb0).sum() > 1.0

    def test_line_strip(self):
        ctx, rc, cam = _ctx()
        obj, mesh, mat = _tri(ctx)
        mesh.CreateLineStrip(3)
        assert mesh.GetLineCount() == 2
        assert mesh.GetLine(1) == (1, 2)

    def test_channel_extensions(self):
        ctx, rc, cam = _ctx()
        obj, mesh, mat = _tri(ctx)
        m2 = CKMaterial(ctx, "ch")
        i = mesh.AddChannel(m2)
        assert mesh.GetChannelByMaterial(m2) == i
        mesh.SetChannelFlags(i, 5)
        assert mesh.GetChannelFlags(i) == 5
        mesh.LitChannel(i, False)
        assert not mesh.IsChannelLit(i)
        mesh.ActivateAllChannels(False)
        assert not mesh.IsChannelActive(i)
        mesh.SetFaceChannelMask(0, 0b10)
        mesh.ChangeFaceChannelMask(0, 0b1, 0b10)
        assert mesh.GetFaceChannelMask(0) == 0b1
        mesh.RemoveChannelByMaterial(m2)
        assert mesh.GetChannelCount() == 0

    def test_replace_material(self):
        ctx, rc, cam = _ctx()
        obj, mesh, mat = _tri(ctx)
        new = CKMaterial(ctx, "new")
        new.SetDiffuse((0, 0, 1, 1))
        assert mesh.ReplaceMaterial(mat, new)
        assert mesh.GetMaterial(mesh.GetMaterialGroupIndex(new)) is new

    def test_render_callback_replaces_default(self):
        ctx, rc, cam = _ctx()
        obj, mesh, mat = _tri(ctx)
        rc.Render()
        lit_default = (rc.framebuffer()[..., :3].sum(-1) > 0.05).sum()
        assert lit_default > 0
        calls = []
        mesh.SetRenderCallBack(lambda dev, m, arg: calls.append(arg), "x")
        rc.Render()
        assert calls == ["x"]
        lit_cb = (rc.framebuffer()[..., :3].sum(-1) > 0.05).sum()
        assert lit_cb == 0              # default render suppressed
        mesh.SetDefaultRenderCallBack()
        rc.Render()
        assert (rc.framebuffer()[..., :3].sum(-1) > 0.05).sum() == lit_default

    def test_post_render_callback_fires(self):
        ctx, rc, cam = _ctx()
        obj, mesh, mat = _tri(ctx)
        seen = []
        mesh.AddPostRenderCallBack(lambda dev, m: seen.append(m))
        rc.Render()
        assert seen == [mesh]
        mesh.RemoveAllCallbacks()
        rc.Render()
        assert len(seen) == 1


class TestManagerLongTail:
    def test_temporary_callbacks(self):
        ctx, rc, cam = _ctx()
        rm = ctx.GetRenderManager()
        calls = []
        rm.AddTemporaryCallback(lambda dev, arg: calls.append("pre"))
        rm.AddTemporaryPostRenderCallback(lambda dev, arg: calls.append("post"))
        rm.Process()
        rm.PostProcess()
        rm.Process()
        assert calls == ["pre", "post"]        # dropped after one frame
        rm.AddTemporaryCallback(lambda dev, arg: calls.append("x"))
        rm.RemoveAllTemporaryCallbacks()
        rm.Process()
        assert calls == ["pre", "post"]

    def test_remove_render_context_keeps_object(self):
        ctx, rc, cam = _ctx()
        rm = ctx.GetRenderManager()
        mask = rc.mask
        rm.RemoveRenderContext(rc)
        assert rm.GetRenderContextCount() == 0
        assert ctx.GetObject(rc.id) is rc      # not destroyed
        assert rm._context_mask_free & mask

    def test_detach_all_objects(self):
        ctx, rc, cam = _ctx()
        obj, mesh, mat = _tri(ctx)
        rc.AddObject(obj)
        assert obj.IsInRenderContext(rc)
        rc.Render()
        assert (rc.framebuffer()[..., :3].sum(-1) > 0.05).sum() > 0
        ctx.GetRenderManager().DetachAllObjects()
        assert not obj.IsInRenderContext(rc)
        rc.Render()                        # explicit empty membership
        assert (rc.framebuffer()[..., :3].sum(-1) > 0.05).sum() == 0

    def test_device_teardown_recovers(self):
        ctx, rc, cam = _ctx()
        obj, mesh, mat = _tri(ctx)
        rc.Render()
        fb0 = rc.framebuffer().copy()
        rm = ctx.GetRenderManager()
        rm.DestroyingDevice()
        assert rc._compiled.topology_version == -1
        rc.Render()                            # rebuilds from system memory
        np.testing.assert_allclose(rc.framebuffer(), fb0, atol=1e-5)
        assert rm.GetValidFunctionsMask() != 0
        rm.SequenceAddedToScene()
        rm.SequenceToBeDeleted([obj.id])
        assert obj._to_be_deleted
        rm.SequenceDeleted([obj.id])


class TestSceneGraphFacade:
    def test_root_children_priority_order(self):
        ctx, rc, cam = _ctx()
        a, _, _ = _tri(ctx)
        b, _, _ = _tri(ctx)
        a.SetName("a")
        b.SetName("b")
        b.SetRenderPriority(10)
        root = ctx.GetRenderManager().GetRootNode()
        kids = [root.GetChild(i).GetEntity()
                for i in range(root.GetChildrenCount())]
        assert kids.index(b) < kids.index(a)   # high priority first
        assert root.IsToBeParsed()

    def test_node_view(self):
        ctx, rc, cam = _ctx()
        a, _, _ = _tri(ctx)
        child, _, _ = _tri(ctx)
        child.SetParent(a)
        rm = ctx.GetRenderManager()
        node = rm.CreateNode(a)
        assert node.GetEntity() is a
        assert node.GetChildrenCount() == 1
        assert node.GetChild(0).GetEntity() is child
        node.SetPriority(5)
        assert a.render_priority == 5 and node.GetPriority() == 5
        node.SetRenderContextMask(3)
        assert node.GetRenderContextMask() == 3
        rm.DeleteNode(node)

    def test_hierarchical_box(self):
        ctx, rc, cam = _ctx()
        a, _, _ = _tri(ctx)
        child, _, _ = _tri(ctx)
        child.SetParent(a)
        child.SetPosition((10, 0, 0))
        rm = ctx.GetRenderManager()
        lo, hi = rm.CreateNode(a).ComputeHierarchicalBox()
        assert hi[0] >= 11.0 - 1e-4            # child tri at x=10±1
        rlo, rhi = rm.GetRootNode().ComputeHierarchicalBox()
        assert rhi[0] >= hi[0] - 1e-6


class TestMaterialTextureEntitySurface:
    def test_material_getters_and_set_as_current(self):
        ctx, rc, cam = _ctx()
        mat = CKMaterial(ctx, "m")
        mat.SetTextureBorderColor((1, 0, 0, 1))
        assert mat.GetTextureBorderColor()[0] == 1.0
        assert mat.GetTextureMinMode() == mat.texture_min_mode
        assert mat.GetCallback() is None
        assert mat.SetAsCurrent(rc)

    def test_texture_surface(self, tmp_path):
        ctx, rc, cam = _ctx()
        tex = CKTexture(ctx, "t")
        img = np.random.default_rng(0).uniform(size=(8, 8, 4)).astype(np.float32)
        tex.SetImage(img)
        # LoadImage round-trip through a PNG on disk
        from PIL import Image
        p = str(tmp_path / "x.png")
        Image.fromarray((img * 255).astype(np.uint8)).save(p)
        assert tex.LoadImage(p, slot=0)
        assert not tex.LoadImage(str(tmp_path / "missing.png"))
        assert tex.GetSystemTextureDesc()["width"] == 8
        assert tex.IsInVideoMemory() in (True, False)
        assert tex.FreeVideoMemory()
        assert not tex.IsInVideoMemory()
        assert tex.Restore()
        assert tex.IsInVideoMemory()
        assert tex.SetAsCurrent(rc)
        assert tex.GetRstTextureIndex() == tex.id
        assert tex.GetVideoTextureDesc()["in_video_memory"]

    def test_entity_surface(self):
        ctx, rc, cam = _ctx()
        obj, mesh, mat = _tri(ctx)
        obj.SetZOrder(7)
        assert obj.GetZOrder() == 7
        assert obj.IsToBeRendered()
        assert not obj.IsToBeRenderedLast()
        from ckrenderengine_tpu.raster.types import VXBLEND
        mat.EnableAlphaBlend(True)
        mat.SetSourceBlend(int(VXBLEND.SRCALPHA))
        mat.SetDestBlend(int(VXBLEND.INVSRCALPHA))
        assert obj.IsToBeRenderedLast()
        obj.SetPosition((1, 2, 3))
        obj.SaveLastFrameMatrix()
        np.testing.assert_allclose(obj.GetLastFrameMatrix()[3, :3], [1, 2, 3],
                                   atol=1e-6)
        obj.WorldMatrixChanged()
        obj.LocalMatrixChanged()
        obj.WorldPositionChanged()
        assert obj.GetMemoryOccupation() > 0


class TestAlphaTransparencyRule:
    """Locks the reference's transparency classification (reference
    tests/test_material.cpp:12-28 and src/CKMaterial.cpp:2066-2077):
    a material is truly transparent iff alpha-blend is on, the dest blend
    keeps the background, and it is NOT a depth-writing alpha-test cutout."""

    def test_rule_truth_table(self):
        from ckrenderengine_tpu.objects import CKContext, CKMaterial
        from ckrenderengine_tpu.raster.types import VXBLEND
        ctx = CKContext()
        m = CKMaterial(ctx, "m")
        assert not m.IsAlphaTransparent()               # opaque default
        m.EnableAlphaBlend(True)
        m.SetSourceBlend(int(VXBLEND.SRCALPHA))
        m.SetDestBlend(int(VXBLEND.INVSRCALPHA))
        assert m.IsAlphaTransparent()                   # plain alpha blend
        m.SetDestBlend(int(VXBLEND.ZERO))
        assert not m.IsAlphaTransparent()               # dest ZERO = replace
        m.SetDestBlend(int(VXBLEND.INVSRCALPHA))
        m.EnableAlphaTest(True)                         # cutout...
        m.EnableZWrite(True)                            # ...that writes Z
        assert not m.IsAlphaTransparent()
        m.EnableZWrite(False)                           # non-writing cutout
        assert m.IsAlphaTransparent()
        m.EnableAlphaTest(False)
        m.EnableAlphaBlend(False)
        assert not m.IsAlphaTransparent()
