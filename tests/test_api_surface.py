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
