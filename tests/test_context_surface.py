"""RenderContext API-surface long tail, part 2
(reference include/RCKRenderContext.h): activation, extents/dirty rects,
post-sprite callbacks, root-object queries, add/remove sequences, texture
matrices, state-string dump, material state appliers."""
import numpy as np

from ckrenderengine_tpu.objects import (
    CK2dEntity, CK3dObject, CKCamera, CKContext, CKMaterial, CKMesh,
    CKTargetCamera, CKTexture,
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


def _lit(rc):
    return int((rc.framebuffer()[..., :3].sum(-1) > 0.05).sum())


class TestActivationAndExtents:
    def test_inactive_context_skipped_by_process(self):
        ctx, rc, cam = _ctx()
        obj, mesh, mat = _tri(ctx)
        rm = ctx.GetRenderManager()
        rm.Process()
        frames0 = rc.GetStats().frame_count if hasattr(rc.GetStats(),
                                                       "frame_count") else None
        fb0 = rc.framebuffer().copy()
        rc.Activate(False)
        obj.Show(False)
        rm.Process()                       # must NOT re-render
        np.testing.assert_allclose(rc.framebuffer(), fb0)
        rc.Activate(True)
        rm.Process()
        assert _lit(rc) == 0
        assert frames0 is None or True

    def test_extents_and_dirty_rects(self):
        ctx, rc, cam = _ctx()
        rc.SetCurrentExtents((5, 5, 10, 10))
        rc.AddExtents2D((0, 0, 8, 20))
        assert rc.GetCurrentExtents() == (0.0, 0.0, 10.0, 20.0)
        rc.AddDirtyRect((1, 2, 3, 4))
        rc.AddDirtyRect()
        assert len(rc.GetDirtyRects()) == 2
        assert rc.GetDirtyRects()[1] == (0, 0, 64, 64)
        rc.ResetDirtyRects()
        assert rc.GetDirtyRects() == []

    def test_full_viewport(self):
        ctx, rc, cam = _ctx()
        rc.SetViewRect(4, 4, 10, 10)
        rc.SetFullViewport()
        assert tuple(rc.GetViewRect()) == (0, 0, 64, 64)


class TestCallbacksAndSequences:
    def test_post_sprite_callbacks(self):
        ctx, rc, cam = _ctx()
        order = []
        rc.AddPostSpriteRenderCallBack(lambda dev, a: order.append("sprite"))
        rc.AddPostRenderCallBack(lambda dev, a: order.append("post"))
        rc.Render()
        assert order == ["sprite", "post"]
        rc.RemovePostSpriteRenderCallBack(rc.post_sprite_callbacks[0][1])
        order.clear()
        rc.ExecutePostSpriteCallbacks()
        assert order == []

    def test_execute_callbacks_manual(self):
        ctx, rc, cam = _ctx()
        seen = []
        rc.AddPreRenderCallBack(lambda dev, a: seen.append("pre"))
        rc.ExecutePreRenderCallbacks()
        rc.ExecutePostRenderCallbacks()
        assert seen == ["pre"]

    def test_add_remove_sequence_batches_recompiles(self):
        ctx, rc, cam = _ctx()
        v0 = ctx._topology_version
        rc.AddRemoveSequence(True)
        for _ in range(5):
            _tri(ctx)
        assert ctx._topology_version == v0
        rc.AddRemoveSequence(False)
        assert ctx._topology_version == v0 + 1
        rc.Render()
        assert _lit(rc) > 0                # all five visible

    def test_change_current_render_options(self):
        ctx, rc, cam = _ctx()
        rc.SetCurrentRenderOptions(0b1100)
        assert rc.ChangeCurrentRenderOptions(add=0b0011, remove=0b1000) \
            == 0b0111
        assert rc.GetCurrentRenderOptions() == 0b0111


class TestRootQueriesAndCameras:
    def test_compute_root_objects(self):
        ctx, rc, cam = _ctx()
        a, _, _ = _tri(ctx)
        b, _, _ = _tri(ctx)
        b.SetParent(a)
        roots3d = rc.Compute3dRootObjects()
        assert a in roots3d and b not in roots3d and cam in roots3d
        e2 = CK2dEntity(ctx, "hud")
        e2b = CK2dEntity(ctx, "bg")
        e2b.SetBackground(True)
        roots2d = rc.Compute2dRootObjects()
        assert roots2d[0] is e2b and e2 in roots2d

    def test_prepare_cameras_aims_target_camera(self):
        ctx, rc, cam = _ctx()
        tcam = CKTargetCamera(ctx, "tc")
        tcam.SetPosition((0, 0, -5))
        tgt, _, _ = _tri(ctx)
        tgt.SetPosition((10, 0, -5))
        tcam.SetTarget(tgt)
        rc.PrepareCameras()
        d = tcam.GetWorldMatrix()[2, :3]   # z axis = look dir
        np.testing.assert_allclose(d / np.linalg.norm(d), [1, 0, 0],
                                   atol=1e-5)
        assert rc.UpdateProjection(True)

    def test_check_object_extents(self):
        ctx, rc, cam = _ctx()
        obj, mesh, mat = _tri(ctx)
        rc.Render()
        assert rc.CheckObjectExtents(obj)

    def test_detach_all_on_context(self):
        ctx, rc, cam = _ctx()
        obj, _, _ = _tri(ctx)
        rc.Render()
        assert _lit(rc) > 0
        rc.DetachAll()
        rc.Render()
        assert _lit(rc) == 0


class TestImmediateState:
    def test_texture_matrix_scrolls_uvs(self):
        ctx, rc, cam = _ctx()
        tex = CKTexture(ctx, "t")
        img = np.zeros((8, 8, 4), np.float32)
        img[:, :4] = (1, 0, 0, 1)          # left half red
        img[:, 4:] = (0, 0, 1, 1)          # right half blue
        tex.SetImage(img)
        rc.SetTexture(tex)
        s = rc.GetDrawPrimitiveStructure(transformed=True, vertex_count=3)
        s["positions"][:] = [[-1, -1, 0.5, 1], [0, 1.5, 0.5, 1],
                             [1, -1, 0.5, 1]]
        s["uvs"][:] = [[0.1, 0.5], [0.1, 0.5], [0.1, 0.5]]
        rc.Clear()
        rc.DrawPrimitive(2)                # red-ish
        red = rc.framebuffer()[..., 0].sum()
        m = np.eye(4, dtype=np.float32)
        m[3, 0] = 0.5                      # shift u by +0.5
        rc.SetTextureMatrix(m)
        np.testing.assert_allclose(rc.GetTextureMatrix(), m)
        rc.Clear()
        rc.DrawPrimitive(2)
        blue = rc.framebuffer()[..., 2].sum()
        assert red > 1.0 and blue > 1.0
        assert rc.framebuffer()[..., 0].sum() < red / 4

    def test_texture_stage_state_store(self):
        ctx, rc, cam = _ctx()
        assert rc.SetTextureStageState(0, 3, 7)
        assert rc.GetTextureStageState(0, 3) == 7
        assert rc.GetTextureStageState(1, 3) is None

    def test_material_state_appliers_and_state_string(self):
        from ckrenderengine_tpu.raster.types import VXBLEND, VXCMP
        ctx, rc, cam = _ctx()
        mat = CKMaterial(ctx, "m")
        mat.EnableAlphaBlend(True)
        mat.SetSourceBlend(int(VXBLEND.SRCALPHA))
        mat.SetDestBlend(int(VXBLEND.INVSRCALPHA))
        mat.SetZFunc(int(VXCMP.ALWAYS))
        mat.SetTwoSided(True)
        mat.AlphaBlend(rc)
        mat.ZFunc(rc)
        mat.TwoSided(rc)
        mat.ZWrite(rc)
        mat.PerspectiveCorrection(rc)
        mat.AlphaTest(rc)
        mat.AlphaFunc(rc)
        st = rc._dp_state
        assert st.alpha_blend and st.src_blend == int(VXBLEND.SRCALPHA)
        assert st.z_func == int(VXCMP.ALWAYS)
        dump = rc.FillStateString(mat)
        assert "AlphaBlend: On" in dump and "ZFunc:" in dump
        dump2 = rc.FillStateString()
        assert "SrcBlend:" in dump2

    def test_sprite3d_batch_on_material(self):
        ctx, rc, cam = _ctx()
        mat = CKMaterial(ctx, "m")
        assert mat.AddSprite3DBatch("s1") == 1
        assert mat.GetSprite3DBatch() == ["s1"]
        mat.FlushSprite3DBatch()
        assert mat.GetSprite3DBatch() == []

    def test_screen_backup_restore(self):
        ctx, rc, cam = _ctx()
        obj, _, _ = _tri(ctx)
        rc.Render()
        rc.BackupScreen()
        fb0 = rc.framebuffer().copy()
        obj.Show(False)
        rc.Render()
        assert _lit(rc) == 0
        assert rc.RestoreScreenBackup()
        np.testing.assert_allclose(rc.framebuffer(), fb0, atol=1e-6)
        rc._screen_backup = None
        assert not rc.RestoreScreenBackup()
