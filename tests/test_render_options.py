"""Render-option appliers, background material quad, moved-entity tracking,
last-frame matrices, per-object callbacks (reference SetRenderOptions /
ApplyRenderOptionChange, src/CKRenderManager.cpp:602-637)."""

import numpy as np
import pytest

from ckrenderengine_tpu.objects import (
    CK3dObject, CKCamera, CKContext, CKMaterial, CKMesh, CKTexture,
)


def _scene(ctx):
    mesh = CKMesh(ctx, "t")
    mesh.SetPositions(np.array([[-1, -1, 0], [0, 1, 0], [1, -1, 0]], np.float32))
    mesh.SetFaces(np.array([[0, 1, 2]], np.int32))
    mesh.SetUVs(np.array([[0, 1], [0.5, 0], [1, 1]], np.float32))
    mesh.BuildNormals()
    mat = CKMaterial(ctx, "m")
    mat.SetEmissive((1, 0, 0, 1))
    mat.SetTwoSided(True)
    mesh.ApplyGlobalMaterial(mat)
    obj = CK3dObject(ctx, "tri")
    obj.SetCurrentMesh(mesh)
    rm = ctx.GetRenderManager()
    rc = rm.CreateRenderContext(64, 64)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0, 0, -4))
    rc.AttachViewpointToCamera(cam)
    return rm, rc, obj, mat, mesh


class TestOptions:
    def test_force_linear_fog(self):
        ctx = CKContext()
        rm, rc, obj, mat, mesh = _scene(ctx)
        rc.SetFogMode(1)    # EXP
        rm.SetRenderOptions("ForceLinearFog", 1)
        assert rc._effective_fog_mode() == 3
        rm.SetRenderOptions("ForceLinearFog", 0)
        assert rc._effective_fog_mode() == 1

    def test_disable_specular_changes_pixels(self):
        ctx = CKContext()
        rm, rc, obj, mat, mesh = _scene(ctx)
        from ckrenderengine_tpu.objects import CKLight
        from ckrenderengine_tpu.raster.types import VXLIGHT

        mat.SetEmissive((0, 0, 0, 1))
        mat.SetDiffuse((0.8, 0.1, 0.1, 1))
        mat.SetSpecular((1, 1, 1, 1))
        mat.SetPower(10.0)
        sun = CKLight(ctx, "sun")
        sun.SetType(int(VXLIGHT.DIREC))
        sun.SetOrientation((0, 0, 1))
        sun.SetSpecularFlag(True)
        rc.Render()
        fb_spec = rc.framebuffer().copy()
        rm.SetRenderOptions("DisableSpecular", 1)
        rc.Render()
        fb_nospec = rc.framebuffer()
        assert fb_spec.sum() > fb_nospec.sum()

    def test_background_material_fullscreen_quad(self):
        ctx = CKContext()
        rm, rc, obj, mat, mesh = _scene(ctx)
        obj.Show(False)
        tex = CKTexture(ctx, "bg")
        img = np.zeros((8, 8, 4), np.float32)
        img[..., 2] = 1.0
        img[..., 3] = 1.0
        tex.SetImage(img)
        bgmat = CKMaterial(ctx, "bgmat")
        bgmat.SetTexture(tex)
        rc.SetBackgroundMaterial(bgmat)
        rc.Render()
        fb = rc.framebuffer()
        assert fb[2, 2, 2] == pytest.approx(1.0, abs=1e-4)   # blue everywhere
        assert fb[60, 60, 2] == pytest.approx(1.0, abs=1e-4)


class TestProcessBookkeeping:
    def test_moved_entities_and_cleanup(self):
        ctx = CKContext()
        rm, rc, obj, mat, mesh = _scene(ctx)
        import ckrenderengine_tpu.scene.entity_table as et

        rm.PreProcess()
        obj.SetPosition((1, 0, 0))
        assert obj.id in rm._moved_entities
        assert ctx.entity_table.flags[obj.row] & et.VX_MOVEABLE_HASMOVED
        rm.PostProcess()
        assert not (ctx.entity_table.flags[obj.row] & et.VX_MOVEABLE_HASMOVED)

    def test_last_frame_matrix(self):
        ctx = CKContext()
        rm, rc, obj, mat, mesh = _scene(ctx)
        rm.PreProcess()
        before = obj.GetWorldMatrix()
        obj.SetPosition((5, 0, 0))
        np.testing.assert_allclose(obj.GetLastFrameMatrix(), before)
        rm.PreProcess()
        np.testing.assert_allclose(obj.GetLastFrameMatrix()[3, :3], [5, 0, 0])

    def test_object_callbacks_fire_and_temp_cleanup(self):
        ctx = CKContext()
        rm, rc, obj, mat, mesh = _scene(ctx)
        calls = []
        obj.AddPreRenderCallBack(
            lambda dev, o, arg: calls.append(("pre", o)), temp=False)
        obj.AddPostRenderCallBack(
            lambda dev, o, arg: calls.append(("post", o)), temp=True)
        rc.Render()
        assert ("pre", obj) in calls and ("post", obj) in calls
        rm.PostProcess()         # temp callbacks dropped
        calls.clear()
        rc.Render()
        assert ("pre", obj) in calls
        assert ("post", obj) not in calls


class TestCameraRatioLetterbox:
    """CK_RENDER_USECAMERARATIO letterboxing (reference
    CKRenderedScene::UpdateViewportSize, src/CKRenderedScene.cpp:538-618)."""

    def test_default_camera_tracks_window(self):
        # Aspect never set explicitly -> no letterbox even though the flag
        # is on by default (documented deviation; reference defaults 4:3).
        ctx = CKContext()
        rm, rc, obj, mat, mesh = _scene(ctx)
        assert rc._effective_viewport() == (0, 0, 64, 64)

    def test_wide_camera_letterboxes_square_window(self):
        ctx = CKContext()
        rm, rc, obj, mat, mesh = _scene(ctx)
        rc.attached_camera.SetAspectRatio(2, 1)
        rc.Render()
        assert rc._effective_viewport() == (0, 16, 64, 32)
        fb = rc.framebuffer()
        # Bars above/below the 32-px band keep the clear color (black).
        assert fb[:8].sum() == 0 and fb[-8:].sum() == 0
        assert fb[16:48].sum() > 0

    def test_tall_camera_pillarboxes(self):
        ctx = CKContext()
        rm, rc, obj, mat, mesh = _scene(ctx)
        rc.attached_camera.SetAspectRatio(1, 2)
        assert rc._effective_viewport() == (16, 0, 32, 64)

    def test_ignore_aspect_and_flag_removal(self):
        from ckrenderengine_tpu.objects.manager import (
            CK_RENDER_USECAMERARATIO)
        ctx = CKContext()
        rm, rc, obj, mat, mesh = _scene(ctx)
        cam = rc.attached_camera
        cam.SetAspectRatio(2, 1)
        cam.IgnoreAspectRatio(True)
        assert rc._effective_viewport() == (0, 0, 64, 64)
        cam.IgnoreAspectRatio(False)
        assert rc._effective_viewport()[3] == 32
        rc.RemoveCurrentRenderOptions(CK_RENDER_USECAMERARATIO)
        rc.Render()   # refresh per-frame resolved flags
        assert rc._effective_viewport() == (0, 0, 64, 64)

    def test_resolve_render_flags(self):
        from ckrenderengine_tpu.objects.manager import (
            CK_RENDER_CLEARZBUFFER, CK_RENDER_DEFAULTSETTINGS)
        ctx = CKContext()
        rm, rc, obj, mat, mesh = _scene(ctx)
        assert rc.GetCurrentRenderOptions() == CK_RENDER_DEFAULTSETTINGS
        # No option bits -> stored settings; explicit bits win.
        assert rc.ResolveRenderFlags(0) == CK_RENDER_DEFAULTSETTINGS
        assert rc.ResolveRenderFlags(CK_RENDER_CLEARZBUFFER) == \
            CK_RENDER_CLEARZBUFFER


class TestRenderExtents:
    """Lazy screen extents (reference RCK3dEntity::GetRenderExtents,
    src/CK3dEntity.cpp:2713)."""

    def test_centered_object_extents(self):
        ctx = CKContext()
        rm, rc, obj, mat, mesh = _scene(ctx)
        assert obj.GetRenderExtents() is None   # never rendered
        rc.Render()
        l, t, r, b = obj.GetRenderExtents()
        # Unit-ish triangle at origin, camera on axis: extents centered.
        assert 0 <= l < 32 < r <= 64
        assert 0 <= t < 32 < b <= 64
        assert abs((l + r) / 2 - 32) < 2

    def test_offscreen_object_has_no_extents(self):
        ctx = CKContext()
        rm, rc, obj, mat, mesh = _scene(ctx)
        rc.Render()
        obj.SetPosition((0, 0, -10))            # behind the camera
        assert obj.GetRenderExtents() is None


class TestNoClearAccumulation:
    """CLEARBACK/CLEARZ off: rendering accumulates over the previous frame
    (reference Clear flag handling, src/CKRenderContext.cpp:438-544)."""

    def _noclear(self):
        from ckrenderengine_tpu.objects.manager import (
            CK_RENDER_CLEARBACKBUFFER, CK_RENDER_CLEARZBUFFER,
            CK_RENDER_DEFAULTSETTINGS)
        return CK_RENDER_DEFAULTSETTINGS & ~(
            CK_RENDER_CLEARBACKBUFFER | CK_RENDER_CLEARZBUFFER)

    def test_trail_persists_and_kept_z_occludes(self):
        ctx = CKContext()
        rm, rc, obj, mat, mesh = _scene(ctx)
        obj.SetScale((0.3, 0.3, 1))
        obj.SetPosition((-0.8, 0, 0))
        rc.Render()
        fb1 = np.asarray(rc.framebuffer())
        cov1 = fb1[..., :3].sum(-1) > 0.05

        obj.SetPosition((0.8, 0, 0))
        rc.Render(self._noclear())
        fb2 = np.asarray(rc.framebuffer())
        cov2 = fb2[..., :3].sum(-1) > 0.05
        # both the old and the new quad are visible (trail)
        assert cov2.sum() > cov1.sum() * 1.7
        assert (cov2 & cov1).sum() >= cov1.sum() * 0.95

        # kept z: a green backdrop drawn BEHIND must not repaint the
        # red quads' pixels
        obj.SetScale((4.0, 4.0, 1))
        obj.SetPosition((0, 0, 0.9))
        mat.SetEmissive((0, 1, 0, 1))
        rc.Render(self._noclear())
        fb3 = np.asarray(rc.framebuffer())
        old_px = fb3[cov2]
        assert (old_px[:, 0] > 0.5).mean() > 0.95   # red quads survive
        new_px = fb3[~cov2]
        assert (new_px[:, 1] > 0.5).mean() > 0.9    # backdrop fills the rest
        assert (new_px[:, 0] < 0.5).mean() > 0.9

    def test_clearing_resets(self):
        ctx = CKContext()
        rm, rc, obj, mat, mesh = _scene(ctx)
        obj.SetScale((0.3, 0.3, 1))
        obj.SetPosition((-0.8, 0, 0))
        rc.Render()
        obj.SetPosition((0.8, 0, 0))
        rc.Render()                      # default flags clear
        fb = np.asarray(rc.framebuffer())
        cov = fb[..., :3].sum(-1) > 0.05
        ys, xs = np.nonzero(cov)
        assert xs.min() > 32             # left quad gone


def test_sprite_pass_flags_gate_2d():
    """CK_RENDER_BACKGROUNDSPRITES/FOREGROUNDSPRITES skip the 2D passes."""
    from ckrenderengine_tpu.objects import CK2dEntity
    from ckrenderengine_tpu.objects.manager import (
        CK_RENDER_DEFAULTSETTINGS, CK_RENDER_FOREGROUNDSPRITES)

    ctx = CKContext()
    rc = ctx.GetRenderManager().CreateRenderContext(32, 32)
    hud = CK2dEntity(ctx, "hud")
    hud.SetRect((0, 0, 32, 32))
    hud.SetColor((0, 1, 0, 1))
    hud.SetBackground(False)
    rc.Render()
    assert np.asarray(rc.framebuffer())[..., 1].sum() > 100
    rc.Render(CK_RENDER_DEFAULTSETTINGS & ~CK_RENDER_FOREGROUNDSPRITES)
    assert np.asarray(rc.framebuffer())[..., 1].sum() == 0
    rc.Render()
    assert np.asarray(rc.framebuffer())[..., 1].sum() > 100
