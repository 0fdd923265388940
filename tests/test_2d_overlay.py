"""2D overlay + Sprite3D billboard tests (SURVEY §2.4): CK2dEntity trees,
sprites, sprite text, compositing order, picking, billboards in the frame
program."""

import numpy as np
import pytest

from ckrenderengine_tpu.objects import (
    CK2dEntity, CK3dObject, CKCamera, CKContext, CKMaterial, CKMesh,
    CKSprite, CKSprite3D, CKSpriteText, CKTexture,
)


def _rc(ctx, w=64, h=64, cam=True):
    rm = ctx.GetRenderManager()
    rc = rm.CreateRenderContext(w, h)
    if cam:
        c = CKCamera(ctx, "cam")
        c.SetPosition((0, 0, -5))
        rc.AttachViewpointToCamera(c)
    return rc


class Test2dEntity:
    def test_screen_rect_pixel_and_homogeneous(self):
        ctx = CKContext()
        e = CK2dEntity(ctx, "e")
        e.SetPosition((10, 20))
        e.SetSize((30, 40))
        assert tuple(e.screen_rect(64, 64)) == (10, 20, 40, 60)
        h = CK2dEntity(ctx, "h")
        h.SetPosition((0.25, 0.5), hom=True)
        h.SetSize((0.5, 0.25), hom=True)
        assert tuple(h.screen_rect(100, 200)) == (25, 100, 75, 150)

    def test_child_rect_relative_to_parent(self):
        ctx = CKContext()
        p = CK2dEntity(ctx, "p")
        p.SetPosition((10, 10))
        p.SetSize((40, 40))
        c = CK2dEntity(ctx, "c")
        c.SetParent(p)
        c.SetPosition((0.5, 0.0), hom=True)
        c.SetSize((10, 10))
        assert tuple(c.screen_rect(64, 64)) == (30, 10, 40, 20)
        # clip to parent
        c.SetPosition((35, 35))
        c.EnableClipToParent(True)
        x0, y0, x1, y1 = c.screen_rect(64, 64)
        assert (x1, y1) == (50, 50)

    def test_cycle_rejected(self):
        ctx = CKContext()
        a = CK2dEntity(ctx, "a")
        b = CK2dEntity(ctx, "b")
        assert b.SetParent(a)
        assert not a.SetParent(b)

    def test_pick_front_most(self):
        ctx = CKContext()
        a = CK2dEntity(ctx, "a")
        a.SetRect((0, 0, 40, 40))
        b = CK2dEntity(ctx, "b")
        b.SetRect((20, 20, 60, 60))
        b.SetZOrder(5)
        # emulate Pick2D over root list front-to-back
        hit = None
        for e in sorted([a, b], key=lambda x: -x.zorder):
            hit = e.Pick(30, 30, 64, 64)
            if hit is not None:
                break
        assert hit is b

    def test_foreground_quad_renders_over_3d(self):
        ctx = CKContext()
        rc = _rc(ctx)
        q = CK2dEntity(ctx, "hud")
        q.SetRect((0, 0, 16, 16))
        q.SetColor((0, 1, 0, 1))
        rc.Render()
        fb = rc.framebuffer()
        assert fb[8, 8, 1] == pytest.approx(1.0, abs=1e-5)
        assert fb[40, 40, 1] == pytest.approx(0.0, abs=1e-5)

    def test_background_quad_behind_3d(self):
        ctx = CKContext()
        rc = _rc(ctx)
        bgq = CK2dEntity(ctx, "bg")
        bgq.SetRect((0, 0, 64, 64))
        bgq.SetColor((0, 0, 1, 1))
        bgq.SetBackground(True)
        # a red triangle in front of the camera
        mesh = CKMesh(ctx, "t")
        mesh.SetPositions(np.array([[-1, -1, 0], [0, 1, 0], [1, -1, 0]],
                                   np.float32))
        mesh.SetFaces(np.array([[0, 1, 2]], np.int32))
        mesh.BuildNormals()
        mat = CKMaterial(ctx, "m")
        mat.SetEmissive((1, 0, 0, 1))   # self-lit: no lights in this scene
        mat.SetTwoSided(True)
        mesh.ApplyGlobalMaterial(mat)
        obj = CK3dObject(ctx, "tri")
        obj.SetCurrentMesh(mesh)
        rc.Render()
        fb = rc.framebuffer()
        # corner: background quad visible (blue); center: triangle (red-ish)
        assert fb[2, 2, 2] == pytest.approx(1.0, abs=1e-5)
        assert fb[32, 32, 0] > 0.05
        assert fb[32, 32, 2] < 0.5

    def test_alpha_blend_compositing(self):
        ctx = CKContext()
        rc = _rc(ctx, cam=False)
        under = CK2dEntity(ctx, "under")
        under.SetRect((0, 0, 32, 32))
        under.SetColor((1, 0, 0, 1))
        over = CK2dEntity(ctx, "over")
        over.SetRect((0, 0, 32, 32))
        over.SetColor((0, 0, 1, 0.5))
        over.SetZOrder(1)
        rc.Render()
        fb = rc.framebuffer()
        assert fb[16, 16, 0] == pytest.approx(0.5, abs=0.02)
        assert fb[16, 16, 2] == pytest.approx(0.5, abs=0.02)


class TestSprite:
    def test_sprite_image_drawn(self):
        ctx = CKContext()
        rc = _rc(ctx, cam=False)
        sp = CKSprite(ctx, "s")
        img = np.zeros((8, 8, 4), np.float32)
        img[:, :, 1] = 1.0   # green
        img[:, :, 3] = 1.0
        sp.SetImage(img)
        sp.SetPosition((10, 10))
        rc.Render()
        fb = rc.framebuffer()
        assert fb[14, 14, 1] == pytest.approx(1.0, abs=1e-4)
        assert fb[5, 5, 1] == pytest.approx(0.0, abs=1e-4)

    def test_sprite_text_renders_pixels(self):
        ctx = CKContext()
        rc = _rc(ctx, cam=False)
        st = CKSpriteText(ctx, "txt")
        st.SetSize((60, 16))
        st.SetText("FPS 60")
        st.SetTextColor((1, 1, 0, 1))
        st.SetPosition((0, 0))
        rc.Render()
        fb = rc.framebuffer()
        region = fb[0:16, 0:60]
        assert (region[..., 0] > 0.5).sum() > 10   # some yellow text pixels
        st.SetText("FPS 30")
        rc.Render()
        fb2 = rc.framebuffer()
        assert np.abs(fb2 - fb).sum() > 0.1        # re-raster on change

    def test_getters(self):
        ctx = CKContext()
        sp = CKSprite(ctx, "s")
        sp.Create(16, 8)
        assert sp.GetWidth() == 16
        assert sp.GetHeight() == 8
        assert sp.GetSlotCount() == 1


class TestSprite3D:
    def _scene(self, mode):
        ctx = CKContext()
        rc = _rc(ctx)
        sp = CKSprite3D(ctx, "board")
        mat = CKMaterial(ctx, "m")
        mat.SetDiffuse((1, 0, 1, 1))
        sp.SetMaterial(mat)
        sp.SetSize((1.0, 1.0))
        sp.SetMode(mode)
        return ctx, rc, sp

    def test_billboard_faces_camera(self):
        ctx, rc, sp = self._scene(CKSprite3D.MODE_BILLBOARD)
        rc.Render()
        fb = rc.framebuffer()
        assert fb[32, 32, 0] > 0.5   # magenta at center
        # move camera; still faces it (edge-on would vanish)
        cam = rc.GetAttachedCamera()
        cam.SetPosition((5, 0, 0))
        cam.SetOrientation((-1, 0, 0))
        rc.Render()
        fb = rc.framebuffer()
        assert fb[32, 32, 0] > 0.5

    def test_invisible_sprite_not_drawn(self):
        ctx, rc, sp = self._scene(CKSprite3D.MODE_BILLBOARD)
        sp.Show(False)
        rc.Render()
        fb = rc.framebuffer()
        assert fb.sum() == pytest.approx(0.0, abs=1e-5)

    def test_uv_mapping_and_texture(self):
        ctx, rc, sp = self._scene(CKSprite3D.MODE_BILLBOARD)
        sp.material.SetDiffuse((1, 1, 1, 1))   # white: texture unmodulated
        tex = CKTexture(ctx, "t")
        img = np.zeros((8, 8, 4), np.float32)
        img[:4] = (1, 0, 0, 1)     # top half red
        img[4:] = (0, 1, 0, 1)     # bottom half green
        tex.SetImage(img)
        sp.material.SetTexture(tex)
        rc.Render()
        fb = rc.framebuffer()
        # top half of billboard = top of image (red), bottom = green
        assert fb[24, 32, 0] > 0.4 and fb[24, 32, 1] < 0.4
        assert fb[40, 32, 1] > 0.4 and fb[40, 32, 0] < 0.4


class TestSprite3DModes:
    def _axis_scene(self, mode):
        ctx = CKContext()
        rm = ctx.GetRenderManager()
        rc = rm.CreateRenderContext(64, 64)
        cam = CKCamera(ctx, "cam")
        cam.SetPosition((0, 0, -5))
        rc.AttachViewpointToCamera(cam)
        sp = CKSprite3D(ctx, "b")
        mat = CKMaterial(ctx, "m")
        mat.SetEmissive((1, 0, 1, 1))
        sp.SetMaterial(mat)
        sp.SetSize((2.0, 2.0))
        sp.SetMode(mode)
        return ctx, rc, sp, cam

    def test_orientable_uses_entity_axes(self):
        ctx, rc, sp, cam = self._axis_scene(CKSprite3D.MODE_ORIENTABLE)
        rc.Render()
        face_on = (rc.framebuffer()[..., 3] > 0).sum()
        sp.Rotate((0, 1, 0), np.pi / 2 - 0.05)   # nearly edge-on
        rc.Render()
        edge_on = (rc.framebuffer()[..., 3] > 0).sum()
        assert face_on > 200
        assert edge_on < face_on * 0.3     # orientable thins out when rotated

    def test_billboard_ignores_entity_rotation(self):
        ctx, rc, sp, cam = self._axis_scene(CKSprite3D.MODE_BILLBOARD)
        rc.Render()
        before = (rc.framebuffer()[..., 3] > 0).sum()
        sp.Rotate((0, 1, 0), 1.2)
        rc.Render()
        after = (rc.framebuffer()[..., 3] > 0).sum()
        assert abs(int(before) - int(after)) <= 4   # always faces the camera

    def test_yrotate_locks_entity_right_axis(self):
        ctx, rc, sp, cam = self._axis_scene(CKSprite3D.MODE_YROTATE)
        sp.Rotate((0, 1, 0), np.pi / 2 - 0.05)     # right axis toward camera
        rc.Render()
        narrow = (rc.framebuffer()[..., 3] > 0).sum()
        sp.SetMode(CKSprite3D.MODE_BILLBOARD)
        rc.Render()
        wide = (rc.framebuffer()[..., 3] > 0).sum()
        assert narrow < wide * 0.5         # width axis follows the entity


class TestMovieSprite:
    """Movie sprites decode multi-frame images into slots (reference
    RCKSprite movie load, include/RCKSprite.h; AVI codecs replaced by
    PIL's animated GIF/APNG/TIFF decoders)."""

    def test_gif_movie_frames_render_by_time(self, tmp_path):
        from PIL import Image
        from ckrenderengine_tpu.objects import CKSprite

        frames = []
        for c in ((255, 0, 0), (0, 255, 0), (0, 0, 255)):
            a = np.zeros((16, 16, 3), np.uint8)
            a[:] = c
            frames.append(Image.fromarray(a))
        p = str(tmp_path / "movie.gif")
        frames[0].save(p, save_all=True, append_images=frames[1:],
                       duration=[40, 60, 100], loop=0)

        ctx = CKContext()
        rc = ctx.GetRenderManager().CreateRenderContext(32, 32)
        sp = CKSprite(ctx, "movie")
        assert sp.LoadMovie(p)
        assert sp.GetMovieFrameCount() == 3
        assert sp.GetMovieLength() == 200.0
        sp.SetRect((0, 0, 32, 32))
        sp.SetBackground(False)
        expected = {0: (1, 0, 0), 50: (0, 1, 0), 150: (0, 0, 1),
                    250: (0, 1, 0)}   # 250 wraps into frame 1
        for t, rgb in expected.items():
            sp.SetMovieTime(t)
            rc.Render()
            c = np.asarray(rc.framebuffer())[16, 16, :3]
            np.testing.assert_allclose(c, rgb, atol=1e-5)

    def test_missing_file_returns_false(self):
        from ckrenderengine_tpu.objects import CKSprite
        ctx = CKContext()
        sp = CKSprite(ctx, "m")
        assert not sp.LoadMovie("/nonexistent/clip.gif")

    def test_avi_movie_via_opencv(self, tmp_path):
        """AVI containers decode through OpenCV (the reference uses Windows
        VFW codecs, include/RCKSprite.h movie load)."""
        cv2 = pytest.importorskip("cv2")
        from ckrenderengine_tpu.objects import CKSprite

        p = str(tmp_path / "clip.avi")
        w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"MJPG"), 10.0,
                            (32, 32))
        for i in range(5):
            img = np.zeros((32, 32, 3), np.uint8)
            img[..., 2] = 50 * i          # red ramp (BGR layout)
            w.write(img)
        w.release()

        ctx = CKContext()
        sp = CKSprite(ctx, "movie")
        assert sp.LoadMovie(p)
        assert sp.GetMovieFrameCount() == 5
        assert sp.GetMovieLength() == pytest.approx(500.0)
        sp.SetMovieTime(250.0)            # 100 ms/frame -> slot 2
        img = sp.GetImage(sp.GetCurrentSlot())
        assert abs(float(img[..., 0].mean()) - 100 / 255) < 0.05  # MJPG lossy
        assert np.all(img[..., 3] == 1.0)


class TestWindowedQuadFootprint:
    """Regression (round-3 review): a win_cap-wide quad with fractional
    origin > .5 must keep its LAST covered pixel column/row — the window
    base must come from the integer pixel-center footprint."""

    def test_fractional_origin_capwide_quad(self):
        import jax.numpy as jnp
        from ckrenderengine_tpu.pipeline.overlay import (
            QuadBank, composite_quads,
        )

        h, w = 16, 512
        fb = jnp.zeros((4, h, w), jnp.float32)
        bank = QuadBank(
            rect=jnp.asarray([[10.75, 2.0, 266.75, 10.0]], jnp.float32),
            uvrect=jnp.asarray([[0, 0, 1, 1]], jnp.float32),
            color=jnp.asarray([[1.0, 1.0, 1.0, 1.0]], jnp.float32),
            tex=jnp.asarray([-1], jnp.int32),
            blend=jnp.asarray([0], jnp.int32),
            valid=jnp.asarray([True]))
        tex_planes = jnp.zeros((1, 4, 2, 2), jnp.float32)
        tex_hw = jnp.asarray([[2, 2]], jnp.int32)
        out = np.asarray(composite_quads(fb, bank, tex_planes, tex_hw, h, w,
                                         win_cap=256))
        row = out[0, 5]
        covered = np.nonzero(row > 0.5)[0]
        # centers 11..266 inclusive are inside [10.75, 266.75)
        assert covered.min() == 11 and covered.max() == 266
        assert covered.size == 256

    def test_win_cap_param_is_static(self):
        import jax.numpy as jnp
        from ckrenderengine_tpu.pipeline.overlay import (
            QuadBank, composite_quads,
        )

        h, w = 16, 64
        fb = jnp.zeros((4, h, w), jnp.float32)
        bank = QuadBank(
            rect=jnp.asarray([[2.0, 2.0, 10.0, 10.0]], jnp.float32),
            uvrect=jnp.asarray([[0, 0, 1, 1]], jnp.float32),
            color=jnp.asarray([[1.0, 0.0, 0.0, 1.0]], jnp.float32),
            tex=jnp.asarray([-1], jnp.int32),
            blend=jnp.asarray([0], jnp.int32),
            valid=jnp.asarray([True]))
        tex_planes = jnp.zeros((1, 4, 2, 2), jnp.float32)
        tex_hw = jnp.asarray([[2, 2]], jnp.int32)
        out = np.asarray(composite_quads(fb, bank, tex_planes, tex_hw, h, w,
                                         win_cap=16))
        assert (out[0] > 0.5).sum() == 64
