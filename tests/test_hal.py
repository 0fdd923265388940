"""Rasterizer HAL facade (reference include/CKRasterizer.h three-class
surface: object-index allocator, driver caps, drawable context with
render-state cache, VB/IB, sprites, display lists)."""
import numpy as np
import pytest

from ckrenderengine_tpu.raster.hal import (
    CKNULLRasterizerStart, CKRasterizer, CKRST_CTXCLEAR_ALL,
    CKRST_OBJ_INDEXBUFFER, CKRST_OBJ_SPRITE, CKRST_OBJ_TEXTURE,
    CKRST_OBJ_VERTEXBUFFER, RSC_LOCKED, VXMATRIX_PROJECTION, VXMATRIX_VIEW,
    VXMATRIX_WORLD, VXRENDERSTATE, CKRasterizerContext,
)
from ckrenderengine_tpu.raster.types import VXCMP, VXPRIMITIVE


def _ctx(w=32, h=32):
    rst = CKRasterizer()
    rst.Start(None)
    drv = rst.GetDriver(0)
    c = drv.CreateContext()
    assert c.Create(None, w, h)
    return rst, drv, c


def _proj(n=1.0, f=100.0):
    m = np.zeros((4, 4), np.float32)
    m[0, 0] = m[1, 1] = 1.0
    m[2, 2] = f / (f - n)
    m[3, 2] = -n * f / (f - n)
    m[2, 3] = 1.0
    return m


class TestAllocator:
    def test_shared_index_space_per_kind(self):
        rst = CKRasterizer()
        rst.Start(None)
        t0 = rst.CreateObjectIndex(CKRST_OBJ_TEXTURE)
        t1 = rst.CreateObjectIndex(CKRST_OBJ_TEXTURE)
        s0 = rst.CreateObjectIndex(CKRST_OBJ_SPRITE)
        assert t0 != t1
        assert s0 == t0            # kinds share the slot table byte-masks
        assert rst.ReleaseObjectIndex(t0, CKRST_OBJ_TEXTURE)
        t2 = rst.CreateObjectIndex(CKRST_OBJ_TEXTURE)
        assert t2 == t0            # first-free cursor rewinds

    def test_linked_rasterizers_mirror_indices(self):
        a, b = CKRasterizer(), CKRasterizer()
        a.Start(None)
        b.Start(None)
        a.LinkRasterizer(b)
        i = a.CreateObjectIndex(CKRST_OBJ_VERTEXBUFFER)
        assert b._objects_index[i] & CKRST_OBJ_VERTEXBUFFER
        a.RemoveLinkedRasterizer(b)

    def test_null_rasterizer_start(self):
        rst = CKNULLRasterizerStart()
        assert rst.GetDriverCount() == 2
        assert rst.GetDriver(0).IsHardware()
        assert not rst.GetDriver(1).IsHardware()
        assert rst.GetDriver(5) is None


class TestDriver:
    def test_caps_and_formats(self):
        rst, drv, c = _ctx()
        assert drv.caps.max_texture_width >= 1024
        assert drv.FindNearestTextureFormat("DXT1") == "DXT1"
        assert drv.FindNearestTextureFormat("weird") == "32_ARGB8888"
        assert drv.FindNearestDepthFormat() == "D32F"
        assert len(drv.display_modes) >= 2

    def test_video_card_file_clamps(self, tmp_path):
        ini = tmp_path / "cards.ini"
        ini.write_text("[tpu-xla]\nMaxTextureWidth = 2048\n")
        rst, drv, c = _ctx()
        assert rst.LoadVideoCardFile(str(ini))
        assert drv.caps.max_texture_width <= 2048
        assert not rst.LoadVideoCardFile(str(tmp_path / "missing.ini"))


class TestStateCache:
    def test_defaults_and_hit_miss(self):
        rst, drv, c = _ctx()
        assert c.GetRenderState(VXRENDERSTATE.ZFUNC) == int(VXCMP.LESSEQUAL)
        h0, m0 = c.render_state_cache_hit, c.render_state_cache_miss
        c.SetRenderState(VXRENDERSTATE.ZFUNC, int(VXCMP.LESSEQUAL))  # same
        assert c.render_state_cache_hit == h0 + 1
        c.SetRenderState(VXRENDERSTATE.ZFUNC, int(VXCMP.ALWAYS))     # change
        assert c.render_state_cache_miss == m0 + 1
        assert c.GetRenderState(VXRENDERSTATE.ZFUNC) == int(VXCMP.ALWAYS)

    def test_locked_state_rejects_writes(self):
        rst, drv, c = _ctx()
        c.SetRenderState(VXRENDERSTATE.FOGENABLE, 1)
        c.SetRenderStateFlags(VXRENDERSTATE.FOGENABLE, RSC_LOCKED)
        c.SetRenderState(VXRENDERSTATE.FOGENABLE, 0)
        assert c.GetRenderState(VXRENDERSTATE.FOGENABLE) == 1
        c.SetRenderStateFlags(VXRENDERSTATE.FOGENABLE, 0)
        c.SetRenderState(VXRENDERSTATE.FOGENABLE, 0)
        assert c.GetRenderState(VXRENDERSTATE.FOGENABLE) == 0

    def test_flush_restores_defaults_keeps_locked(self):
        rst, drv, c = _ctx()
        c.SetRenderState(VXRENDERSTATE.ZFUNC, int(VXCMP.ALWAYS))
        c.SetRenderState(VXRENDERSTATE.SRCBLEND, 5)
        c.SetRenderStateFlags(VXRENDERSTATE.SRCBLEND, RSC_LOCKED)
        c.FlushRenderStateCache()
        assert c.GetRenderState(VXRENDERSTATE.ZFUNC) == int(VXCMP.LESSEQUAL)
        assert c.GetRenderState(VXRENDERSTATE.SRCBLEND) == 5
        c.InvalidateStateCache()
        assert c.GetRSCacheValue(VXRENDERSTATE.ZFUNC) is None


class TestDrawing:
    def test_clear_and_scene_bracket(self):
        rst, drv, c = _ctx()
        assert c.BeginScene() and not c.BeginScene()
        assert c.Drawing()
        assert c.Clear(CKRST_CTXCLEAR_ALL, 0xFF4080C0)
        img = c.BackToFront()
        np.testing.assert_allclose(img[0, 0], [0x40 / 255, 0x80 / 255,
                                               0xC0 / 255, 1.0], atol=1e-6)
        assert c.EndScene() and not c.EndScene()

    def test_draw_primitive_transformed(self):
        rst, drv, c = _ctx()
        c.Clear()
        data = {"positions": np.array([[-1, -1, 0.5, 1], [0, 1, 0.5, 1],
                                       [1, -1, 0.5, 1]], np.float32),
                "colors": np.tile([1, 0, 0, 1], (3, 1)).astype(np.float32),
                "transformed": True}
        assert c.DrawPrimitive(int(VXPRIMITIVE.TRIANGLELIST), None, data)
        img = c.BackToFront()
        assert img[..., 0].sum() > 10
        assert c.stats["NbTrianglesDrawn"] == 1

    def test_draw_primitive_local_with_lighting(self):
        rst, drv, c = _ctx()
        c.SetTransformMatrix(VXMATRIX_WORLD, np.eye(4, dtype=np.float32))
        view = np.eye(4, dtype=np.float32)
        view[3, 2] = 5.0                   # camera at z=-5
        c.SetTransformMatrix(VXMATRIX_VIEW, view)
        c.SetTransformMatrix(VXMATRIX_PROJECTION, _proj())
        c.SetLight(0, {"direction": (0, 0, 1), "diffuse": (0, 1, 0)})
        c.EnableLight(0)
        c.SetMaterial({"diffuse": (1, 1, 1, 1)})
        c.Clear()
        data = {"positions": np.array([[-1, -1, 0], [0, 1.5, 0], [1, -1, 0]],
                                      np.float32),
                "normals": np.tile([0, 0, -1], (3, 1)).astype(np.float32)}
        assert c.DrawPrimitive(int(VXPRIMITIVE.TRIANGLELIST), None, data)
        img = c.BackToFront()
        assert img[..., 1].sum() > 10      # lit green
        assert img[..., 0].sum() < 0.5     # no red/ambient

    def test_vb_ib_path(self):
        rst, drv, c = _ctx()
        vbi = rst.CreateObjectIndex(CKRST_OBJ_VERTEXBUFFER)
        assert c.CreateObject(vbi, CKRST_OBJ_VERTEXBUFFER,
                              {"max_vertices": 8})
        p, col, uv = c.LockVertexBuffer(vbi, 0, 4)
        p[:] = [[-1, -1, 0.5, 1], [-1, 1, 0.5, 1], [1, 1, 0.5, 1],
                [1, -1, 0.5, 1]]
        col[:] = [0, 0, 1, 1]
        assert c.UnlockVertexBuffer(vbi)
        ibi = rst.CreateObjectIndex(CKRST_OBJ_INDEXBUFFER)
        assert c.CreateObject(ibi, CKRST_OBJ_INDEXBUFFER, {"max_indices": 6})
        idx = c.LockIndexBuffer(ibi, 0, 6)
        idx[:] = [0, 1, 2, 0, 2, 3]
        assert c.UnlockIndexBuffer(ibi)
        c.Clear()
        assert c.DrawPrimitiveVBIB(int(VXPRIMITIVE.TRIANGLELIST), vbi, ibi,
                                   index_count=6)
        img = c.BackToFront()
        assert (img[..., 2] > 0.5).mean() > 0.9    # full-screen quad
        assert c.GetVertexBufferData(vbi).shape == (8, 4)
        assert c.GetIndexBufferData(ibi)[:6].tolist() == [0, 1, 2, 0, 2, 3]
        assert c.OptimizeVertexBuffer(vbi)
        assert c.DeleteObject(vbi, CKRST_OBJ_VERTEXBUFFER)

    def test_textured_draw(self):
        rst, drv, c = _ctx()
        ti = rst.CreateObjectIndex(CKRST_OBJ_TEXTURE)
        assert c.CreateObject(ti, CKRST_OBJ_TEXTURE, {"width": 4,
                                                      "height": 4})
        img = np.zeros((4, 4, 4), np.float32)
        img[..., 1] = 1.0
        img[..., 3] = 1.0
        assert c.LoadTexture(ti, img)
        assert c.GetTextureData(ti).shape == (4, 4, 4)
        c.SetTexture(ti)
        c.Clear()
        data = {"positions": np.array([[-1, -1, 0.5, 1], [0, 1, 0.5, 1],
                                       [1, -1, 0.5, 1]], np.float32),
                "uvs": np.array([[0, 1], [0.5, 0], [1, 1]], np.float32),
                "transformed": True}
        assert c.DrawPrimitive(int(VXPRIMITIVE.TRIANGLELIST), None, data)
        out = c.BackToFront()
        assert out[..., 1].sum() > 10

    def test_copy_to_texture(self):
        rst, drv, c = _ctx()
        c.Clear(CKRST_CTXCLEAR_ALL, 0xFFFF0000)     # red frame
        ti = rst.CreateObjectIndex(CKRST_OBJ_TEXTURE)
        c.CreateObject(ti, CKRST_OBJ_TEXTURE, {"width": 32, "height": 32})
        assert c.CopyToTexture(ti)
        np.testing.assert_allclose(c.GetTextureData(ti)[0, 0, :3], [1, 0, 0],
                                   atol=1e-6)


class TestSprites:
    def test_pow2_decomposition(self):
        rst, drv, c = _ctx(64, 64)
        si = rst.CreateObjectIndex(CKRST_OBJ_SPRITE)
        assert c.CreateSprite(si, 100, 40)    # non-pow2
        info = c.GetSpriteData(si)
        assert sum(t for _, t in info["tiles_x"]) >= 100
        assert all((t & (t - 1)) == 0 for _, t in info["tiles_x"])
        assert all((t & (t - 1)) == 0 for _, t in info["tiles_y"])

    def test_draw_sprite_blits(self):
        rst, drv, c = _ctx(64, 64)
        si = rst.CreateObjectIndex(CKRST_OBJ_SPRITE)
        c.CreateSprite(si, 8, 8)
        img = np.zeros((8, 8, 4), np.float32)
        img[..., 0] = 1.0
        img[..., 3] = 1.0
        assert c.LoadSprite(si, img)
        c.Clear()
        assert c.DrawSprite(si, dst_rect=(10, 10, 26, 26))
        out = c.BackToFront()
        assert out[15, 15, 0] == pytest.approx(1.0)
        assert out[5, 5, 0] == pytest.approx(0.0)


class TestGeometryServices:
    def _setup_cam(self, c):
        view = np.eye(4, dtype=np.float32)
        view[3, 2] = 5.0
        c.SetTransformMatrix(VXMATRIX_VIEW, view)
        c.SetTransformMatrix(VXMATRIX_PROJECTION, _proj())

    def test_transform_vertices(self):
        rst, drv, c = _ctx()
        self._setup_cam(c)
        r = c.TransformVertices([[0, 0, 0], [0, 0, -100]])
        assert r["flags"][0] == 0              # in front, on screen
        assert r["flags"][1] & 16              # behind near plane
        assert not r["offscreen"]
        center = r["screen"][0]
        assert abs(center[0] - 16) < 1 and abs(center[1] - 16) < 1
        r2 = c.TransformVertices([[1000, 0, 0], [2000, 0, 0]])
        assert r2["offscreen"]                 # AND-reduce: all right of view

    def test_compute_box_visibility(self):
        rst, drv, c = _ctx()
        self._setup_cam(c)
        assert c.ComputeBoxVisibility((-0.1, -0.1, -0.1),
                                      (0.1, 0.1, 0.1)) == "ALLINSIDE"
        assert c.ComputeBoxVisibility((500, 500, 500),
                                      (501, 501, 501)) == "OFFSCREEN"
        assert c.ComputeBoxVisibility((-50, -50, -50),
                                      (50, 50, 50)) == "VISIBLE"
        world = np.eye(4, dtype=np.float32)
        world[3, 0] = 1000.0
        assert c.ComputeBoxVisibility((-1, -1, -1), (1, 1, 1),
                                      world) == "OFFSCREEN"


class TestDisplayListsAndMisc:
    def test_display_list_records_and_replays(self):
        rst, drv, c = _ctx()
        c.Clear()
        dl = c.NewDisplayList()
        c.SetRenderState(VXRENDERSTATE.FOGENABLE, 1)
        data = {"positions": np.array([[-1, -1, 0.5, 1], [0, 1, 0.5, 1],
                                       [1, -1, 0.5, 1]], np.float32),
                "colors": np.tile([1, 1, 1, 1], (3, 1)).astype(np.float32),
                "transformed": True}
        c.DrawPrimitive(int(VXPRIMITIVE.TRIANGLELIST), None, data)
        assert c.EndDisplayList()
        tris0 = c.stats["NbTrianglesDrawn"]
        c.Clear()
        c.InternalSetRenderState(VXRENDERSTATE.FOGENABLE, 0)
        assert c.CallDisplayList(dl)
        assert c.stats["NbTrianglesDrawn"] == tris0 + 1
        assert c.GetRenderState(VXRENDERSTATE.FOGENABLE) == 1
        assert c.BackToFront()[..., 0].sum() > 10
        assert c.DeleteDisplayList(dl)
        assert not c.CallDisplayList(dl)

    def test_shader_constants_and_clip_planes(self):
        rst, drv, c = _ctx()
        assert c.SetVertexShaderConstant(2, [1, 2, 3, 4])
        np.testing.assert_allclose(c._vs_const[2], [1, 2, 3, 4])
        assert c.SetPixelShaderConstant(0, [5, 6, 7, 8])
        assert c.SetUserClipPlane(0, (0, 1, 0, 2))
        np.testing.assert_allclose(c.GetUserClipPlane(0), [0, 1, 0, 2])
        assert not c.SetUserClipPlane(9, (0, 0, 0, 0))

    def test_screen_backup_and_dirty_rects(self):
        rst, drv, c = _ctx()
        c.Clear(CKRST_CTXCLEAR_ALL, 0xFF00FF00)
        c.SetScreenBackup()
        c.Clear(CKRST_CTXCLEAR_ALL, 0)
        assert c.RestoreScreenBackup()
        assert c.BackToFront()[0, 0, 1] == pytest.approx(1.0)
        c.AddDirtyRect((1, 1, 5, 5))
        c.AddDirtyRect()
        assert len(c._dirty_rects) == 2
        c.ResetDirtyRects()
        assert c._dirty_rects == []
        assert c.GetImplementationSpecificData()["backend"] == "jax"
        assert c.SetDrawBuffer(3)
        c.WarnThread(True)
        assert c.Resize(width=16, height=16)
        assert c.fb.shape == (4, 16, 16)


class TestGuardedAllocator:
    """Guard-byte object-table check (reference GuardedDX9Rasterizer test,
    tests/test_ckdx9_rasterizer_helpers.cpp:44-70: AllocateObjects plants
    0xA5 guard bytes and verifies no overruns)."""

    def test_allocation_growth_never_overruns_guards(self):
        from ckrenderengine_tpu.raster.hal import (CKRST_OBJ_TEXTURE,
                                                   CKRST_OBJ_VERTEXBUFFER,
                                                   CKRasterizer,
                                                   CKRasterizerContext)

        class GuardedContext(CKRasterizerContext):
            GUARD = 0xA5

            def __init__(self, driver):
                super().__init__(driver)
                self.guards = np.full(64, self.GUARD, np.uint8)
                self.alloc_calls = []

            def AllocateObjects(self, capacity):
                self.alloc_calls.append(capacity)
                return super().AllocateObjects(capacity)

            def guards_intact(self):
                return bool((self.guards == self.GUARD).all())

        rst = CKRasterizer()
        rst.Start(None)
        drv = rst.GetDriver(0)
        dev = GuardedContext(drv)
        drv.contexts.append(dev)
        dev.Create(None, 8, 8)
        for i in range(40):
            idx = rst.CreateObjectIndex(CKRST_OBJ_TEXTURE)
            assert dev.CreateObject(idx, CKRST_OBJ_TEXTURE,
                                    {"width": 2, "height": 2})
            if i % 3 == 0:
                vbi = rst.CreateObjectIndex(CKRST_OBJ_VERTEXBUFFER)
                dev.CreateObject(vbi, CKRST_OBJ_VERTEXBUFFER,
                                 {"max_vertices": 4})
        assert dev.guards_intact()
        assert dev.alloc_calls, "growth never notified AllocateObjects"
        assert max(dev.alloc_calls) >= 40
        # releasing + reallocating stays within the table
        rst.ReleaseObjectIndex(0, CKRST_OBJ_TEXTURE)
        again = rst.CreateObjectIndex(CKRST_OBJ_TEXTURE)
        assert again == 0
        assert dev.guards_intact()
