"""Scene-structure tests: curves + line rendering, grids/layers, places with
portals + viewport clipping (SURVEY §2.4)."""

import numpy as np
import pytest

from ckrenderengine_tpu.objects import (
    CK3dObject, CKCamera, CKContext, CKCurve, CKCurvePoint, CKGrid, CKLayer,
    CKMaterial, CKMesh, CKPlace,
)


def _rc(ctx, w=64, h=64):
    rm = ctx.GetRenderManager()
    rc = rm.CreateRenderContext(w, h)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0, 0, -5))
    rc.AttachViewpointToCamera(cam)
    return rc


class TestCurve:
    def test_curve_passes_through_control_points(self):
        ctx = CKContext()
        c = CKCurve(ctx, "c")
        c.AddControlPoint((0, 0, 0))
        c.AddControlPoint((1, 1, 0))
        c.AddControlPoint((2, 0, 0))
        c.SetStepCount(20)
        c.Update()
        pts = c.GetCurrentMesh().positions
        for cp in [(0, 0, 0), (1, 1, 0), (2, 0, 0)]:
            d = np.linalg.norm(pts - np.asarray(cp, np.float32), axis=1).min()
            assert d < 1e-4

    def test_length_and_getpos(self):
        ctx = CKContext()
        c = CKCurve(ctx, "c")
        p0 = c.AddControlPoint((0, 0, 0))
        p1 = c.AddControlPoint((4, 0, 0))
        p0.SetLinear(True)
        p1.SetLinear(True)
        assert c.GetLength() == pytest.approx(4.0, abs=1e-3)
        np.testing.assert_allclose(c.GetPos(0.5), [2, 0, 0], atol=1e-3)

    def test_closed_curve_returns_to_start(self):
        ctx = CKContext()
        c = CKCurve(ctx, "c")
        for p in [(0, 0, 0), (2, 0, 0), (2, 2, 0), (0, 2, 0)]:
            c.AddControlPoint(p)
        c.Close()
        c.Update()
        pts = c.GetCurrentMesh().positions
        np.testing.assert_allclose(pts[0], pts[-1], atol=1e-5)

    def test_moving_point_dirties_curve(self):
        ctx = CKContext()
        c = CKCurve(ctx, "c")
        c.AddControlPoint((0, 0, 0))
        cp = c.AddControlPoint((1, 0, 0))
        c.Update()
        assert not c.IsDirty()
        cp.SetPosition((2, 0, 0), ref=c)
        assert c.IsDirty()

    def test_curve_renders_line_pixels(self):
        ctx = CKContext()
        rc = _rc(ctx)
        c = CKCurve(ctx, "c")
        p0 = c.AddControlPoint((-1.5, 0, 0))
        p1 = c.AddControlPoint((1.5, 0, 0))
        p0.SetLinear(True)
        p1.SetLinear(True)
        c.SetColor((1, 0, 0, 1))
        rc.Render()
        fb = rc.framebuffer()
        # horizontal red line through the screen center
        row = fb[31:34, :, 0].max(axis=0)
        assert (row > 0.9).sum() > 20
        assert fb[10, 32, 0] == pytest.approx(0.0, abs=1e-5)


class TestMeshLines:
    def test_line_list_renders(self):
        ctx = CKContext()
        rc = _rc(ctx)
        mesh = CKMesh(ctx, "m")
        mesh.SetPositions(np.array([[-1, -1, 0], [1, 1, 0]], np.float32))
        mesh.SetLineCount(1)
        mesh.SetLine(0, 0, 1)
        obj = CK3dObject(ctx, "o")
        obj.SetCurrentMesh(mesh)
        rc.Render()
        fb = rc.framebuffer()
        assert fb[..., 3].sum() > 10   # diagonal drawn

    def test_lines_z_tested_against_geometry(self):
        ctx = CKContext()
        rc = _rc(ctx)
        # occluder quad in front of the line
        quad = CKMesh(ctx, "q")
        quad.SetPositions(np.array(
            [[-2, -2, -1], [2, -2, -1], [2, 2, -1], [-2, 2, -1]], np.float32))
        quad.SetFaces(np.array([[0, 2, 1], [0, 3, 2]], np.int32))
        quad.BuildNormals()
        mat = CKMaterial(ctx, "m")
        mat.SetEmissive((0, 0, 1, 1))
        mat.SetTwoSided(True)
        quad.ApplyGlobalMaterial(mat)
        occ = CK3dObject(ctx, "occ")
        occ.SetCurrentMesh(quad)
        lm = CKMesh(ctx, "lm")
        lm.SetPositions(np.array([[-1, 0, 0], [1, 0, 0]], np.float32))
        lm.SetLineCount(1)
        lm.SetLine(0, 0, 1)
        lo = CK3dObject(ctx, "lo")
        lo.SetCurrentMesh(lm)
        rc.Render()
        fb = rc.framebuffer()
        # line is behind the quad -> center stays blue
        assert fb[32, 32, 2] > 0.9
        assert fb[32, 32, 0] < 0.1


class TestGrid:
    def test_dimensions_and_layers(self):
        ctx = CKContext()
        g = CKGrid(ctx, "g")
        g.SetDimensions(8, 6, 1.0, 1.0)
        assert (g.GetWidth(), g.GetLength()) == (8, 6)
        layer = g.AddLayer("collision")
        assert g.GetLayer("collision") is layer
        layer.SetValue(3, 2, 7)
        assert layer.GetValue(3, 2) == 7
        assert g.GetLayerCount() == 1
        # resize preserves values
        g.SetDimensions(10, 10)
        assert layer.GetValue(3, 2) == 7

    def test_coordinates_roundtrip(self):
        ctx = CKContext()
        g = CKGrid(ctx, "g")
        g.SetDimensions(4, 4, 2.0, 2.0)
        g.SetPosition((10, 0, 10))
        center = g.GetPositionFromCoordinates(1, 2)
        back = g.GetGridCoordinates(center)
        assert back == (1, 2)
        assert not g.IsInGrid((100, 0, 100))

    def test_grid_is_invisible(self):
        ctx = CKContext()
        g = CKGrid(ctx, "g")
        assert not g.IsVisible()
        assert g._viz_mesh is None

    def test_visible_grid_renders_pixels(self):
        """A shown grid builds its debug mesh (reference
        RCKGrid::ConstructMeshTexture, /root/reference/src/CKGrid.cpp:399)
        and renders non-empty pixels through the normal mesh path."""
        ctx = CKContext()
        rc = _rc(ctx)
        g = CKGrid(ctx, "g")
        g.SetDimensions(4, 4, 1.0, 1.0)
        layer = g.AddLayer("heat")
        layer.SetSquareArray(np.full((4, 4), 255, np.int32))
        layer.SetColor((1.0, 0.0, 0.0, 1.0))
        # Face the camera: local x -> world x, local z (length) -> world y.
        g.SetLocalMatrix(np.array([[1, 0, 0, 0], [0, 0, -1, 0],
                                   [0, 1, 0, 0], [-2, -2, 0, 1]], np.float32))
        g.Show(True)
        assert g._viz_mesh is not None
        assert g.GetCurrentMesh() is g._viz_mesh
        rc.Render()
        fb = rc.framebuffer()
        # Half-transparent red fill over black: red well above green/blue.
        center = fb[28:36, 28:36]
        assert center[..., 0].max() > 0.3
        assert center[..., 1].max() < 0.15
        # Hiding destroys the mesh and the render goes empty.
        g.Show(False)
        assert g._viz_mesh is None
        rc.Render()
        assert rc.framebuffer()[..., :3].max() < 1e-6

    def test_layer_colors_drive_texture(self):
        ctx = CKContext()
        g = CKGrid(ctx, "g")
        g.SetDimensions(4, 4, 1.0, 1.0)
        a = g.AddLayer("a")
        b = g.AddLayer("b")
        a.SetSquareArray(np.full((4, 4), 255, np.int32))
        a.SetColor((1.0, 0.0, 0.0, 1.0))
        b.SetSquareArray(np.full((4, 4), 255, np.int32))
        b.SetColor((0.0, 1.0, 0.0, 1.0))
        g.Show(True)
        img = g._viz_texture.GetImage()
        # layer colors accumulate per square (2x2 texels per square)
        np.testing.assert_allclose(img[0, 0, :3], [1.0, 1.0, 0.0], atol=1e-5)
        # invisible layers drop out of the accumulation
        b.SetVisible(False)
        g.UpdateMeshTexture()
        img = g._viz_texture.GetImage()
        np.testing.assert_allclose(img[0, 0, :3], [1.0, 0.0, 0.0], atol=1e-5)


class TestPlace:
    def test_portals_symmetric(self):
        ctx = CKContext()
        a = CKPlace(ctx, "a")
        b = CKPlace(ctx, "b")
        portal = CK3dObject(ctx, "door")
        a.AddPortal(b, portal)
        assert a.GetPortalCount() == 1
        assert b.GetPortalCount() == 1
        assert a.GetPortal(0) == (b, portal)
        a.RemovePortal(b)
        assert a.GetPortalCount() == 0
        assert b.GetPortalCount() == 0

    def test_default_camera(self):
        ctx = CKContext()
        p = CKPlace(ctx, "p")
        cam = CKCamera(ctx, "c")
        p.SetDefaultCamera(cam)
        assert p.GetDefaultCamera() is cam

    def test_viewport_clip_scissors_children(self):
        ctx = CKContext()
        rc = _rc(ctx)
        place = CKPlace(ctx, "room")
        mesh = CKMesh(ctx, "m")
        mesh.SetPositions(np.array(
            [[-2, -2, 0], [2, -2, 0], [2, 2, 0], [-2, 2, 0]], np.float32))
        mesh.SetFaces(np.array([[0, 2, 1], [0, 3, 2]], np.int32))
        mesh.BuildNormals()
        mat = CKMaterial(ctx, "m")
        mat.SetEmissive((1, 1, 0, 1))
        mat.SetTwoSided(True)
        mesh.ApplyGlobalMaterial(mat)
        obj = CK3dObject(ctx, "wall")
        obj.SetCurrentMesh(mesh)
        obj.SetParent(place)
        rc.Render()
        full = (rc.framebuffer()[..., 3] > 0).sum()
        place.ViewportClip((0, 0, 32, 64))      # left half only
        rc.Render()
        fb = rc.framebuffer()
        clipped = (fb[..., 3] > 0).sum()
        assert 0 < clipped < full
        assert fb[:, 33:, 3].sum() == 0          # nothing right of the rect
