"""User clip planes (reference CKRasterizerContext::SetUserClipPlane,
DX9 backend /root/reference/src/CKRasterizer/CKDX9Rasterizer/
CKDX9RasterizerContext.cpp:3408): world-space half-space clipping of
rendered geometry, exact at pixel granularity for straddling triangles."""

import numpy as np

from ckrenderengine_tpu.objects import (
    CKContext, CK3dObject, CKCamera, CKMaterial, CKMesh,
)


def _quad_scene(size=96):
    """Full-screen-ish unlit quad at z=0 viewed down -z."""
    ctx = CKContext()
    rc = ctx.GetRenderManager().CreateRenderContext(size, size)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0.0, 0.0, -5.0))
    rc.AttachViewpointToCamera(cam)
    mesh = CKMesh(ctx, "quad")
    s = 2.0
    mesh.SetPositions(np.array(
        [[-s, -s, 0], [s, -s, 0], [s, s, 0], [-s, s, 0]], np.float32))
    mesh.SetFaces(np.array([[0, 2, 1], [0, 3, 2]], np.int32))
    mesh.BuildNormals()
    mat = CKMaterial(ctx, "m")
    mat.SetDiffuse((1, 1, 1, 1))
    mat.SetLightingMode(False) if hasattr(mat, "SetLightingMode") else None
    mesh.ApplyGlobalMaterial(mat)
    obj = CK3dObject(ctx, "q")
    obj.SetCurrentMesh(mesh)
    rc.SetBackgroundColor((0, 0, 0, 1))
    return ctx, rc, obj


def _lit_pixels(rc):
    fb = rc.framebuffer()
    return (fb[..., :3].sum(-1) > 0.05)


class TestUserClipPlanes:
    def test_api_roundtrip(self):
        ctx, rc, obj = _quad_scene()
        assert rc.GetUserClipPlane(0) is None
        assert rc.SetUserClipPlane(0, (1, 0, 0, 0.5))
        np.testing.assert_allclose(rc.GetUserClipPlane(0), [1, 0, 0, 0.5])
        assert not rc.SetUserClipPlane(17, (1, 0, 0, 0))   # out of range
        assert rc.EnableUserClipPlane(0, False)
        assert not rc.EnableUserClipPlane(3, False)        # never set

    def test_half_space_clips_half_the_quad(self):
        ctx, rc, obj = _quad_scene()
        rc.Render()
        full = _lit_pixels(rc).sum()
        assert full > 200
        # keep x >= 0 (world space): plane (1,0,0,0)
        rc.SetUserClipPlane(0, (1.0, 0.0, 0.0, 0.0))
        rc.Render()
        lit = _lit_pixels(rc)
        half = lit.sum()
        assert 0.4 * full < half < 0.6 * full
        # everything lit must be on the right half of the screen (quad is
        # screen-aligned and centered)
        w = lit.shape[1]
        assert lit[:, : w // 2 - 2].sum() == 0
        assert lit[:, w // 2 + 2:].sum() > 0

    def test_two_planes_intersect(self):
        ctx, rc, obj = _quad_scene()
        rc.Render()
        full = _lit_pixels(rc).sum()
        rc.SetUserClipPlane(0, (1.0, 0.0, 0.0, 0.0))    # x >= 0
        rc.SetUserClipPlane(1, (0.0, 1.0, 0.0, 0.0))    # y >= 0
        rc.Render()
        quarter = _lit_pixels(rc).sum()
        assert 0.15 * full < quarter < 0.35 * full

    def test_fully_outside_culled_fully_inside_kept(self):
        ctx, rc, obj = _quad_scene()
        rc.Render()
        full = _lit_pixels(rc).sum()
        rc.SetUserClipPlane(0, (0.0, 0.0, -1.0, 10.0))  # z <= 10: keeps all
        rc.Render()
        assert _lit_pixels(rc).sum() == full
        rc.SetUserClipPlane(0, (0.0, 0.0, 1.0, -10.0))  # z >= 10: culls all
        rc.Render()
        assert _lit_pixels(rc).sum() == 0

    def test_disable_restores(self):
        ctx, rc, obj = _quad_scene()
        rc.SetUserClipPlane(0, (1.0, 0.0, 0.0, 0.0))
        rc.Render()
        clipped = _lit_pixels(rc).sum()
        rc.EnableUserClipPlane(0, False)
        rc.Render()
        full = _lit_pixels(rc).sum()
        assert full > 1.7 * clipped

    def test_world_space_plane_follows_entity_not_screen(self):
        """The plane is world-space: moving the quad past it changes what
        is drawn even though the plane itself never moves."""
        ctx, rc, obj = _quad_scene()
        rc.SetUserClipPlane(0, (1.0, 0.0, 0.0, 0.0))    # keep x >= 0
        obj.SetPosition((2.0, 0.0, 0.0))                # quad spans x in [0,4]
        rc.Render()
        all_in = _lit_pixels(rc).sum()
        obj.SetPosition((-2.1, 0.0, 0.0))               # quad all at x<0
        rc.Render()
        assert _lit_pixels(rc).sum() == 0
        assert all_in > 0

    def test_clip_plane_stays_deferred_at_scale(self):
        """A >4096-tri opaque scene with an active user clip plane must NOT
        reroute through the ordered pass (round-1 set ordered_cap to ALL
        triangles — a ~500k-step sequential scan at Ballance scale); the
        per-pixel half-space test rides the tiled deferred reduce instead."""
        ctx = CKContext()
        rc = ctx.GetRenderManager().CreateRenderContext(96, 96)
        cam = CKCamera(ctx, "cam")
        cam.SetPosition((0.0, 0.0, -5.0))
        rc.AttachViewpointToCamera(cam)
        n = 52
        xs = np.linspace(-2, 2, n + 1)
        gx, gy = np.meshgrid(xs, xs, indexing="ij")
        verts = np.stack([gx, gy, np.zeros_like(gx)], -1).reshape(-1, 3)
        faces = []
        for r in range(n):
            for c in range(n):
                a = r * (n + 1) + c
                faces += [[a, a + n + 2, a + 1], [a, a + n + 1, a + n + 2]]
        mesh = CKMesh(ctx, "grid")
        mesh.SetPositions(verts.astype(np.float32))
        mesh.SetFaces(np.asarray(faces, np.int32))
        mesh.BuildNormals()
        mat = CKMaterial(ctx, "m")
        mat.SetEmissive((1, 1, 1, 1))
        mat.SetTwoSided(True)
        mesh.ApplyGlobalMaterial(mat)
        obj = CK3dObject(ctx, "o")
        obj.SetCurrentMesh(mesh)
        assert len(faces) > 4096
        rc.SetUserClipPlane(0, (1.0, 0.0, 0.0, 0.0))    # keep x >= 0
        rc.Render()
        assert rc._compiled.ordered_cap == 0             # fully deferred
        lit = _lit_pixels(rc)
        w = lit.shape[1]
        assert lit[:, : w // 2 - 2].sum() == 0
        assert lit[:, w // 2 + 2:].sum() > 500

    def test_transparent_straddler_still_clips(self):
        """Alpha-blended geometry goes down the ordered pass — the per-pixel
        plane test must apply there too."""
        ctx, rc, obj = _quad_scene()
        mat = obj.GetCurrentMesh().GetMaterial(0)
        mat.EnableAlphaBlend(True)
        mat.SetDiffuse((1, 1, 1, 0.5))
        rc.SetUserClipPlane(0, (1.0, 0.0, 0.0, 0.0))
        rc.Render()
        lit = _lit_pixels(rc)
        w = lit.shape[1]
        assert lit[:, : w // 2 - 2].sum() == 0
        assert lit[:, w // 2 + 2:].sum() > 0
