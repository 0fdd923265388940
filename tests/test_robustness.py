"""Robustness: mid-run scene edits (entity add/remove, mesh topology growth,
context resize), empty scenes, frustum-visibility API, stats mirroring."""

import numpy as np
import pytest

from ckrenderengine_tpu.objects import (
    CK3dObject, CKCamera, CKContext, CKMaterial, CKMesh, CKTexture,
)


def _tri_mesh(ctx, name, color=(1, 0, 0, 1)):
    mesh = CKMesh(ctx, f"{name}m")
    mesh.SetPositions(np.array([[-1, -1, 0], [0, 1, 0], [1, -1, 0]], np.float32))
    mesh.SetFaces(np.array([[0, 1, 2]], np.int32))
    mesh.BuildNormals()
    mat = CKMaterial(ctx, f"{name}mat")
    mat.SetEmissive(color)
    mat.SetTwoSided(True)
    mesh.ApplyGlobalMaterial(mat)
    return mesh


def _rc(ctx, w=48, h=48):
    rm = ctx.GetRenderManager()
    rc = rm.CreateRenderContext(w, h)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0, 0, -4))
    rc.AttachViewpointToCamera(cam)
    return rc


class TestMidRunEdits:
    def test_empty_scene_renders(self):
        ctx = CKContext()
        rc = _rc(ctx)
        rc.Render()
        assert rc.framebuffer().sum() == 0

    def test_entity_added_after_first_frame(self):
        ctx = CKContext()
        rc = _rc(ctx)
        rc.Render()
        obj = CK3dObject(ctx, "late")
        obj.SetCurrentMesh(_tri_mesh(ctx, "late"))
        rc.Render()
        assert rc.framebuffer()[24, 24, 0] > 0.9

    def test_entity_destroyed_after_frames(self):
        ctx = CKContext()
        rc = _rc(ctx)
        obj = CK3dObject(ctx, "gone")
        obj.SetCurrentMesh(_tri_mesh(ctx, "gone"))
        rc.Render()
        assert rc.framebuffer()[24, 24, 0] > 0.9
        ctx.DestroyObject(obj)
        rc.Render()
        assert rc.framebuffer().sum() == 0

    def test_mesh_topology_growth(self):
        ctx = CKContext()
        rc = _rc(ctx)
        mesh = _tri_mesh(ctx, "grow")
        obj = CK3dObject(ctx, "grow")
        obj.SetCurrentMesh(mesh)
        rc.Render()
        # append a second triangle (new shape -> recompile path)
        mesh.SetPositions(np.array(
            [[-1, -1, 0], [0, 1, 0], [1, -1, 0], [1.5, 1, 0]], np.float32))
        mesh.SetFaces(np.array([[0, 1, 2], [2, 1, 3]], np.int32))
        mesh.BuildNormals()
        rc.Render()
        assert rc.GetStats().NbTrianglesDrawn == 2

    def test_context_resize(self):
        ctx = CKContext()
        rc = _rc(ctx)
        obj = CK3dObject(ctx, "o")
        obj.SetCurrentMesh(_tri_mesh(ctx, "o"))
        rc.Render()
        rc.Resize(96, 64)
        rc.Render()
        assert rc.framebuffer().shape == (64, 96, 4)
        assert rc.framebuffer()[..., 0].max() > 0.9

    def test_camera_swap(self):
        ctx = CKContext()
        rc = _rc(ctx)
        obj = CK3dObject(ctx, "o")
        obj.SetCurrentMesh(_tri_mesh(ctx, "o"))
        rc.Render()
        far_cam = CKCamera(ctx, "far")
        far_cam.SetPosition((0, 0, -40))
        rc.AttachViewpointToCamera(far_cam)
        rc.Render()
        near_cov = None
        cov = (rc.framebuffer()[..., 3] > 0).sum()
        assert 0 < cov < 100   # tiny from far away


class TestVisibilityAPI:
    def test_frustum_classification(self):
        ctx = CKContext()
        rc = _rc(ctx)
        obj = CK3dObject(ctx, "o")
        obj.SetCurrentMesh(_tri_mesh(ctx, "o"))
        rc.Render()
        assert obj.IsInViewFrustrum(rc)
        obj.SetPosition((0, 0, -10))       # behind the camera
        assert not obj.IsInViewFrustrum(rc)

    def test_hierarchic_visibility(self):
        ctx = CKContext()
        rc = _rc(ctx)
        parent = CK3dObject(ctx, "p")
        parent.SetCurrentMesh(_tri_mesh(ctx, "p"))
        parent.SetPosition((0, 0, -10))    # parent offscreen
        child = CK3dObject(ctx, "c")
        child.SetCurrentMesh(_tri_mesh(ctx, "c"))
        child.SetParent(parent)
        child.SetPosition((0, 0, 0))       # child back in view
        rc.Render()
        assert not parent.IsInViewFrustrum(rc)
        assert parent.IsInViewFrustrumHierarchic(rc)


class TestStatsAndCopy:
    def test_stats_phase_mirror(self):
        ctx = CKContext()
        rc = _rc(ctx)
        obj = CK3dObject(ctx, "o")
        obj.SetCurrentMesh(_tri_mesh(ctx, "o"))
        rc.Render()
        s = rc.GetStats()
        assert s.ObjectsRenderTime >= 0
        assert s.SceneTraversalTime >= 0

    def test_texture_copy_context(self):
        ctx = CKContext()
        rc = _rc(ctx)
        obj = CK3dObject(ctx, "o")
        obj.SetCurrentMesh(_tri_mesh(ctx, "o"))
        rc.Render()
        tex = CKTexture(ctx, "grab")
        assert tex.CopyContext(rc)
        img = tex.current_image()
        assert img.shape == (48, 48, 4)
        assert img[24, 24, 0] > 0.9


class TestRowRecycling:
    def test_destroyed_rows_are_reused(self):
        ctx = CKContext()
        objs = [CK3dObject(ctx, f"o{i}") for i in range(5)]
        count_before = ctx.entity_table.count
        rows = [o.row for o in objs]
        for o in objs:
            ctx.DestroyObject(o)
        news = [CK3dObject(ctx, f"n{i}") for i in range(5)]
        assert ctx.entity_table.count == count_before   # no growth
        assert sorted(o.row for o in news) == sorted(rows)

    def test_create_destroy_churn_renders_fine(self):
        ctx = CKContext()
        rc = _rc(ctx)
        keeper = CK3dObject(ctx, "keep")
        keeper.SetCurrentMesh(_tri_mesh(ctx, "keep"))
        for i in range(4):
            tmp = CK3dObject(ctx, f"tmp{i}")
            tmp.SetCurrentMesh(_tri_mesh(ctx, f"tmp{i}", (0, 0, 1, 1)))
            tmp.SetPosition((10, 0, 0))     # offscreen
            rc.Render()
            ctx.DestroyObject(tmp)
        rc.Render()
        fb = rc.framebuffer()
        assert fb[24, 24, 0] > 0.9          # keeper still renders red
        assert fb[..., 2].max() < 0.1       # no blue ghosts
