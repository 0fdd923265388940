"""Automatic portal traversal: camera's place renders fully, neighbor places
clip to their portals' projected rects, unconnected places hide (reference
Place/portal viewport clipping, src/CKSceneGraph.cpp:113-128)."""

import numpy as np
import pytest

from ckrenderengine_tpu.objects import (
    CK3dObject, CKCamera, CKContext, CKMaterial, CKMesh, CKPlace,
)


def _wall(ctx, name, pos, color, size=3.0, z=2.0):
    mesh = CKMesh(ctx, f"{name}m")
    s = size
    mesh.SetPositions(np.array(
        [[-s, -s, z], [s, -s, z], [s, s, z], [-s, s, z]], np.float32))
    mesh.SetFaces(np.array([[0, 2, 1], [0, 3, 2]], np.int32))
    mesh.BuildNormals()
    mat = CKMaterial(ctx, f"{name}mat")
    mat.SetEmissive(color)
    mat.SetTwoSided(True)
    mesh.ApplyGlobalMaterial(mat)
    obj = CK3dObject(ctx, name)
    obj.SetCurrentMesh(mesh)
    obj.SetPosition(pos)
    return obj


def _build(ctx):
    rm = ctx.GetRenderManager()
    rc = rm.CreateRenderContext(64, 64)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0, 0, -5))
    rc.AttachViewpointToCamera(cam)

    room_a = CKPlace(ctx, "roomA")
    cam.SetParent(room_a)                   # camera lives in room A
    wall_a = _wall(ctx, "wallA", (0, 0, 0), (1, 0, 0, 1))
    wall_a.SetParent(room_a)

    room_b = CKPlace(ctx, "roomB")
    wall_b = _wall(ctx, "wallB", (0, 0, 1.0), (0, 1, 0, 1))
    wall_b.SetParent(room_b)

    room_c = CKPlace(ctx, "roomC")          # unconnected
    wall_c = _wall(ctx, "wallC", (0, 0, -1.0), (0, 0, 1, 1))
    wall_c.SetParent(room_c)

    # small portal window in the upper-left, leading from A to B
    door = CK3dObject(ctx, "door")
    dm = CKMesh(ctx, "doorm")
    dm.SetPositions(np.array(
        [[-2.5, 0.5, 2], [-0.5, 0.5, 2], [-0.5, 2.5, 2], [-2.5, 2.5, 2]],
        np.float32))
    dm.SetFaces(np.zeros((0, 3), np.int32))   # portal geometry only (no draw)
    door.SetCurrentMesh(dm)
    room_a.AddPortal(room_b, door)
    return rc, room_a, room_b, room_c


class TestPortalTraversal:
    def test_unconnected_place_hidden(self):
        ctx = CKContext()
        rc, a, b, c = _build(ctx)
        rc.Render()
        fb_off = rc.framebuffer().copy()
        # without traversal, the blue wall of room C (nearest) covers all
        assert (fb_off[..., 2] > 0.5).sum() > 2000
        rc.EnablePortalTraversal(True)
        rc.Render()
        fb_on = rc.framebuffer()
        assert (fb_on[..., 2] > 0.5).sum() == 0     # room C hidden
        # room A's red wall now visible
        assert (fb_on[..., 0] > 0.5).sum() > 1000

    def test_neighbor_clipped_to_portal_rect(self):
        ctx = CKContext()
        rc, a, b, c = _build(ctx)
        rc.EnablePortalTraversal(True)
        # hide room A's wall so room B shows through the portal window
        ctx.GetObjectByName("wallA").Show(False)
        rc.Render()
        fb = rc.framebuffer()
        green = fb[..., 1] > 0.5
        assert green.sum() > 20                      # B visible through portal
        rows, cols = np.where(green)
        # the portal window is upper-left: green pixels confined there
        assert cols.max() < 40
        assert rows.max() < 40

    def test_camera_outside_places_disables_culling(self):
        ctx = CKContext()
        rc, a, b, c = _build(ctx)
        cam = rc.GetAttachedCamera()
        cam.SetParent(None)
        cam.SetPosition((100, 100, -50))    # far outside every place bbox
        rc.EnablePortalTraversal(True)
        rc.Render()                          # must not crash / hide everything
        # re-aim at the scene: everything renders (no culling applied)
        cam.SetPosition((0, 0, -5))
        cam.SetOrientation((0, 0, 1))
        rc.Render()
        assert (rc.framebuffer()[..., 2] > 0.5).sum() > 1000
