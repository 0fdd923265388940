"""Host chunk culling + device stream compaction (round 4): the TPU form
of the reference's hierarchical-bbox scene-graph culling
(/root/reference/src/CKSceneGraph.cpp:849-888, CK3dEntity.cpp:3297). The
host tests CH-triangle chunks of the corner-major stream against the
frustum and the device compacts to the survivors — output must be
IDENTICAL to rendering everything (culled chunks are fully offscreen),
and the survivor cap must bump pre-dispatch so nothing is ever dropped."""

import numpy as np

from ckrenderengine_tpu.objects import (
    CK3dObject, CKCamera, CKContext, CKMaterial, CKMesh,
)


def _grid_scene(nx=160, nz=65, extent=60.0):
    """A wide terrain-like sheet with > 2*CH triangles (CH = 4096)."""
    ctx = CKContext()
    rc = ctx.GetRenderManager().CreateRenderContext(64, 64)
    cam = CKCamera(ctx, "cam")
    # look along +x from inside the left-near quadrant: chunks on the far
    # side and behind the camera fall outside the frustum
    cam.SetPosition((-extent * 0.9, 3.0, -extent * 0.5))
    cam.SetOrientation((1.0, -0.1, 0.0))
    cam.SetBackPlane(extent * 0.6)
    rc.AttachViewpointToCamera(cam)

    xs = np.linspace(-extent, extent, nx + 1, dtype=np.float32)
    zs = np.linspace(-extent, extent, nz + 1, dtype=np.float32)
    gx, gz = np.meshgrid(xs, zs, indexing="ij")
    gy = np.sin(gx * 0.2) * np.cos(gz * 0.2)
    verts = np.stack([gx, gy, gz], -1).reshape(-1, 3).astype(np.float32)
    rr, cc = np.meshgrid(np.arange(nx), np.arange(nz), indexing="ij")
    a = (rr * (nz + 1) + cc).reshape(-1)
    f1 = np.stack([a, a + 1, a + nz + 2], -1)
    f2 = np.stack([a, a + nz + 2, a + nz + 1], -1)
    faces = np.concatenate([f1[:, None], f2[:, None]], 1).reshape(-1, 3)
    mesh = CKMesh(ctx, "sheet")
    mesh.SetPositions(verts)
    mesh.SetFaces(faces.astype(np.int32))
    mesh.BuildNormals()
    mat = CKMaterial(ctx, "m")
    mat.SetEmissive((0.9, 0.6, 0.3, 1))
    mesh.ApplyGlobalMaterial(mat)
    obj = CK3dObject(ctx, "sheet")
    obj.SetCurrentMesh(mesh)
    return ctx, rc, obj


class TestChunkCull:
    def test_culled_render_is_identical(self):
        ctx, rc, obj = _grid_scene()
        rc.Render()
        assert rc._compiled.chunk_meta is not None
        assert rc._chunk_cap is not None
        fb_cull = np.asarray(rc.fb).copy()
        # culling genuinely removed chunks for this camera
        c = rc._compiled
        view, proj, _ = rc._camera_np()
        idx = rc._chunk_select(c, view, proj)
        assert 0 < len(idx) < c.chunk_meta["n_full"]
        # reference: same scene with chunk culling disabled
        rc._compiled.chunk_meta = None
        rc._chunk_cap = None
        rc.Render()
        fb_ref = np.asarray(rc.fb)
        assert fb_ref[..., :3].max() > 0.1          # something rendered
        np.testing.assert_array_equal(fb_cull, fb_ref)

    def test_cap_bumps_when_more_chunks_survive(self):
        ctx, rc, obj = _grid_scene()
        rc.Render()
        cap0 = rc._chunk_cap
        assert cap0 is not None
        # widen the view: pull the camera up/back so everything is visible
        cam = rc.attached_camera
        cam.SetPosition((0.0, 150.0, 0.0))
        cam.SetOrientation((0.0, -1.0, 0.01))
        cam.SetBackPlane(4000.0)
        rc.Render()
        fb_all = np.asarray(rc.fb).copy()
        assert rc._chunk_cap >= cap0
        # and the all-visible frame matches the uncompacted render
        rc._compiled.chunk_meta = None
        rc.Render()
        np.testing.assert_array_equal(fb_all, np.asarray(rc.fb))

    def test_moving_entity_tracks_culling(self):
        ctx, rc, obj = _grid_scene()
        rc.Render()
        fb0 = np.asarray(rc.fb).copy()
        obj.SetPosition((5.0, 0.0, 0.0))
        rc.Render()
        fb1 = np.asarray(rc.fb).copy()
        assert np.abs(fb1 - fb0).sum() > 1.0         # scene moved
        rc._compiled.chunk_meta = None
        rc.Render()
        np.testing.assert_array_equal(fb1, np.asarray(rc.fb))
