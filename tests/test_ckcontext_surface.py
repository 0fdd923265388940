"""CKContext runtime surface: class-hierarchy queries, batch destroy with
dependency closure, ClearAll (reference CK2 SDK CKContext)."""
import numpy as np

from ckrenderengine_tpu.objects import (
    CK3dObject, CKCamera, CKContext, CKLight, CKMaterial, CKMesh,
    CKTargetCamera, CKTexture,
)
from ckrenderengine_tpu.objects import base as B


def _ctx():
    ctx = CKContext()
    rc = ctx.GetRenderManager().CreateRenderContext(48, 48)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0, 0, -5))
    rc.AttachViewpointToCamera(cam)
    return ctx, rc, cam


def _tri(ctx, name="o"):
    mesh = CKMesh(ctx, name + "_mesh")
    mesh.SetPositions(np.array([[-1, -1, 0], [0, 1.5, 0], [1, -1, 0]],
                               np.float32))
    mesh.SetFaces(np.array([[0, 1, 2]], np.int32))
    mesh.BuildNormals()
    mat = CKMaterial(ctx, name + "_mat")
    mesh.ApplyGlobalMaterial(mat)
    obj = CK3dObject(ctx, name)
    obj.SetCurrentMesh(mesh)
    return obj, mesh, mat


class TestQueries:
    def test_derived_class_listing(self):
        ctx, rc, cam = _ctx()
        tcam = CKTargetCamera(ctx, "tc")
        cams = ctx.GetObjectsByClassID(B.CKCID_CAMERA)
        assert cam in cams and tcam not in cams
        all_cams = ctx.GetObjectsByClassID(B.CKCID_CAMERA, derived=True)
        assert cam in all_cams and tcam in all_cams
        ents = ctx.GetObjectsByClassID(B.CKCID_3DENTITY, derived=True)
        assert tcam in ents
        assert ctx.GetObjectsCount() >= 4
        assert ctx.GetObjectsCountByClassID(B.CKCID_CAMERA, True) == 2


class TestDestroyObjects:
    def test_batch_destroy_without_dependencies(self):
        ctx, rc, cam = _ctx()
        a, amesh, amat = _tri(ctx, "a")
        b, bmesh, bmat = _tri(ctx, "b")
        n = ctx.DestroyObjects([a, b.id])
        assert n == 2
        assert ctx.GetObject(a.id) is None and ctx.GetObject(b.id) is None
        assert ctx.GetObject(amesh.id) is amesh       # deps survive

    def test_dependency_closure_spares_shared(self):
        ctx, rc, cam = _ctx()
        a, amesh, amat = _tri(ctx, "a")
        b, _, _ = _tri(ctx, "b")
        b.SetCurrentMesh(amesh, add_if_not_here=True)  # share a's mesh
        tex = CKTexture(ctx, "t")
        tex.SetImage(np.ones((4, 4, 4), np.float32))
        amat.SetTexture(tex)
        n = ctx.DestroyObjects([a], dependencies=True)
        # a destroyed; amesh survives (b uses it) — and therefore so do
        # the mesh's own deps (amat/tex, still referenced by the mesh)
        assert ctx.GetObject(a.id) is None
        assert ctx.GetObject(amesh.id) is amesh
        assert ctx.GetObject(amat.id) is amat
        assert b.GetCurrentMesh() is amesh

    def test_dependency_closure_destroys_exclusive(self):
        ctx, rc, cam = _ctx()
        a, amesh, amat = _tri(ctx, "a")
        n = ctx.DestroyObjects([a], dependencies=True)
        assert n >= 3                                 # obj + mesh + mat
        assert ctx.GetObject(amesh.id) is None
        assert ctx.GetObject(amat.id) is None

    def test_survivors_drop_dying_refs(self):
        ctx, rc, cam = _ctx()
        a, amesh, amat = _tri(ctx, "a")
        b, bmesh, bmat = _tri(ctx, "b")
        b.SetCurrentMesh(amesh, add_if_not_here=True)
        ctx.DestroyObjects([amesh])                   # kill the shared mesh
        assert b.GetCurrentMesh() is not amesh        # ref dropped


class TestClearAll:
    def test_clear_all_keeps_contexts_and_renders_empty(self):
        ctx, rc, cam = _ctx()
        _tri(ctx, "a")
        _tri(ctx, "b")
        rc.Render()
        assert (rc.framebuffer()[..., :3].sum(-1) > 0.05).sum() > 0
        ctx.ClearAll()
        assert ctx.GetObject(rc.id) is rc
        rm = ctx.GetRenderManager()
        assert rm.default_material is not None
        assert ctx.GetObjectsByClassID(B.CKCID_3DOBJECT) == []
        cam2 = CKCamera(ctx, "cam2")
        cam2.SetPosition((0, 0, -5))
        rc.AttachViewpointToCamera(cam2)
        rc.Render()                                   # empty but alive
        assert (rc.framebuffer()[..., :3].sum(-1) > 0.05).sum() == 0
        obj, _, _ = _tri(ctx, "again")
        rc.Render()
        assert (rc.framebuffer()[..., :3].sum(-1) > 0.05).sum() > 0
