"""CKPatchMesh tests: Bezier evaluation correctness, tessellation topology,
edge welding, and render integration (SURVEY §2.3 RCKPatchMesh)."""

import numpy as np
import pytest

from ckrenderengine_tpu.objects import CKContext, CK3dObject, CKCamera, CKMaterial
from ckrenderengine_tpu.objects.patchmesh import (
    CKPatch, CKPatchMesh, eval_quad_patches, quad_grid_faces,
)
import jax.numpy as jnp


def _flat_quad_patch(mesh: CKPatchMesh, z: float = 0.0):
    """A flat unit quad as one Bezier patch (control points on the plane)."""
    mesh.SetVerts(np.array([[0, 0, z], [1, 0, z], [1, 1, z], [0, 1, z]],
                           np.float32))
    vecs = []
    c = mesh.verts
    # edges: c0->c1, c1->c2, c2->c3, c3->c0, two points at 1/3 and 2/3
    for a, b in ((0, 1), (1, 2), (2, 3), (3, 0)):
        vecs.append(c[a] + (c[b] - c[a]) / 3)
        vecs.append(c[a] + 2 * (c[b] - c[a]) / 3)
    # interior points (bilinear)
    for (u, v) in ((1 / 3, 1 / 3), (2 / 3, 1 / 3), (2 / 3, 2 / 3), (1 / 3, 2 / 3)):
        vecs.append(np.array([u, v, z], np.float32))
    mesh.SetVecs(np.asarray(vecs, np.float32))
    mesh.AddPatch(CKPatch([0, 1, 2, 3], list(range(8)), [8, 9, 10, 11]))


class TestQuadPatch:
    def test_flat_patch_tessellates_to_plane(self):
        ctx = CKContext()
        pm = CKPatchMesh(ctx, "p")
        _flat_quad_patch(pm)
        pm.SetIterationCount(4)
        pm.BuildRenderMesh()
        assert pm.GetVertexCount() > 0
        np.testing.assert_allclose(pm.positions[:, 2], 0.0, atol=1e-5)
        assert pm.positions[:, 0].min() == pytest.approx(0.0, abs=1e-5)
        assert pm.positions[:, 0].max() == pytest.approx(1.0, abs=1e-5)
        assert pm.GetFaceCount() == 2 * 4 * 4

    def test_corner_interpolation(self):
        ctx = CKContext()
        pm = CKPatchMesh(ctx, "p")
        _flat_quad_patch(pm)
        np.testing.assert_allclose(pm.EvaluateQuadPatch(0, 0, 0), [0, 0, 0],
                                   atol=1e-6)
        np.testing.assert_allclose(pm.EvaluateQuadPatch(0, 1, 0), [1, 0, 0],
                                   atol=1e-6)
        np.testing.assert_allclose(pm.EvaluateQuadPatch(0, 1, 1), [1, 1, 0],
                                   atol=1e-6)
        np.testing.assert_allclose(pm.EvaluateQuadPatch(0, 0.5, 0.5),
                                   [0.5, 0.5, 0], atol=1e-5)

    def test_curved_patch_bulges(self):
        ctx = CKContext()
        pm = CKPatchMesh(ctx, "p")
        _flat_quad_patch(pm)
        # Lift the 4 interior control points -> center bulges up.
        for i in (8, 9, 10, 11):
            v = pm.GetVec(i)
            v[2] = 1.0
            pm.SetVec(i, v)
        center = pm.EvaluateQuadPatch(0, 0.5, 0.5)
        assert center[2] > 0.3
        # corners stay pinned
        np.testing.assert_allclose(pm.EvaluateQuadPatch(0, 0, 0)[2], 0, atol=1e-6)

    def test_device_eval_matches_host(self):
        ctx = CKContext()
        pm = CKPatchMesh(ctx, "p")
        _flat_quad_patch(pm)
        rng = np.random.default_rng(1)
        pm.SetVecs(pm.vecs + rng.normal(0, 0.2, pm.vecs.shape).astype(np.float32))
        g = pm._quad_control_grid(pm.patches[0])
        level = 3
        pts = np.asarray(eval_quad_patches(jnp.asarray(g[None]), level))[0]
        for iu, u in enumerate(np.linspace(0, 1, level + 1)):
            for iv, v in enumerate(np.linspace(0, 1, level + 1)):
                np.testing.assert_allclose(
                    pts[iu, iv], pm.EvaluateQuadPatch(0, u, v), atol=1e-5)

    def test_shared_edge_welding(self):
        ctx = CKContext()
        pm = CKPatchMesh(ctx, "p")
        # two quads sharing edge x=1
        pm.SetVerts(np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                              [2, 0, 0], [2, 1, 0]], np.float32))
        vecs = []

        def edge(a, b):
            vecs.append(a + (b - a) / 3)
            vecs.append(a + 2 * (b - a) / 3)

        c = pm.verts
        for a, b in ((0, 1), (1, 2), (2, 3), (3, 0)):
            edge(c[a], c[b])
        for (u, v) in ((1 / 3, 1 / 3), (2 / 3, 1 / 3), (2 / 3, 2 / 3), (1 / 3, 2 / 3)):
            vecs.append(np.array([u, v, 0], np.float32))
        base = len(vecs)
        for a, b in ((1, 4), (4, 5), (5, 2), (2, 1)):
            edge(c[a], c[b])
        for (u, v) in ((1 / 3, 1 / 3), (2 / 3, 1 / 3), (2 / 3, 2 / 3), (1 / 3, 2 / 3)):
            vecs.append(np.array([1 + u, v, 0], np.float32))
        pm.SetVecs(np.asarray(vecs, np.float32))
        pm.AddPatch(CKPatch([0, 1, 2, 3], list(range(8)), [8, 9, 10, 11]))
        pm.AddPatch(CKPatch([1, 4, 5, 2], list(range(base, base + 8)),
                            [base + 8, base + 9, base + 10, base + 11]))
        pm.SetIterationCount(3)
        pm.BuildRenderMesh()
        # Faces reference welded indices: every face index used, and the
        # seam x=1 vertices are shared (used by faces of both patches).
        used = np.unique(pm.faces)
        seam = np.where(np.abs(pm.positions[used, 0] - 1.0) < 1e-5)[0]
        assert seam.size == 4      # level+1 seam samples, welded once

    def test_patchmesh_renders(self):
        ctx = CKContext()
        pm = CKPatchMesh(ctx, "p")
        _flat_quad_patch(pm)
        mat = CKMaterial(ctx, "m")
        mat.SetDiffuse((0.9, 0.9, 0.2, 1))
        mat.SetTwoSided(True)
        pm.BuildRenderMesh()
        pm.ApplyGlobalMaterial(mat)
        ent = CK3dObject(ctx, "e")
        ent.SetCurrentMesh(pm)
        rm = ctx.GetRenderManager()
        rc = rm.CreateRenderContext(64, 64)
        cam = CKCamera(ctx, "c")
        cam.SetPosition((0.5, 0.5, -3.0))
        rc.AttachViewpointToCamera(cam)
        rc.Render()
        assert rc.framebuffer().sum() > 0
