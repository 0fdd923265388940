"""Progressive mesh tests (reference RCKMesh::CreatePM edge collapse +
geomorph lerp)."""

import numpy as np
import pytest

from ckrenderengine_tpu.objects import CK3dObject, CKCamera, CKContext, CKMaterial, CKMesh
from ckrenderengine_tpu.utils.progressive import (
    compute_collapse_order, faces_at_lod, geomorph_positions, lod_remap,
)


def grid_mesh(n):
    xs = np.linspace(0, 1, n + 1)
    gx, gy = np.meshgrid(xs, xs, indexing="ij")
    verts = np.stack([gx, gy, np.zeros_like(gx)], -1).reshape(-1, 3).astype(np.float32)
    faces = []
    for r in range(n):
        for c in range(n):
            a = r * (n + 1) + c
            faces += [[a, a + 1, a + n + 2], [a, a + n + 2, a + n + 1]]
    return verts, np.asarray(faces, np.int32)


class TestCollapse:
    def test_lod_reduces_faces_monotonically(self):
        verts, faces = grid_mesh(6)
        rank, coll = compute_collapse_order(verts, faces)
        v = verts.shape[0]
        prev = faces.shape[0] + 1
        for n in (v, v // 2, v // 4, 4):
            remap = lod_remap(rank, coll, n)
            f = faces_at_lod(faces, remap)
            assert f.shape[0] <= prev
            prev = f.shape[0]
        # full budget = original faces
        remap = lod_remap(rank, coll, v)
        np.testing.assert_array_equal(faces_at_lod(faces, remap), faces)

    def test_flat_grid_collapses_cheaply(self):
        # a flat grid has zero curvature: interior collapses cost ~0
        verts, faces = grid_mesh(4)
        rank, coll = compute_collapse_order(verts, faces)
        v = verts.shape[0]
        remap = lod_remap(rank, coll, max(4, v // 5))
        f = faces_at_lod(faces, remap)
        assert 0 < f.shape[0] < faces.shape[0] // 2

    def test_geomorph_endpoints(self):
        verts, faces = grid_mesh(3)
        rank, coll = compute_collapse_order(verts, faces)
        half = verts.shape[0] // 2
        p0 = geomorph_positions(verts, rank, coll, half, 0.0)
        np.testing.assert_array_equal(p0, verts)
        p1 = geomorph_positions(verts, rank, coll, half, 1.0)
        remap = lod_remap(rank, coll, half)
        moved = remap != np.arange(verts.shape[0])
        np.testing.assert_allclose(p1[moved], verts[remap[moved]], atol=1e-6)


class TestMeshPM:
    def test_pm_api_roundtrip(self):
        ctx = CKContext()
        mesh = CKMesh(ctx, "m")
        verts, faces = grid_mesh(5)
        mesh.SetPositions(verts)
        mesh.SetFaces(faces)
        mesh.BuildNormals()
        full_faces = mesh.GetFaceCount()
        assert not mesh.IsPM()
        mesh.CreatePM()
        assert mesh.IsPM()
        mesh.SetPMVertexCount(10)
        assert 0 < mesh.GetFaceCount() < full_faces
        mesh.SetPMVertexCount(verts.shape[0])
        assert mesh.GetFaceCount() == full_faces
        mesh.DestroyPM()
        assert not mesh.IsPM()
        assert mesh.GetFaceCount() == full_faces

    def test_pm_renders_at_low_lod(self):
        ctx = CKContext()
        mesh = CKMesh(ctx, "m")
        verts, faces = grid_mesh(6)
        mesh.SetPositions(verts * 2 - 1)
        mesh.SetFaces(faces)
        mesh.BuildNormals()
        mat = CKMaterial(ctx, "mat")
        mat.SetEmissive((0, 0.8, 0.8, 1))
        mat.SetTwoSided(True)
        mesh.ApplyGlobalMaterial(mat)
        obj = CK3dObject(ctx, "o")
        obj.SetCurrentMesh(mesh)
        rm = ctx.GetRenderManager()
        rc = rm.CreateRenderContext(64, 64)
        cam = CKCamera(ctx, "c")
        cam.SetPosition((0, 0, -4))
        rc.AttachViewpointToCamera(cam)
        mesh.CreatePM()
        mesh.SetPMVertexCount(12)
        rc.Render()
        fb = rc.framebuffer()
        assert (fb[..., 2] > 0.5).sum() > 500   # still covers the screen area


def test_vertex_weights_protect_from_collapse():
    """PM vertex weights (reference RCKMesh::SetVertexWeight,
    include/RCKMesh.h:75-78) scale the collapse cost: heavily weighted
    vertices collapse LAST (highest rank)."""
    import numpy as np
    from ckrenderengine_tpu.utils.progressive import compute_collapse_order

    rng = np.random.default_rng(5)
    pos = rng.uniform(-1, 1, (24, 3)).astype(np.float32)
    # strip-like triangle topology
    faces = np.array([[i, i + 1, i + 2] for i in range(22)], np.int32)
    rank_plain, _ = compute_collapse_order(pos, faces)
    w = np.zeros(24, np.float32)
    victim = int(np.argmin(rank_plain))      # collapses first unweighted
    w[victim] = 100.0
    rank_w, _ = compute_collapse_order(pos, faces, weights=w)
    assert rank_w[victim] > rank_plain[victim]


def test_mesh_vertex_weight_api():
    import numpy as np
    from ckrenderengine_tpu.objects import CKContext, CKMesh

    ctx = CKContext()
    mesh = CKMesh(ctx, "m")
    mesh.SetPositions(np.zeros((5, 3), np.float32))
    assert mesh.GetVertexWeightsCount() == 0
    mesh.SetVertexWeight(2, 3.5)            # auto-allocates
    assert mesh.GetVertexWeightsCount() == 5
    assert mesh.GetVertexWeight(2) == 3.5
    assert mesh.GetVertexWeight(0) == 0.0
    mesh.SetVertexWeightsCount(3)           # shrink keeps prefix
    assert mesh.GetVertexWeightsCount() == 3
    assert mesh.GetVertexWeight(2) == 3.5
    assert mesh.GetVertexWeightsPtr().shape == (3,)


def test_lod_remap_resolves_collapse_chains():
    """Regression: remap must follow collapse chains to FINAL survivors.
    Processing in removal order left faces referencing intermediate dead
    vertices, so low budgets silently rendered near-full geometry."""
    import numpy as np
    from ckrenderengine_tpu.utils.progressive import (
        compute_collapse_order, faces_at_lod, lod_remap)

    rng = np.random.default_rng(11)
    n = 9
    yy, xx = np.mgrid[0:n, 0:n] / (n - 1.0)
    pos = np.stack([xx, yy, rng.uniform(0, .2, (n, n))], -1)
    pos = pos.reshape(-1, 3).astype(np.float32)
    faces = []
    for r in range(n - 1):
        for c in range(n - 1):
            a, b = r * n + c, r * n + c + 1
            d, e = (r + 1) * n + c, (r + 1) * n + c + 1
            faces += [[a, e, b], [a, d, e]]
    faces = np.asarray(faces, np.int32)
    rank, collapse = compute_collapse_order(pos, faces)
    for budget in (6, 12, 30):
        remap = lod_remap(rank, collapse, budget)
        survivors = set(np.nonzero(rank >= rank.shape[0] - budget)[0])
        lod_faces = faces_at_lod(faces, remap)
        used = set(np.unique(lod_faces).tolist())
        assert used <= survivors, (budget, sorted(used - survivors)[:5])
