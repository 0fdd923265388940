"""Geometry-utility tests mirroring the reference's test strategy
(tests/test_geometry_regressions.cpp, test_nvstripifier.cpp,
test_meshstriper.cpp): radix edge cases, adjacency compaction, nearest-grid
thresholds, strips compared as order-insensitive triangle multisets, cache
optimization improving simulated miss counts."""

import numpy as np
import pytest

from ckrenderengine_tpu.utils import (
    BOUNDARY, MeshAdjacency, MeshStriper, NearestPointGrid, NvStripifier,
    PlaceFitter, RadixSorter, VertexCache, VertexCacheOptimizer, native,
    strip_to_triangles,
)
from ckrenderengine_tpu.objects import CKContext, CKMesh
from ckrenderengine_tpu.objects.vertexbuffer import CKVertexBuffer


def tri_multiset(faces) -> set:
    """Order-insensitive triangle multiset (reference
    tests/TestTriangleMultiset.h:19-49) — winding-insensitive keys."""
    return sorted(tuple(sorted(map(int, f))) for f in np.asarray(faces))


def grid_faces(n: int) -> np.ndarray:
    """(2n^2, 3) triangulated n x n grid."""
    faces = []
    for r in range(n):
        for c in range(n):
            a = r * (n + 1) + c
            b = a + 1
            d = a + n + 1
            e = d + 1
            faces += [[a, b, e], [a, e, d]]
    return np.asarray(faces, np.uint32)


class TestRadix:
    def test_empty_input(self):
        rs = RadixSorter()
        assert rs.Sort(np.zeros(0, np.uint32)).GetIndices().shape == (0,)

    def test_u32_sort(self):
        rng = np.random.default_rng(0)
        v = rng.integers(0, 2**32, 1000, dtype=np.uint32)
        idx = RadixSorter().Sort(v).GetIndices()
        assert np.all(np.diff(v[idx].astype(np.uint64)) >= 0)

    def test_f32_sort_with_negatives(self):
        rng = np.random.default_rng(1)
        v = rng.normal(0, 100, 500).astype(np.float32)
        idx = RadixSorter().Sort(v).GetIndices()
        assert np.all(np.diff(v[idx]) >= 0)

    def test_stable_on_duplicates(self):
        v = np.array([3, 1, 3, 1, 3], np.uint32)
        idx = RadixSorter().Sort(v).GetIndices()
        ones = idx[v[idx] == 1]
        assert list(ones) == [1, 3]


class TestAdjacency:
    def test_two_triangles_share_edge(self):
        faces = np.array([[0, 1, 2], [2, 1, 3]], np.uint32)
        ma = MeshAdjacency(faces)
        # shared edge (1,2): face0 edge1 (1->2), face1 edge0 (2->1)
        assert ma.adj[0, 1] == 1
        assert ma.adj[1, 0] == 0
        assert ma.BoundaryEdgeCount() == 4

    def test_closed_fan_no_boundary_inside(self):
        faces = grid_faces(4)
        ma = MeshAdjacency(faces)
        interior = (ma.adj != BOUNDARY).sum()
        assert interior > 0
        # boundary edges = perimeter of grid: 4 sides x 4 segments + diagonals?
        # each diagonal is shared; outer edges are open: 4*4 = 16
        assert ma.BoundaryEdgeCount() == 16

    def test_empty(self):
        ma = MeshAdjacency(np.zeros((0, 3), np.uint32))
        assert ma.adj.shape == (0, 3)


class TestStripify:
    @pytest.mark.parametrize("n", [1, 2, 4, 8])
    def test_strips_cover_exact_triangle_multiset(self, n):
        faces = grid_faces(n)
        ms = MeshStriper()
        ms.Compute(faces)
        out = []
        for i in range(ms.GetStripCount()):
            out.append(strip_to_triangles(ms.GetStrip(i)))
        got = tri_multiset(np.concatenate(out))
        assert got == tri_multiset(faces)

    def test_strips_are_longer_than_trilist(self):
        faces = grid_faces(8)
        ms = MeshStriper()
        ms.Compute(faces)
        total_idx = sum(len(ms.GetStrip(i)) for i in range(ms.GetStripCount()))
        assert total_idx < faces.shape[0] * 3   # strips save indices

    def test_connect_all_single_strip(self):
        faces = grid_faces(3)
        ms = MeshStriper()
        ms.Compute(faces)
        joined = ms.ConnectAll()
        got = tri_multiset(strip_to_triangles(joined))
        assert got == tri_multiset(faces)      # degenerates skipped

    def test_nvstripifier_max_length(self):
        faces = grid_faces(6)
        nv = NvStripifier(max_strip_length=10)
        strips = nv.Stripify(faces)
        assert all(len(s) <= 10 for s in strips)
        got = tri_multiset(np.concatenate(
            [strip_to_triangles(s) for s in strips]))
        assert got == tri_multiset(faces)

    def test_empty_and_single(self):
        assert MeshStriper().Compute(np.zeros((0, 3), np.uint32))
        ms = MeshStriper()
        ms.Compute(np.array([[5, 9, 7]], np.uint32))
        assert ms.GetStripCount() == 1
        assert tri_multiset(strip_to_triangles(ms.GetStrip(0))) == \
            tri_multiset([[5, 9, 7]])


def wind_multiset(faces) -> list:
    """Winding-AWARE triangle multiset: canonical rotation (min vertex
    first) preserves cyclic order, so a reversed-winding emission fails."""
    out = []
    for f in np.asarray(faces):
        f = [int(x) for x in f]
        k = min(range(3), key=lambda i: f[i])
        out.append(tuple(f[k:] + f[:k]))
    return sorted(out)


class TestNvStripifier:
    """The multi-sample bidirectional algorithm (distinct from MeshStriper's
    greedy walker, mirroring the reference's two stripifiers
    /root/reference/src/MeshStriper.cpp vs src/NvStripifier.cpp)."""

    def test_winding_preserving_coverage(self):
        for n in (1, 3, 8):
            faces = grid_faces(n)
            strips = NvStripifier().Stripify(faces)
            tris = np.concatenate([strip_to_triangles(s) for s in strips])
            assert wind_multiset(tris) == wind_multiset(faces)

    def test_backward_growth_parity(self):
        # A long single row of quads: any interior seed must grow BOTH ways;
        # the odd-backward-count degenerate fix keeps winding intact.
        faces = []
        for c in range(12):
            a, b, d, e = c, c + 1, c + 14, c + 15
            faces += [[a, b, e], [a, e, d]]
        faces = np.asarray(faces, np.uint32)
        strips = NvStripifier().Stripify(faces)
        tris = np.concatenate([strip_to_triangles(s) for s in strips])
        assert wind_multiset(tris) == wind_multiset(faces)

    def test_fewer_or_equal_strips_than_greedy(self):
        # Strip quality (the reference's reason for shipping NvStripifier):
        # candidate search + bidirectional growth must never do worse than
        # the one-pass greedy walker on regular topology.
        for n in (4, 8, 12):
            faces = grid_faces(n)
            nv_strips = NvStripifier().Stripify(faces)
            ms = MeshStriper()
            ms.Compute(faces)
            assert len(nv_strips) <= ms.GetStripCount()

    def test_native_vs_python_identical(self):
        faces = grid_faces(6)
        strips_native = NvStripifier().Stripify(faces)
        lib = native._lib
        try:
            native._lib = None
            native._tried = True
            strips_py = NvStripifier().Stripify(faces)
        finally:
            native._lib = lib
        assert len(strips_native) == len(strips_py)
        for a, b in zip(strips_native, strips_py):
            np.testing.assert_array_equal(a, b)

    def test_nonmanifold_and_isolated(self):
        # three faces sharing one edge (non-manifold) + an isolated face
        faces = np.array([[0, 1, 2], [1, 0, 3], [0, 1, 4], [10, 11, 12]],
                         np.uint32)
        strips = NvStripifier().Stripify(faces)
        tris = np.concatenate([strip_to_triangles(s) for s in strips])
        assert tri_multiset(tris) == tri_multiset(faces)


class TestVertexCache:
    def test_fifo_semantics(self):
        c = VertexCache(2)
        assert c.AddEntry(1)       # miss
        assert c.AddEntry(2)       # miss
        assert not c.AddEntry(1)   # hit (FIFO: no reorder on hit)
        assert c.AddEntry(3)       # miss, evicts oldest (1)
        assert not c.AddEntry(2)   # still cached
        assert c.AddEntry(1)       # miss again after eviction

    def test_optimizer_preserves_multiset_and_improves_misses(self):
        faces = grid_faces(10)
        rng = np.random.default_rng(2)
        shuffled = faces[rng.permutation(faces.shape[0])]
        opt = VertexCacheOptimizer(16)
        reordered = opt.OptimizeFaces(shuffled)
        assert tri_multiset(reordered) == tri_multiset(faces)
        before = VertexCache.MissCount(shuffled.reshape(-1), 16)
        after = VertexCache.MissCount(reordered.reshape(-1), 16)
        assert after < before


class TestNearestPointGrid:
    def test_nearest_and_threshold(self):
        pts = np.array([[0, 0, 0], [5, 0, 0], [0, 5, 0]], np.float32)
        g = NearestPointGrid(pts, cell_size=1.0)
        assert g.GetNearestPoint((0.4, 0, 0), 1.0) == 0
        assert g.GetNearestPoint((4.8, 0.1, 0), 1.0) == 1
        assert g.GetNearestPoint((2.5, 2.5, 0), 1.0) is None

    def test_empty(self):
        g = NearestPointGrid(np.zeros((0, 3), np.float32))
        assert g.GetNearestPoint((0, 0, 0), 10.0) is None


class TestPlaceFitter:
    def test_common_box(self):
        rng = np.random.default_rng(3)
        shared = rng.normal(0, 1, (20, 3)).astype(np.float32)
        a = np.concatenate([shared, rng.normal(10, 1, (10, 3)).astype(np.float32)])
        b = np.concatenate([shared, rng.normal(-10, 1, (10, 3)).astype(np.float32)])
        fit = PlaceFitter.ComputeBestFitBBox(a, b, threshold=1e-4)
        assert fit is not None
        center, axes, half = fit
        np.testing.assert_allclose(center, shared.mean(0), atol=1e-4)

    def test_no_overlap(self):
        a = np.zeros((5, 3), np.float32)
        b = np.full((5, 3), 100.0, np.float32)
        assert PlaceFitter.ComputeBestFitBBox(a, b, 0.5) is None


class TestNativeParity:
    def test_native_lib_loads(self):
        # The image ships g++; the native path must be active.
        assert native.available()

    def test_stripify_native_vs_python(self):
        faces = grid_faces(5)
        strips_native = MeshStriper()
        strips_native.Compute(faces)
        # force python fallback
        lib = native._lib
        try:
            native._lib = None
            native._tried = True
            strips_py = MeshStriper()
            strips_py.Compute(faces)
        finally:
            native._lib = lib
        a = tri_multiset(np.concatenate(
            [strip_to_triangles(s) for s in strips_native.strips]))
        b = tri_multiset(np.concatenate(
            [strip_to_triangles(s) for s in strips_py.strips]))
        assert a == b == tri_multiset(faces)


class TestMeshIntegration:
    def test_stripify_flag_preserves_groups(self):
        from ckrenderengine_tpu.objects.mesh import VXMESH_STRIPIFY

        ctx = CKContext()
        mesh = CKMesh(ctx, "m")
        n = 6
        verts = np.zeros(((n + 1) * (n + 1), 3), np.float32)
        for r in range(n + 1):
            for c in range(n + 1):
                verts[r * (n + 1) + c] = (c, r, 0)
        mesh.SetPositions(verts)
        mesh.SetFaces(grid_faces(n).astype(np.int32))
        mesh.flags |= VXMESH_STRIPIFY
        groups = mesh.GetRenderGroups()
        got = np.concatenate(
            [g.vertex_map[g.local_faces] for g in groups])
        assert tri_multiset(got) == tri_multiset(grid_faces(n))


class TestVertexBuffer:
    def test_lock_draw(self):
        ctx = CKContext()
        rm = ctx.GetRenderManager()
        rc = rm.CreateRenderContext(32, 32)
        vb = CKVertexBuffer(ctx, "vb", max_vertices=8)
        pos, col, uv = vb.Lock(0, 3)
        # clip-space triangle covering the center
        pos[:] = [[-0.8, -0.8, 0.5, 1], [0.8, -0.8, 0.5, 1], [0, 0.9, 0.5, 1]]
        col[:] = (1, 0, 0, 1)
        vb.Unlock()
        assert vb.Draw(rc)
        fb = np.moveaxis(np.asarray(rc.fb), 0, -1)
        assert fb[16, 16, 0] > 0.9

    def test_check_grows(self):
        ctx = CKContext()
        vb = CKVertexBuffer(ctx, "vb", max_vertices=4)
        vb.Check(100)
        assert vb.max_vertices >= 100


class TestPointList:
    def test_points_draw(self):
        from ckrenderengine_tpu.raster.types import VXPRIMITIVE

        ctx = CKContext()
        rm = ctx.GetRenderManager()
        rc = rm.CreateRenderContext(32, 32)
        vb = CKVertexBuffer(ctx, "pts", max_vertices=4)
        pos, col, uv = vb.Lock(0, 2)
        pos[:] = [[0, 0, 0.5, 1], [-0.5, 0.5, 0.5, 1]]
        col[:] = (0, 1, 0, 1)
        vb.Unlock()
        assert vb.Draw(rc, prim_type=int(VXPRIMITIVE.POINTLIST))
        fb = np.moveaxis(np.asarray(rc.fb), 0, -1)
        assert (fb[..., 1] > 0.9).sum() >= 2   # both points hit pixels


class TestStripQualityMetric:
    """Strip-quality parity metric (the reference's justification for
    shipping TWO stripifiers: NvStripifier's cache-aware multi-experiment
    growth vs MeshStriper's one-pass greedy walker —
    /root/reference/src/NvStripifier.cpp vs src/MeshStriper.cpp). The
    multi-sample bidirectional algorithm must produce fewer, longer strips
    than the greedy core on real mesh topologies, not merely a valid
    triangle multiset."""

    @staticmethod
    def _fixtures():
        import bench

        yield "grid16", grid_faces(16)
        _, _, sphere = bench.make_sphere(12, 18)
        yield "sphere", sphere.astype(np.uint32)
        _, _, terrain = bench.make_terrain(12, 10.0, 1.0)
        yield "terrain", terrain.astype(np.uint32)

    def test_nv_beats_greedy_on_fixtures(self):
        strictly_better = 0
        for name, faces in self._fixtures():
            nv = NvStripifier().Stripify(faces)
            ms = MeshStriper()
            ms.Compute(faces)
            greedy = [ms.GetStrip(i) for i in range(ms.GetStripCount())]
            n_tris = faces.shape[0]
            nv_mean = n_tris / max(len(nv), 1)
            gr_mean = n_tris / max(len(greedy), 1)
            # Never worse on count or mean tris-per-strip...
            assert len(nv) <= len(greedy), name
            assert nv_mean >= gr_mean - 1e-9, name
            if len(nv) < len(greedy):
                strictly_better += 1
        # ...and strictly better somewhere, else the second algorithm has no
        # reason to exist (the reference's premise).
        assert strictly_better >= 1
