"""Animation/character/IK/curve-point/patch-mesh API long tail
(reference RCKAnimation / RCKCharacter / RCKKinematicChain /
RCKCurvePoint / RCKPatchMesh headers)."""
import numpy as np

from ckrenderengine_tpu.anim import (
    CKBodyPart, CKCharacter, CKKeyedAnimation, CKKinematicChain,
    CKObjectAnimation,
)
from ckrenderengine_tpu.anim.ik import SVDDecompose, SVDSolve
from ckrenderengine_tpu.objects import (
    CK3dObject, CKContext, CKCurve, CKMesh, CKPatchMesh,
)


def _clip(ctx, ent, length=10.0):
    ka = CKKeyedAnimation(ctx, "clip")
    oa = CKObjectAnimation(ctx, "oa")
    oa.Set3dEntity(ent)
    oa.AddPositionKey(0.0, (0, 0, 0))
    oa.AddPositionKey(length, (10, 0, 0))
    ka.AddAnimation(oa)
    ka.SetLength(length)
    return ka, oa


class TestAnimationSurface:
    def test_interrupt_and_orientation_flags(self):
        ctx = CKContext()
        ent = CK3dObject(ctx, "e")
        ka, oa = _clip(ctx, ent)
        assert ka.CanBeInterrupt()
        ka.SetCanBeInterrupt(False)
        assert not ka.CanBeInterrupt()
        assert ka.DoesCharacterTakeOrientation()
        ka.SetCharacterOrientation(False)
        assert not ka.DoesCharacterTakeOrientation()
        ka.SetSecondaryAnimationMode(2)
        assert ka.GetSecondaryAnimationMode() == 2
        ka.SetLinkedFrameRate(True, 24.0)
        assert ka.GetLinkedFrameRate() == 24.0

    def test_next_frame_wraps(self):
        ctx = CKContext()
        ent = CK3dObject(ctx, "e")
        ka, oa = _clip(ctx, ent, 10.0)
        ka.SetFrame(8.0)
        assert abs(ka.GetNextFrame(4.0) - 2.0) < 1e-5
        assert abs(ka.GetNextFrame(-9.0) - 9.0) < 1e-5

    def test_current_step(self):
        ctx = CKContext()
        ent = CK3dObject(ctx, "e")
        ka, oa = _clip(ctx, ent, 10.0)
        ka.SetCurrentStep(0.5)
        assert abs(ka.GetFrame() - 5.0) < 1e-5
        assert abs(ka.GetCurrentStep() - 0.5) < 1e-5
        np.testing.assert_allclose(ent.GetPosition(), [5, 0, 0], atol=1e-5)

    def test_update_root_entity(self):
        ctx = CKContext()
        root = CK3dObject(ctx, "root")
        child = CK3dObject(ctx, "child")
        child.SetParent(root)
        ka = CKKeyedAnimation(ctx, "clip")
        oa_c = CKObjectAnimation(ctx, "oc")
        oa_c.Set3dEntity(child)
        oa_r = CKObjectAnimation(ctx, "or")
        oa_r.Set3dEntity(root)
        ka.AddAnimation(oa_c)
        ka.AddAnimation(oa_r)
        assert ka.UpdateRootEntity()
        assert ka.GetRootAnimationInternal() is oa_r
        assert ka.GetRootEntity() is root
        ka.SetParentKeyedAnimation(None)
        assert ka.GetParentKeyedAnimation() is None
        assert ka.GetRootVectorInternal().shape == (3,)


class TestCharacterSurface:
    def _char(self):
        ctx = CKContext()
        char = CKCharacter(ctx, "c")
        part = CKBodyPart(ctx, "p")
        char.AddBodyPart(part)
        ka, oa = _clip(ctx, part)
        char.AddAnimation(ka)
        return ctx, char, part, ka

    def test_starting_frame(self):
        ctx, char, part, ka = self._char()
        char.SetActiveAnimation(ka)
        char.SetStartingFrame(3.0)
        assert char.GetStartingFrame() == 3.0
        assert abs(ka.GetFrame() - 3.0) < 1e-6

    def test_secondary_removal_and_predelete(self):
        ctx, char, part, ka = self._char()
        char.PlaySecondaryAnimation(ka, loops=2)
        assert char.GetSecondaryAnimationsCount() == 1
        assert char.RemoveSecondaryAnimationAt(0)
        assert char.GetSecondaryAnimationsCount() == 0
        assert not char.RemoveSecondaryAnimationAt(5)
        part.SetExclusiveAnimation(ka)
        char.PreDeleteBodyPartsForAnimation(ka)
        assert part.GetExclusiveAnimation() is None

    def test_find_floor_reference(self):
        ctx, char, part, ka = self._char()
        floor = CK3dObject(ctx, "floor")
        fm = CKMesh(ctx, "floormesh")
        fm.SetPositions(np.array([[-10, 0, -10], [0, 0, 10], [10, 0, -10]],
                                 np.float32))
        fm.SetFaces(np.array([[0, 1, 2]], np.int32))
        floor.SetCurrentMesh(fm)
        char.SetPosition((0, 5, 0))
        assert char.FindFloorReference() is floor
        assert char.GetFloorReferenceObject() is floor


class TestIKSurface:
    def test_effector_accessors_and_rotate_toward(self):
        ctx = CKContext()
        root = CKBodyPart(ctx, "root")
        mid = CKBodyPart(ctx, "mid")
        tip = CKBodyPart(ctx, "tip")
        mid.SetParent(root)
        tip.SetParent(mid)
        mid.SetPosition((0, 1, 0), ref=root)
        tip.SetPosition((0, 2, 0), ref=root)
        chain = CKKinematicChain(ctx, "ik")
        chain.SetStartEffector(root)
        chain.SetEndEffector(tip)
        assert chain.GetEffector(True) is root
        assert chain.GetEffector(False) is tip
        # rotate root so the chain tip moves toward +x
        assert chain.IKRotateToward(root, (2, 0, 0))
        tippos = tip.GetWorldMatrix()[3, :3]
        assert tippos[0] > 0.5                 # moved toward target

    def test_svd_helpers(self):
        m = np.array([[3.0, 0], [0, 0.5], [0, 0]], np.float64)
        u, s, vt = SVDDecompose(m)
        np.testing.assert_allclose(sorted(s, reverse=True), [3.0, 0.5],
                                   atol=1e-12)
        x = SVDSolve(m, [6.0, 1.0, 0.0])
        np.testing.assert_allclose(x, [2.0, 2.0], atol=1e-9)
        xd = SVDSolve(m, [6.0, 1.0, 0.0], damping=0.1)
        assert np.all(np.abs(xd) <= np.abs(x) + 1e-12)   # damped shrinks


class TestCurvePointSurface:
    def test_set_curve_and_vectors(self):
        ctx = CKContext()
        c1 = CKCurve(ctx, "c1")
        c2 = CKCurve(ctx, "c2")
        p = c1.AddControlPoint((0, 0, 0))
        assert p.GetCurve() is c1
        p.SetCurve(c2)
        assert p.GetCurve() is c2
        assert p not in c1.points and p in c2.points
        p.SetFittedVector((1, 2, 3))
        np.testing.assert_allclose(p.GetFittedVector(), [1, 2, 3])
        p.SetReservedVector((4, 5, 6))
        np.testing.assert_allclose(p.GetReservedVector(), [4, 5, 6])

    def test_construct_matrices_on_entity(self):
        ctx = CKContext()
        e = CK3dObject(ctx, "e")
        e.ConstructWorldMatrix((1, 2, 3), (0, 0, 0, 1), (2, 2, 2))
        m = e.GetWorldMatrix()
        np.testing.assert_allclose(m[3, :3], [1, 2, 3], atol=1e-6)
        np.testing.assert_allclose(m[0, 0], 2.0, atol=1e-6)
        e.ConstructLocalMatrixEx((0, 0, 0), (0, 0, 0, 1), (3, 1, 1),
                                 (0, 0, 0, 1))
        np.testing.assert_allclose(e.GetLocalMatrix()[0, 0], 3.0, atol=1e-6)


class TestPatchMeshSurface:
    def _pm(self, ctx):
        pm = CKPatchMesh(ctx, "pm")
        pm.SetVertCount(6)
        for i, p in enumerate([(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
                               (2, 0, 0), (2, 1, 0)]):
            pm.SetVert(i, p)
        pm.SetVecCount(0)
        from ckrenderengine_tpu.objects.patchmesh import CKPatch
        # two quads sharing the edge (1,2)
        def mk(c):
            verts = np.array([pm.GetVert(i) for i in c], np.float32)
            evs, inter = [], []
            for k in range(4):
                a, b = verts[k], verts[(k + 1) % 4]
                evs += [len(evs), len(evs) + 1]
            return c
        pm.SetIterationCount(2)
        # edge vectors at thirds
        vecs = []
        def add_patch(c):
            idxs = []
            verts = [pm.GetVert(i) for i in c]
            for k in range(4):
                a = np.asarray(verts[k]); b = np.asarray(verts[(k + 1) % 4])
                for t in (1/3, 2/3):
                    vecs.append(a + (b - a) * t)
                    idxs.append(len(vecs) - 1)
            inter = []
            ctr = np.mean(verts, 0)
            for k in range(4):
                vecs.append(ctr)
                inter.append(len(vecs) - 1)
            pm.AddPatch(CKPatch(c, idxs, inter))
        add_patch([0, 1, 2, 3])
        add_patch([1, 4, 5, 2])
        pm.SetVecs(np.asarray(vecs, np.float32))
        return pm

    def test_vertex_index_helpers(self):
        ctx = CKContext()
        pm = self._pm(ctx)
        pm.BuildRenderMesh()
        n = pm.GetIterationCount() + 1
        # corner (0,0) of patch 0 evaluates to control corner 0
        vi = pm.ComputeQuadVertexIndex(0, 0, 0)
        np.testing.assert_allclose(pm.positions[vi], pm.GetVert(0), atol=1e-4)
        vi2 = pm.ComputeQuadVertexIndex(1, 0, 0)
        assert vi2 == n * n                  # second patch base
        np.testing.assert_allclose(pm.positions[vi2], pm.GetVert(1),
                                   atol=1e-4)
        assert pm.ComputeQuadVertexIndex(0, n, 0) == -1
        cmap = pm.EnsureCornerVertexMapAllocated()
        assert pm.GetPatchCornerForVertex(0, cmap[0][2]) == 2
        assert pm.GetPatchCornerForVertex(0, 99999) == -1

    def test_corner_uv_and_write(self):
        ctx = CKContext()
        pm = self._pm(ctx)
        u, v = pm.GetCornerTextureCoordinate(0, 2)
        assert (u, v) == (1.0, 1.0)          # default 0..1 corner UVs
        pm.BuildRenderMesh()
        arr = pm.GetTextureChannelPtr()
        pm.WriteTextureCoordinate(0, 0.25, 0.75)
        np.testing.assert_allclose(arr[0], [0.25, 0.75], atol=1e-6)

    def test_hard_edge_splits_weld(self):
        ctx = CKContext()
        pm = self._pm(ctx)
        pm.BuildRenderMesh()
        welded_faces = pm.faces.copy()
        # default per-patch 0..1 UVs do NOT match across the edge
        assert not pm.DoPatchesShareUVOnEdge(1, 2)
        # an unshared (border) edge trivially "shares"
        assert pm.DoPatchesShareUVOnEdge(0, 1)
        pm.SetEdgeHard(1, 2, True)
        assert pm.IsEdgeHard(1, 2)
        pm.BuildRenderMesh()
        hard_faces = pm.faces.copy()
        assert not np.array_equal(welded_faces, hard_faces)
        # with the hard edge, patch 1's edge verts reference themselves
        n = pm.GetIterationCount() + 1
        own = pm.ComputeQuadVertexIndex(1, 0, 0)
        assert own in hard_faces

    def test_tri_interior_offset(self):
        ctx = CKContext()
        pm = CKPatchMesh(ctx, "t")
        pm.SetIterationCount(3)
        assert pm.TriInteriorOffset(0, 0) == 0
        assert pm.TriInteriorOffset(1, 0) == 4      # row 0 has level+1=4
        assert pm.TriInteriorOffset(1, 2) == 6

    def test_load_vertices_round_trip(self):
        from ckrenderengine_tpu.io.serialize import save_object
        ctx = CKContext()
        pm = self._pm(ctx)
        chunk = save_object(pm)
        pm2 = CKPatchMesh(ctx, "pm2")
        assert pm2.LoadVertices(chunk)
        np.testing.assert_allclose(pm2.verts, pm.verts)
        assert pm2.GetIterationCount() == pm.GetIterationCount()
