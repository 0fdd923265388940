"""ObjectAnimation / keyframe-data API surface
(reference include/RCKObjectAnimation.h, include/RCKKeyframeData.h)."""
import numpy as np

from ckrenderengine_tpu.anim import (
    CKANIMATION_TCB_POS, CKObjectAnimation,
)
from ckrenderengine_tpu.objects import CK3dObject, CKContext, CKMesh


def _anim(ctx):
    oa = CKObjectAnimation(ctx, "oa")
    oa.AddPositionKey(0.0, (0, 0, 0))
    oa.AddPositionKey(10.0, (10, 0, 0))
    oa.AddRotationKey(0.0, (0, 0, 0, 1))
    oa.AddScaleKey(0.0, (1, 1, 1))
    oa.AddScaleKey(10.0, (2, 2, 2))
    return oa


class TestControllerSurface:
    def test_add_key_creates_default_controllers(self):
        ctx = CKContext()
        oa = _anim(ctx)
        assert oa.HasPositionInfo() and oa.HasRotationInfo()
        assert oa.HasScaleInfo() and not oa.HasScaleAxisInfo()
        assert oa.GetPositionController().GetKeyCount() == 2
        assert oa.GetRotationController() is not None
        np.testing.assert_allclose(oa.EvaluatePosition(5.0), [5, 0, 0],
                                   atol=1e-5)

    def test_scale_axis_track(self):
        ctx = CKContext()
        oa = CKObjectAnimation(ctx, "oa")
        oa.AddScaleAxisKey(0.0, (0, 0, 0, 1))
        assert oa.HasScaleAxisInfo()
        q = oa.EvaluateScaleAxis(0.0)
        np.testing.assert_allclose(q, [0, 0, 0, 1], atol=1e-6)

    def test_check_scale_keys_repairs_zeros(self):
        ctx = CKContext()
        oa = CKObjectAnimation(ctx, "oa")
        oa.AddScaleKey(0.0, (1, 0, 1))
        oa.AddScaleKey(1.0, (1, 1, 1))
        assert oa.CheckScaleKeys() == 1
        assert oa.GetScaleController().values[0, 1] != 0.0
        assert oa.CheckScaleKeys() == 0

    def test_share_and_reset(self):
        ctx = CKContext()
        a = _anim(ctx)
        b = CKObjectAnimation(ctx, "b")
        b.ShareDataFrom(a)
        assert b.Shared() and not a.Shared()
        assert b.GetPositionController() is a.GetPositionController()
        a.AddPositionKey(20.0, (20, 0, 0))      # visible through b
        assert b.GetPositionController().GetKeyCount() == 3
        b.ResetKeyframeData()
        assert not b.Shared() and not b.HasPositionInfo()
        assert a.HasPositionInfo()              # a untouched

    def test_morph_info_and_vertex_count(self):
        ctx = CKContext()
        oa = CKObjectAnimation(ctx, "oa")
        mc = oa.CreateMorphController(3)
        assert not oa.HasMorphInfo()
        mc.AddKey(0.0, np.zeros((3, 3), np.float32))
        mc.AddKey(1.0, np.ones((3, 3), np.float32),
                  np.tile([0, 0, 1], (3, 1)).astype(np.float32))
        assert oa.HasMorphInfo() and oa.HasMorphNormalInfo()
        assert oa.GetMorphVertexCount() == 3
        v, n = oa.EvaluateMorphTarget(0.5)
        np.testing.assert_allclose(v, 0.5, atol=1e-6)
        mc.SetMorphVertexCount(5)
        assert oa.GetMorphVertexCount() == 5
        assert mc.vertex_keys.shape == (2, 5, 3)

    def test_current_step_and_merged(self):
        ctx = CKContext()
        ent = CK3dObject(ctx, "e")
        a = _anim(ctx)
        a.Set3dEntity(ent)
        a.SetStep(0.5)
        assert a.GetCurrentStep() == 0.5
        assert not a.IsMerged()
        b = _anim(ctx)
        m = CKObjectAnimation.CreateMergedAnimation(ctx, a, b)
        assert m.IsMerged()

    def test_keyframe_length(self):
        ctx = CKContext()
        oa = _anim(ctx)
        oa.SetKeyframeLength(42.0)
        assert oa.GetKeyframeLength() == 42.0


class TestKeyframeDataSurface:
    def test_dump_read_round_trip(self):
        ctx = CKContext()
        oa = CKObjectAnimation(ctx, "oa")
        c = oa.CreateController(CKANIMATION_TCB_POS)
        c.AddKey(0.0, (0, 0, 0), tcb=(0.5, 0.0, 0.0))
        c.AddKey(1.0, (1, 2, 3))
        c.AddKey(2.0, (0, 4, 0))
        raw = c.DumpKeysTo()
        c2 = type(c)()
        used = c2.ReadKeysFrom(raw)
        assert used == len(raw)
        assert c2.Compare(c)
        np.testing.assert_allclose(c2.Evaluate(1.5), c.Evaluate(1.5),
                                   atol=1e-6)

    def test_compute_tangents_and_distance(self):
        ctx = CKContext()
        oa = CKObjectAnimation(ctx, "oa")
        c = oa.CreateController(CKANIMATION_TCB_POS)
        c.AddKey(0.0, (0, 0, 0))
        c.AddKey(1.0, (3, 4, 0))
        c.AddKey(2.0, (3, 4, 12))
        tin, tout = c.ComputeTangents()
        assert tin.shape == (3, 3)
        assert abs(c.ComputeKeyDistance() - 17.0) < 1e-5   # 5 + 12

    def test_dim_mismatch_raises(self):
        ctx = CKContext()
        oa = CKObjectAnimation(ctx, "oa")
        oa.AddPositionKey(0.0, (0, 0, 0))
        raw = oa.GetPositionController().DumpKeysTo()
        oa.AddRotationKey(0.0, (0, 0, 0, 1))
        try:
            oa.GetRotationController().ReadKeysFrom(raw)
            assert False
        except ValueError:
            pass


class TestSkinSurface:
    def _skin(self):
        ctx = CKContext()
        bone0 = CK3dObject(ctx, "b0")
        bone1 = CK3dObject(ctx, "b1")
        bone1.SetPosition((0, 2, 0))
        ent = CK3dObject(ctx, "skinned")
        skin = ent.CreateSkin()
        skin.SetBoneCount(2)
        skin.bones[0].SetBone(bone0)
        skin.bones[1].SetBone(bone1)
        skin.bones[1].SetBoneInitialInverseMatrix(
            np.linalg.inv(bone1.GetWorldMatrix()))
        skin.SetVertexCount(3)
        for i, p in enumerate([(0, 0, 0), (0, 1, 0), (0, 2, 0)]):
            skin.SetInitialPos(i, p)
            skin.SetNormal(i, (0, 0, 1))
        skin.SetVertexWeights(0, [0], [1.0])
        skin.SetVertexWeights(1, [0, 1], [0.5, 0.5])
        skin.SetVertexWeights(2, [1], [1.0])
        return ctx, ent, skin, bone0, bone1

    def test_accessors(self):
        ctx, ent, skin, b0, b1 = self._skin()
        np.testing.assert_allclose(skin.GetObjectInitMatrix(), np.eye(4))
        np.testing.assert_allclose(skin.GetInitialPos(1), [0, 1, 0])
        assert skin.GetNormalCount() == 3
        np.testing.assert_allclose(skin.GetNormal(0), [0, 0, 1])
        assert skin.GetWeight(1, 0) == 0.5
        skin.SetWeight(1, 0, 0.25)
        assert skin.GetWeight(1, 0) == 0.25
        p, bones, ws = skin.GetVertexData(2)
        assert bones == [1] and ws == [1.0]
        assert skin.GetBonesArray().shape == skin.GetWeightsArray().shape
        assert skin.bones[0].GetInitialInverseMatrix().shape == (4, 4)

    def test_bone_point_lists(self):
        ctx, ent, skin, b0, b1 = self._skin()
        lists = skin.BuildBonePointLists()
        assert [v for v, w in lists[0]] == [0, 1]
        assert [v for v, w in lists[1]] == [1, 2]
        skin.ClearBonePointLists()
        assert skin.GetBonePointLists()[1][1][0] == 2

    def test_transfo_matrices_identity_at_rest(self):
        ctx, ent, skin, b0, b1 = self._skin()
        mats = skin.ConstructBoneTransfoMatrices()
        assert mats.shape == (2, 4, 4)
        np.testing.assert_allclose(mats[0], np.eye(4), atol=1e-6)
        np.testing.assert_allclose(mats[1], np.eye(4), atol=1e-6)

    def test_calc_points_ex_follows_bone(self):
        ctx, ent, skin, b0, b1 = self._skin()
        b1.SetPosition((1, 2, 0))          # move bone1 +x by 1
        pos, nrm = skin.CalcPointsEx()
        np.testing.assert_allclose(pos[0], [0, 0, 0], atol=1e-5)
        np.testing.assert_allclose(pos[2], [1, 2, 0], atol=1e-5)
        np.testing.assert_allclose(pos[1], [0.5, 1, 0], atol=1e-5)
        np.testing.assert_allclose(nrm[2], [0, 0, 1], atol=1e-5)
        lo, hi = skin.CalcLocalBBox()
        np.testing.assert_allclose(hi, [1, 2, 0], atol=1e-5)

    def test_remap_vertices(self):
        ctx, ent, skin, b0, b1 = self._skin()
        skin.RemapVertices([2, 0, 1])
        np.testing.assert_allclose(skin.GetInitialPos(0), [0, 2, 0])
        assert skin.GetVertexData(0)[1] == [1]
        assert skin.GetVertexCount() == 3

    def test_normal_count_resize(self):
        ctx, ent, skin, b0, b1 = self._skin()
        skin.SetNormalCount(5)
        assert skin.GetNormalCount() == 5
        np.testing.assert_allclose(skin.GetNormal(0), [0, 0, 1])


class TestSerializationRoundTrip:
    def test_sclaxis_and_morph_survive_save_load(self, tmp_path):
        from ckrenderengine_tpu.io.serialize import (load_object, registry,
                                                     save_object)
        ctx = CKContext()
        oa = CKObjectAnimation(ctx, "oa")
        oa.AddPositionKey(0.0, (0, 0, 0))
        oa.AddScaleAxisKey(0.0, (0, 0, 0, 1))
        oa.AddScaleAxisKey(2.0, (0, 0.7071, 0, 0.7071))
        mc = oa.CreateMorphController(2)
        mc.AddKey(0.0, [[0, 0, 0], [1, 1, 1]])
        chunk = save_object(oa)
        clone = CKObjectAnimation(ctx, "clone")
        load_object(clone, chunk, ctx)
        assert clone.HasScaleAxisInfo()
        assert clone.GetMorphVertexCount() == 2
        np.testing.assert_allclose(
            clone.EvaluateScaleAxis(1.0), oa.EvaluateScaleAxis(1.0),
            atol=1e-6)
