"""CK2 object lifecycle protocol + the final API-surface leftovers
(generic CreateInstance/Register/PrepareDependencies/RemapDependencies/
CheckPreDeletion; material effect appliers; RC staging + sprite3d batches;
light Setup; HAL allocator hooks)."""
import numpy as np
import pytest

from ckrenderengine_tpu.objects import (
    CK3dObject, CKCamera, CKContext, CKLight, CKMaterial, CKMesh,
    CKSprite3D, CKTexture, VXEFFECT_2TEXTURES, VXEFFECT_DP3,
)


def _ctx(size=64):
    ctx = CKContext()
    rc = ctx.GetRenderManager().CreateRenderContext(size, size)
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


class TestLifecycleProtocol:
    def test_create_instance_and_register(self):
        ctx = CKContext()
        m = CKMesh.CreateInstance(ctx, "m")
        assert isinstance(m, CKMesh) and m.GetName() == "m"
        assert CKMesh.Register() == CKMesh.CLASS_ID
        assert CKCamera.Register() == CKCamera.CLASS_ID

    def test_dependencies_count_and_prepare(self):
        ctx, rc, cam = _ctx()
        obj, mesh, mat = _tri(ctx)
        tex = CKTexture(ctx, "t")
        tex.SetImage(np.ones((4, 4, 4), np.float32))
        mat.SetTexture(tex)
        assert obj.GetDependenciesCount() >= 1
        assert mat.IsObjectUsed(tex)
        assert not mat.IsObjectUsed(mesh)
        deps = obj.PrepareDependencies(set())
        assert {obj.id, mesh.id, mat.id, tex.id} <= deps

    def test_remap_dependencies(self):
        ctx, rc, cam = _ctx()
        obj, mesh, mat = _tri(ctx)
        mesh2 = CKMesh(ctx, "other")
        mesh2.SetPositions(mesh.positions.copy())
        mesh2.SetFaces(mesh.faces.copy())
        assert obj.RemapDependencies({mesh.id: mesh2.id})
        assert obj.GetCurrentMesh() is mesh2
        assert len(obj.meshes) == 1            # no duplicate append

    def test_check_pre_deletion_drops_dying_refs(self):
        ctx, rc, cam = _ctx()
        obj, mesh, mat = _tri(ctx)
        mesh._to_be_deleted = True
        obj.CheckPreDeletion()
        assert obj.GetCurrentMesh() is None
        obj.PostLoad()
        obj.PreDelete()
        obj.PreSave()
        obj.CheckPostDeletion()


class TestMaterialEffectAppliers:
    def test_dp3_and_blend_descriptors(self):
        ctx, rc, cam = _ctx()
        mat = CKMaterial(ctx, "m")
        t1 = CKTexture(ctx, "t1")
        t1.SetImage(np.ones((4, 4, 4), np.float32))
        mat.SetTexture(t1, 0)
        mat.SetTexture(t1, 1)
        assert mat.Effect() == 0
        assert mat.DP3Effect() is None
        mat.SetEffect(VXEFFECT_DP3)
        d = mat.DP3Effect()
        assert d is not None and d["dp3"]
        mat.SetEffect(VXEFFECT_2TEXTURES)
        passes = mat.BlendTexturesEffect()
        assert len(passes) == 1 and passes[0]["slot"] == 1
        assert mat.TexGenEffect() == 0

    def test_channel_render_patch_restore(self):
        from ckrenderengine_tpu.raster.types import VXBLEND
        ctx, rc, cam = _ctx()
        mat = CKMaterial(ctx, "m")
        src0, dst0 = mat.GetSourceBlend(), mat.GetDestBlend()
        mat.PatchForChannelRender(int(VXBLEND.SRCALPHA),
                                  int(VXBLEND.INVSRCALPHA))
        assert mat.GetSourceBlend() == int(VXBLEND.SRCALPHA)
        assert mat.AlphaBlendEnabled()
        mat.RestoreAfterChannelRender()
        assert mat.GetSourceBlend() == src0
        assert mat.GetDestBlend() == dst0
        assert not mat.AlphaBlendEnabled()


class TestRcStagingAndSprites:
    def test_structure_helpers(self):
        ctx, rc, cam = _ctx()
        s = rc.AllocateStructure(4)
        assert rc.GetStructure() is s
        rc.ClearStructure()
        assert rc.GetStructure() is None
        idx = rc.GetDrawPrimitiveIndices(5)
        np.testing.assert_array_equal(idx, [0, 1, 2, 3, 4])

    def test_lock_release_current_vb_draws(self):
        ctx, rc, cam = _ctx()
        p, c, u = rc.LockCurrentVB(3)
        p[:] = [[-1, -1, 0.5, 1], [0, 1, 0.5, 1], [1, -1, 0.5, 1]]
        c[:] = [1, 0, 0, 1]
        rc.Clear()
        assert rc.ReleaseCurrentVB(prim_type=2)
        assert rc.framebuffer()[..., 0].sum() > 1.0

    def test_sprite3d_immediate_batches(self):
        ctx, rc, cam = _ctx()
        mat = CKMaterial(ctx, "sm")
        mat.SetDiffuse((0, 1, 0, 1))
        sp = CKSprite3D(ctx, "sp")
        sp.SetMaterial(mat)
        sp.SetPosition((0, 0, 0))
        sp.SetSize((2.0, 2.0))
        sp.Show(False)                      # keep out of the frame program
        rc.Clear()
        assert rc.AddSprite3DBatch(sp)
        assert rc.CallSprite3DBatches() == 1
        assert rc.framebuffer()[..., 1].sum() > 1.0
        assert rc.FlushSprite3DBatchesIfNeeded() == 0
        verts, uvs, indices = sp.FillBatch()
        assert verts.shape == (4, 3) and indices.tolist() == [0, 1, 2, 0,
                                                              2, 3]

    def test_sprite3d_orientation_and_box(self):
        ctx, rc, cam = _ctx()
        sp = CKSprite3D(ctx, "sp")
        sp.SetPosition((0, 0, 10))
        sp.SetSize((2.0, 4.0))
        sp.UpdateOrientation(rc)
        d = sp.GetWorldMatrix()[2, :3]
        assert d[2] < -0.9                  # faces the camera at z=-5
        lo, hi = sp.UpdateBox()
        assert hi[0] - lo[0] == pytest.approx(4.0)
        sp.SetBoundingBox((0, 0, 0), (1, 1, 1))
        lo, hi = sp.GetBoundingBox()
        np.testing.assert_allclose(hi, [1, 1, 1])

    def test_transparent_order_and_render_transparents(self):
        from ckrenderengine_tpu.raster.types import VXBLEND
        ctx, rc, cam = _ctx()
        a, amesh, amat = _tri(ctx, "a")
        b, bmesh, bmat = _tri(ctx, "b")
        a.SetPosition((0, 0, 2))
        b.SetPosition((0, 0, 8))
        for m in (amat, bmat):
            m.EnableAlphaBlend(True)
            m.SetSourceBlend(int(VXBLEND.SRCALPHA))
            m.SetDestBlend(int(VXBLEND.INVSRCALPHA))
        # camera at z=-5: b is farther; separated along z -> b draws first
        assert rc.ClassifyTransparentOrder(a, b) == +1
        assert rc.ClassifyTransparentOrder(b, a) == -1
        assert rc.RenderTransparents() == 2

    def test_misc_lifecycle(self):
        ctx, rc, cam = _ctx()
        obj, mesh, mat = _tri(ctx)
        rc.SetState(5)
        assert rc.GetState() == 5
        assert rc.IsObjectAttached(obj)     # implicit membership
        rc.AddObject(obj)
        assert rc.IsObjectAttached(obj)
        assert rc.DestroyDevice()
        rc.Render()
        assert rc.CopyToVideo().shape == (64, 64, 4)
        rc.RestoreStereoRenderState()
        rc.OnClearAll()
        assert rc.pre_render_callbacks == []
        fb0 = rc.framebuffer().copy()
        assert rc.DrawPVInformationWatermark()
        assert np.abs(rc.framebuffer() - fb0).sum() > 0.1


class TestLightSetupAndHal:
    def test_light_setup_into_hal_context(self):
        from ckrenderengine_tpu.raster.hal import CKRasterizer
        ctx, rc, cam = _ctx()
        rst = CKRasterizer()
        rst.Start(None)
        dev = rst.GetDriver(0).CreateContext()
        dev.Create(None, 16, 16)
        light = CKLight(ctx, "sun")
        light.SetColor((1, 0, 0, 1))
        assert light.Setup(dev, 0)
        assert 0 in dev._lights_on
        assert dev._lights[0]["diffuse"][0] == pytest.approx(1.0)
        light.Active(False)
        assert not light.Setup(dev, 0)
        assert 0 not in dev._lights_on

    def test_attenuation_conversion(self):
        from ckrenderengine_tpu.raster.hal import (
            ConvertAttenuationModelFromDX5)
        a0, a1, a2 = ConvertAttenuationModelFromDX5(0, 0, 0, 100.0)
        assert (a0, a1, a2) == (1.0, 0.0, 0.0)
        a0, a1, a2 = ConvertAttenuationModelFromDX5(0.0, 1.0, 0.0, 50.0)
        assert a0 == pytest.approx(1.0) and a1 > 0.0

    def test_find_driver_problems_and_null_caps(self, tmp_path):
        from ckrenderengine_tpu.raster.hal import (CKRasterizer,
                                                   InitNULLRasterizerCaps)
        ini = tmp_path / "cards.ini"
        ini.write_text("[buggy-gpu]\nMaxTextureWidth = 256\n"
                       "Version = 6.14\n")
        rst = CKRasterizer()
        rst.Start(None)
        rst.LoadVideoCardFile(str(ini))
        p = rst.FindDriverProblems(renderer="some buggy-gpu card",
                                   version="6.14.10")
        assert p is not None and p.real_max_texture_width == 256
        assert rst.FindDriverProblems(renderer="fine-gpu") is None
        caps = InitNULLRasterizerCaps()
        assert caps.max_texture_width > 0

    def test_allocate_objects_hook(self):
        from ckrenderengine_tpu.raster.hal import (CKRST_OBJ_TEXTURE,
                                                   CKRasterizer)
        rst = CKRasterizer()
        rst.Start(None)
        dev = rst.GetDriver(0).CreateContext()
        for _ in range(5):
            rst.CreateObjectIndex(CKRST_OBJ_TEXTURE)
        assert getattr(dev, "_object_capacity", 0) >= 5


class TestMeshGroups:
    def test_group_management(self):
        ctx, rc, cam = _ctx()
        obj, mesh, mat = _tri(ctx)
        m2 = CKMaterial(ctx, "m2")
        slot = mesh.CreateNewMaterialGroup(m2)
        assert mesh.GetMaterial(slot) is m2
        mesh.SetFaceMaterial(0, m2)
        assert mesh.DeleteRenderGroup(slot)
        assert mesh.GetFaceMaterial(0) is mat
        m3 = CKMaterial(ctx, "m3")
        mesh.SetFaceCount(2)
        mesh.SetFaces(np.array([[0, 1, 2], [0, 1, 2]], np.int32))
        mesh.SetFaceMaterial(1, m3)
        mesh.ResetMaterialGroup()
        assert mesh.GetMaterialCount() == 1
        assert mesh.GetFaceMaterial(1) is mat
        mesh.DeleteVBuffer()
        assert mesh.GetRenderGroups()

    def test_generic_funcs(self):
        from ckrenderengine_tpu.objects.mesh import (
            BuildFaceNormalsGenericFunc, BuildNormalsGenericFunc,
            NormalizeGenericFunc, RayIntersectionGenericFunc)
        ctx, rc, cam = _ctx()
        obj, mesh, mat = _tri(ctx)
        BuildNormalsGenericFunc(mesh)
        assert np.isfinite(mesh.normals).all()
        BuildFaceNormalsGenericFunc(mesh)
        v = NormalizeGenericFunc([[3.0, 0, 0], [0, 0, 0]])
        np.testing.assert_allclose(v[0], [1, 0, 0])
        hit = RayIntersectionGenericFunc((0, 0, -5), (0, 0, 1), obj)
        assert hit is not None
