"""Class registry + dependency-aware copy (reference src/CK2_3D.cpp:146-175
class registration; CK2 SDK Copy/GetDependencies/RemapDependencies)."""
import numpy as np

from ckrenderengine_tpu.objects import (
    CK3dObject, CKCamera, CKContext, CKGetClassIdByName, CKGetClassName,
    CKGetParentClassID, CKIsChildClassOf, CKLight, CKMaterial, CKMesh,
    CKTargetCamera, CKTexture, FULL_COPY_DEPENDENCIES,
)
from ckrenderengine_tpu.objects import base as B
from ckrenderengine_tpu.objects.classreg import class_table


def _ctx():
    ctx = CKContext()
    rm = ctx.GetRenderManager()
    rc = rm.CreateRenderContext(64, 64)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0, 0, -5))
    rc.AttachViewpointToCamera(cam)
    return ctx, rc, cam


def _tri(ctx, name="obj"):
    mesh = CKMesh(ctx, name + "_mesh")
    mesh.SetPositions(np.array([[-1, -1, 0], [0, 1.5, 0], [1, -1, 0]],
                               np.float32))
    mesh.SetFaces(np.array([[0, 1, 2]], np.int32))
    mesh.BuildNormals()
    mat = CKMaterial(ctx, name + "_mat")
    mat.SetDiffuse((1, 0, 0, 1))
    mesh.ApplyGlobalMaterial(mat)
    obj = CK3dObject(ctx, name)
    obj.SetCurrentMesh(mesh)
    return obj, mesh, mat


class TestRegistry:
    def test_table_covers_the_registered_classes(self):
        # the reference registers 27 render classes + the base; every class
        # the package exposes must be in the table
        assert len(class_table()) >= 27

    def test_class_names_and_lookup(self):
        assert CKGetClassName(B.CKCID_MESH) == "Mesh"
        assert CKGetClassName(B.CKCID_TARGETCAMERA) == "Target Camera"
        assert CKGetClassIdByName("Material") == B.CKCID_MATERIAL
        assert CKGetClassName(9999) == ""

    def test_hierarchy(self):
        assert CKGetParentClassID(B.CKCID_TARGETCAMERA) == B.CKCID_CAMERA
        assert CKIsChildClassOf(B.CKCID_TARGETCAMERA, B.CKCID_3DENTITY)
        assert CKIsChildClassOf(B.CKCID_SPRITETEXT, B.CKCID_2DENTITY)
        assert CKIsChildClassOf(B.CKCID_BODYPART, B.CKCID_3DENTITY)
        assert not CKIsChildClassOf(B.CKCID_CAMERA, B.CKCID_LIGHT)
        assert CKIsChildClassOf(B.CKCID_MESH, B.CKCID_MESH)

    def test_instance_class_queries(self):
        ctx = CKContext()
        cam = CKTargetCamera(ctx, "tc")
        assert cam.GetClassName() == "Target Camera"
        assert cam.IsChildClassOf(B.CKCID_CAMERA)
        light = CKLight(ctx, "l")
        assert not cam.IsChildClassOf(light)

    def test_create_by_class_id(self):
        ctx = CKContext()
        m = ctx.CreateObjectByClassID(B.CKCID_MESH, "m")
        assert isinstance(m, CKMesh)
        c = ctx.CreateObject(B.CKCID_CAMERA, "c")
        assert isinstance(c, CKCamera)
        try:
            ctx.CreateObjectByClassID(12345)
            assert False
        except ValueError:
            pass


class TestDependencies:
    def test_direct_dependencies(self):
        ctx, rc, cam = _ctx()
        obj, mesh, mat = _tri(ctx)
        tex = CKTexture(ctx, "t")
        tex.SetImage(np.ones((4, 4, 4), np.float32))
        mat.SetTexture(tex)
        assert mesh in obj.GetDependencies()
        assert mat in mesh.GetDependencies()
        assert tex in mat.GetDependencies()

    def test_default_copy_shares_resources(self):
        ctx, rc, cam = _ctx()
        obj, mesh, mat = _tri(ctx)
        clone = obj.Copy()
        assert clone is not obj and clone.id != obj.id
        assert clone.GetCurrentMesh() is mesh          # shared by default
        np.testing.assert_allclose(clone.GetWorldMatrix(),
                                   obj.GetWorldMatrix())

    def test_full_copy_duplicates_resources(self):
        ctx, rc, cam = _ctx()
        obj, mesh, mat = _tri(ctx)
        tex = CKTexture(ctx, "t")
        tex.SetImage(np.ones((4, 4, 4), np.float32))
        mat.SetTexture(tex)
        clone = obj.Copy(FULL_COPY_DEPENDENCIES)
        cmesh = clone.GetCurrentMesh()
        assert cmesh is not mesh
        cmat = cmesh.GetMaterial(0)
        assert cmat is not mat
        assert cmat.GetTexture() is not tex
        np.testing.assert_allclose(cmesh.positions, mesh.positions)
        # editing the clone's mesh must not touch the original
        cmesh.TranslateVertices((5, 0, 0))
        assert not np.allclose(cmesh.positions, mesh.positions)

    def test_subtree_copy_preserves_parent_and_clones_children(self):
        ctx, rc, cam = _ctx()
        root, _, _ = _tri(ctx, "root")
        child, _, _ = _tri(ctx, "child")
        gchild, _, _ = _tri(ctx, "gchild")
        base = CK3dObject(ctx, "base")
        root.SetParent(base)
        child.SetParent(root)
        gchild.SetParent(child)
        child.SetPosition((1, 2, 3), ref=root)
        clone = root.Copy()
        assert clone.GetParent() is base               # original parent kept
        assert clone.GetChildrenCount() == 1
        cchild = clone.GetChild(0)
        assert cchild is not child
        assert cchild.GetChildrenCount() == 1
        np.testing.assert_allclose(cchild.GetLocalMatrix(),
                                   child.GetLocalMatrix())

    def test_copied_entity_renders_identically(self):
        ctx, rc, cam = _ctx()
        obj, mesh, mat = _tri(ctx)
        rc.Render()
        fb0 = rc.framebuffer().copy()
        clone = obj.Copy()
        obj.Show(False)
        rc.Render()
        np.testing.assert_allclose(rc.framebuffer(), fb0, atol=1e-5)
        clone.Show(False)
        rc.Render()
        assert np.abs(rc.framebuffer() - fb0).sum() > 1.0   # now empty

    def test_character_copy_remaps_skin_bones(self):
        from ckrenderengine_tpu.anim import CKBodyPart, CKCharacter
        ctx, rc, cam = _ctx()
        char = CKCharacter(ctx, "char")
        bone = CKBodyPart(ctx, "bone")
        char.AddBodyPart(bone)
        skinned, mesh, mat = _tri(ctx, "skinned")
        skinned.SetParent(char)
        skin = skinned.CreateSkin()
        skin.SetObjectInitMatrix(np.eye(4, dtype=np.float32))
        skin.SetBoneCount(1)
        skin.bones[0].SetBone(bone)
        skin.bones[0].SetBoneInitialInverseMatrix(np.eye(4, dtype=np.float32))
        skin.SetRestPose(mesh.positions.copy(), mesh.normals.copy())
        for v in range(3):
            skin.SetVertexWeights(v, [0], [1.0])
        cchar = char.Copy()
        assert len(cchar.body_parts) == 1
        cbone = cchar.body_parts[0]
        assert cbone is not bone
        cskinned = [c for c in cchar._children if c.skin is not None]
        assert cskinned, "skinned child not cloned"
        assert cskinned[0].skin.bones[0].entity is cbone
