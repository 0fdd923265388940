"""API-sequence fuzz: random but seeded sequences of public object-model
calls interleaved with Render() must never crash, segfault, or produce
non-finite frames — even when the calls leave the scene in odd-but-legal
states (meshes resized under existing faces, materials/effects flipped
mid-frame, entities destroyed while referenced). Motivated by a real
out-of-bounds native write found when positions were truncated under live
faces (see utils/geometry.py Optimize nv clamp)."""

import numpy as np
import pytest

from ckrenderengine_tpu.objects import (
    CK3dObject, CKCamera, CKContext, CKLight, CKMaterial, CKMesh, CKTexture,
)


def _rand_mesh(ctx, rng, name):
    nv = int(rng.integers(3, 40))
    nf = int(rng.integers(1, 60))
    mesh = CKMesh(ctx, name)
    mesh.SetPositions(rng.uniform(-2, 2, (nv, 3)).astype(np.float32))
    mesh.SetFaces(rng.integers(0, nv, (nf, 3)).astype(np.int32))
    mesh.BuildNormals()
    return mesh


@pytest.mark.parametrize("seed", [0, 1])
def test_random_api_sequences_never_crash(seed):
    rng = np.random.default_rng(seed)
    ctx = CKContext()
    rm = ctx.GetRenderManager()
    rc = rm.CreateRenderContext(48, 48)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0, 0, -5))
    rc.AttachViewpointToCamera(cam)
    CKLight(ctx, "sun").SetType(3)

    mats = [CKMaterial(ctx, f"m{i}") for i in range(3)]
    texs = []
    objs = []

    def op_create(_):
        mesh = _rand_mesh(ctx, rng, f"mesh{len(objs)}")
        mesh.ApplyGlobalMaterial(mats[int(rng.integers(0, 3))])
        o = CK3dObject(ctx, f"o{len(objs)}")
        o.SetCurrentMesh(mesh)
        o.SetPosition(rng.uniform(-3, 3, 3))
        objs.append(o)

    def op_destroy(_):
        if objs:
            ctx.DestroyObject(objs.pop(int(rng.integers(0, len(objs)))))

    def op_move(_):
        if objs:
            o = objs[int(rng.integers(0, len(objs)))]
            o.SetPosition(rng.uniform(-3, 3, 3))
            o.Rotate(rng.uniform(-1, 1, 3) + 1e-3, float(rng.uniform(-2, 2)))

    def op_resize_mesh(_):
        if objs:
            m = objs[int(rng.integers(0, len(objs)))].GetCurrentMesh()
            if m is not None:
                # grow or shrink positions UNDER the existing faces
                m.SetVertexCount(int(rng.integers(3, 50)))

    def op_material(_):
        mat = mats[int(rng.integers(0, 3))]
        mat.SetDiffuse(rng.uniform(0, 1, 4))
        mat.SetTwoSided(bool(rng.integers(0, 2)))
        mat.SetEffect(int(rng.integers(0, 7)))

    def op_texture(_):
        mat = mats[int(rng.integers(0, 3))]
        if not texs or rng.random() < 0.3:
            t = CKTexture(ctx, f"t{len(texs)}")
            size = int(rng.choice([4, 8, 16]))
            t.SetImage(rng.uniform(0, 1, (size, size, 4)).astype(np.float32))
            texs.append(t)
        mat.SetTexture(texs[int(rng.integers(0, len(texs)))],
                       int(rng.integers(0, 3)))

    def op_weights(_):
        if objs:
            m = objs[int(rng.integers(0, len(objs)))].GetCurrentMesh()
            if m is not None and m.GetVertexCount() > 0:
                m.SetVertexWeight(
                    int(rng.integers(0, m.GetVertexCount())),
                    float(rng.uniform(0, 10)))

    def op_copy(_):
        # dependency-aware copy: shared by default, sometimes full
        if objs:
            src = objs[int(rng.integers(0, len(objs)))]
            if rng.random() < 0.4:
                from ckrenderengine_tpu.objects import FULL_COPY_DEPENDENCIES
                objs.append(src.Copy(FULL_COPY_DEPENDENCIES))
            else:
                objs.append(src.Copy())

    def op_parent_and_copy_subtree(_):
        if len(objs) >= 2:
            a, b = (objs[int(rng.integers(0, len(objs)))] for _ in range(2))
            if a is not b and not any(
                    p is b for p in _ancestors(a)):
                try:
                    b.SetParent(a)
                except ValueError:
                    pass

    def _ancestors(e):
        p = e.GetParent()
        while p is not None:
            yield p
            p = p.GetParent()

    def op_check_pre_deletion(_):
        if objs:
            o = objs[int(rng.integers(0, len(objs)))]
            m = o.GetCurrentMesh()
            if m is not None and rng.random() < 0.3:
                m._to_be_deleted = True
                o.CheckPreDeletion()
                m._to_be_deleted = False

    ops = [op_create, op_create, op_move, op_move, op_destroy,
           op_resize_mesh, op_material, op_texture, op_weights,
           op_copy, op_parent_and_copy_subtree, op_check_pre_deletion]
    for step in range(28):
        ops[int(rng.integers(0, len(ops)))](None)
        if step % 4 == 3:
            rc.Render()
            fb = np.asarray(rc.framebuffer())
            assert np.isfinite(fb).all(), f"non-finite frame at step {step}"
    rc.Render()
    assert np.isfinite(np.asarray(rc.framebuffer())).all()
