"""Antialias option -> ordered 2x2 supersample + box resolve.

The reference wires the Antialias option into the device's multisample
setup (/root/reference/src/CKRenderManager.cpp:117-118,668 ->
CKDX9RasterizerContext.cpp:469-491). The TPU mapping renders at 2x and
box-resolves; flipping the option must change edge pixels to intermediate
coverage values while interior/background pixels stay identical."""

import numpy as np

from ckrenderengine_tpu.objects import (
    CK3dObject, CKCamera, CKContext, CKMaterial, CKMesh,
)


def _build(aa: int):
    ctx = CKContext()
    rm = ctx.GetRenderManager()
    rm.SetRenderOptions("Antialias", aa)
    rc = rm.CreateRenderContext(64, 64)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0.0, 0.0, -1.6))
    rc.AttachViewpointToCamera(cam)
    rc.SetBackgroundColor((0.0, 0.0, 0.0, 1.0))

    mesh = CKMesh(ctx, "trimesh")
    mesh.SetPositions(np.array([[-1.0, -0.8, 0.0], [1.1, -0.5, 0.0],
                                [0.2, 1.0, 0.0]], np.float32))
    mesh.SetFaces(np.array([[0, 2, 1]], np.int32))
    mesh.BuildNormals()
    mat = CKMaterial(ctx, "m")
    mat.SetEmissive((1.0, 1.0, 1.0, 1.0))
    mat.SetDiffuse((0.0, 0.0, 0.0, 1.0))
    mesh.ApplyGlobalMaterial(mat)
    obj = CK3dObject(ctx, "tri")
    obj.SetCurrentMesh(mesh)
    rc.Render()
    return np.asarray(rc.framebuffer())


def test_antialias_flips_output_with_edge_coverage():
    hard = _build(0)
    soft = _build(1)
    assert hard.shape == soft.shape
    r_hard, r_soft = hard[..., 0], soft[..., 0]
    # The option must change the image...
    assert not np.array_equal(r_hard, r_soft)
    # ...with genuinely fractional edge coverage only in the AA image
    # (the flat emissive triangle renders pure fg/bg without AA).
    def frac(img):
        return np.sum((img > 0.05) & (img < 0.95))
    assert frac(r_hard) == 0
    assert frac(r_soft) > 10
    # Interior and far-background agree between the two renders.
    interior = (r_hard > 0.95) & (r_soft > 0.95)
    background = (r_hard < 0.05) & (r_soft < 0.05)
    assert interior.sum() > 1000
    assert background.sum() > 100


def test_antialias_zbuffer_shape_and_range():
    ctx = CKContext()
    rm = ctx.GetRenderManager()
    rm.SetRenderOptions("Antialias", 1)
    rc = rm.CreateRenderContext(32, 32)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0.0, 0.0, -3.0))
    rc.AttachViewpointToCamera(cam)
    rc.Render()
    zb = np.asarray(rc.zb)
    assert zb.shape == (32, 32)
    assert np.all(zb <= 1.0) and np.all(zb >= 0.0)


def test_antialias_in_batched_contexts():
    """ProcessBatched must carry the supersample factor through the vmapped
    packed program (ss is part of the batch-compat key)."""
    ctx = CKContext()
    rm = ctx.GetRenderManager()
    rm.SetRenderOptions("Antialias", 1)
    mesh = CKMesh(ctx, "m")
    mesh.SetPositions(np.array([[-1.0, -0.8, 0.0], [1.1, -0.5, 0.0],
                                [0.2, 1.0, 0.0]], np.float32))
    mesh.SetFaces(np.array([[0, 2, 1]], np.int32))
    mesh.BuildNormals()
    mat = CKMaterial(ctx, "mm")
    mat.SetEmissive((1.0, 1.0, 1.0, 1.0))
    mesh.ApplyGlobalMaterial(mat)
    obj = CK3dObject(ctx, "o")
    obj.SetCurrentMesh(mesh)
    rcs = []
    for k in range(2):
        rc = rm.CreateRenderContext(32, 32)
        cam = CKCamera(ctx, f"c{k}")
        cam.SetPosition((0.0, 0.0, -2.0 - k))
        rc.AttachViewpointToCamera(cam)
        rcs.append(rc)
    rm.ProcessBatched()
    for rc in rcs:
        fb = np.asarray(rc.fb)
        assert fb.shape == (4, 32, 32)
        assert np.isfinite(fb).all()
    # different camera distances -> different images, both with coverage
    a = np.asarray(rcs[0].fb)[0]
    b = np.asarray(rcs[1].fb)[0]
    assert (a > 0.5).sum() > 10 and (b > 0.5).sum() > 10
    assert not np.array_equal(a, b)
