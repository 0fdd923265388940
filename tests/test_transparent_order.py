"""Transparent ordering: back-to-front depth sort, render-priority bands,
context-level SetClipRect (reference SortTransparentObjects semantics)."""

import numpy as np
import pytest

from ckrenderengine_tpu.objects import (
    CK3dObject, CKCamera, CKContext, CKMaterial, CKMesh,
)
from ckrenderengine_tpu.raster.types import VXBLEND


def _tquad(ctx, name, z, rgba, priority=0):
    mesh = CKMesh(ctx, f"{name}m")
    mesh.SetPositions(np.array(
        [[-1, -1, z], [1, -1, z], [1, 1, z], [-1, 1, z]], np.float32))
    mesh.SetFaces(np.array([[0, 2, 1], [0, 3, 2]], np.int32))
    mesh.BuildNormals()
    mat = CKMaterial(ctx, f"{name}mat")
    mat.SetEmissive((rgba[0], rgba[1], rgba[2], 1.0))
    mat.SetDiffuse((0, 0, 0, rgba[3]))   # vertex alpha = diffuse alpha
    mat.SetTwoSided(True)
    mat.EnableAlphaBlend(True)
    mat.SetSourceBlend(int(VXBLEND.SRCALPHA))
    mat.SetDestBlend(int(VXBLEND.INVSRCALPHA))
    mat.EnableZWrite(False)
    mesh.ApplyGlobalMaterial(mat)
    obj = CK3dObject(ctx, name)
    obj.SetCurrentMesh(mesh)
    obj.SetRenderPriority(priority)
    return obj, mat


def _rc(ctx):
    rm = ctx.GetRenderManager()
    rc = rm.CreateRenderContext(64, 64)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0, 0, -5))
    rc.AttachViewpointToCamera(cam)
    return rc


class TestTransparentOrder:
    def test_back_to_front_blending(self):
        ctx = CKContext()
        rc = _rc(ctx)
        # red far (alpha .5), blue near (alpha .5): near blends over far
        _tquad(ctx, "far", 1.0, (1, 0, 0, 0.5))
        _tquad(ctx, "near", -1.0, (0, 0, 1, 0.5))
        rc.Render()
        px = rc.framebuffer()[32, 32]
        # far first: bg*0.5 + red*0.5 = 0.5 red; then blue over: red 0.25, blue 0.5
        assert px[2] > px[0] > 0.1

    def test_priority_band_overrides_depth(self):
        ctx = CKContext()
        rc = _rc(ctx)
        # NEAR quad gets HIGHER priority -> renders FIRST (under), so the
        # far quad blends on top of it despite being behind in depth.
        _tquad(ctx, "far", 1.0, (1, 0, 0, 1.0), priority=0)
        _tquad(ctx, "near", -1.0, (0, 0, 1, 1.0), priority=5)
        rc.Render()
        px = rc.framebuffer()[32, 32]
        assert px[0] > 0.9 and px[2] < 0.1   # far red drew last (on top)

    def test_context_clip_rect(self):
        ctx = CKContext()
        rc = _rc(ctx)
        _tquad(ctx, "q", 0.0, (1, 1, 0, 1))
        rc.SetClipRect((0, 0, 32, 64))
        rc.Render()
        fb = rc.framebuffer()
        assert fb[32, 10, 0] > 0.9           # left half drawn
        assert fb[32, 50].sum() == 0         # right half clipped
        rc.SetClipRect(None)
        rc.Render()
        assert rc.framebuffer()[32, 50, 0] > 0.9


def test_two_sided_alpha_back_faces_blend_first():
    """Two-sided alpha-transparent surfaces: the reference draws back faces
    in a CW-cull prepass before front faces (RCKMesh::RenderGroup,
    src/CKMesh.cpp:4301-4313, per-object sort granularity). Here the
    per-TRIANGLE back-to-front device sort makes that ordering implicit —
    both layers of one mesh blend back-to-front."""
    import jax  # noqa: F401  (conftest forces CPU)
    from ckrenderengine_tpu.objects import (
        CK3dObject, CKCamera, CKContext, CKMaterial, CKMesh)
    from ckrenderengine_tpu.raster.types import VXBLEND

    ctx = CKContext()
    mesh = CKMesh(ctx, "m")
    mesh.SetPositions(np.array(
        [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0],
         [-1, -1, 2], [1, -1, 2], [1, 1, 2], [-1, 1, 2]], np.float32))
    mesh.SetFaces(np.array([[0, 2, 1], [0, 3, 2],
                            [4, 5, 6], [4, 6, 7]], np.int32))
    mesh.BuildNormals()
    mat = CKMaterial(ctx, "glass")
    mat.SetDiffuse((0.8, 0.1, 0.1, 0.5))
    mat.SetEmissive((0.8, 0.1, 0.1, 1))
    mat.SetTwoSided(True)
    mat.SetSourceBlend(int(VXBLEND.SRCALPHA))
    mat.SetDestBlend(int(VXBLEND.INVSRCALPHA))
    for name in ("SetAlphaBlendEnabled", "EnableAlphaBlend"):
        if hasattr(mat, name):
            getattr(mat, name)(True)
            break
    mesh.ApplyGlobalMaterial(mat)
    obj = CK3dObject(ctx, "o")
    obj.SetCurrentMesh(mesh)
    rc = ctx.GetRenderManager().CreateRenderContext(32, 32)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0, 0, -4))
    rc.AttachViewpointToCamera(cam)
    rc.SetBackgroundColor((0, 0, 0, 1))
    rc.Render()
    c = np.asarray(rc.framebuffer())[16, 16]
    # two 0.5-alpha red layers over black: back 0.4, then front 0.6
    assert abs(c[0] - 0.6) < 0.05, c
