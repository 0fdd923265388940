"""Fog projection modes 0/1/2 (reference g_FogProjectionMode,
/root/reference/src/CKRenderedScene.cpp:405-425): mode 0 fogs view-space z,
modes 1/2 fog projected depth against start/end values pushed through the
projection matrix. Golden tests compute the expected factor analytically."""

import numpy as np

from ckrenderengine_tpu.objects import (
    CK3dObject, CKCamera, CKContext, CKMaterial, CKMesh,
)
from ckrenderengine_tpu.raster.types import VXFOG


def _scene(size=64):
    ctx = CKContext()
    rc = ctx.GetRenderManager().CreateRenderContext(size, size)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0.0, 0.0, -5.0))
    cam.SetFrontPlane(1.0)
    cam.SetBackPlane(40.0)
    rc.AttachViewpointToCamera(cam)
    mesh = CKMesh(ctx, "quad")
    s = 3.0
    mesh.SetPositions(np.array(
        [[-s, -s, 0], [s, -s, 0], [s, s, 0], [-s, s, 0]], np.float32))
    mesh.SetFaces(np.array([[0, 2, 1], [0, 3, 2]], np.int32))
    mesh.BuildNormals()
    mat = CKMaterial(ctx, "m")
    mat.SetEmissive((1.0, 1.0, 1.0, 1.0))
    mat.EnableFog(True) if hasattr(mat, "EnableFog") else None
    mesh.ApplyGlobalMaterial(mat)
    obj = CK3dObject(ctx, "q")
    obj.SetCurrentMesh(mesh)
    rc.SetBackgroundColor((0, 0, 0, 1))
    rc.SetFogMode(int(VXFOG.LINEAR))
    rc.SetFogStart(2.0)
    rc.SetFogEnd(20.0)
    rc.SetFogColor((0.0, 0.0, 0.0))
    return ctx, rc


def _center(rc):
    fb = rc.framebuffer()
    h, w = fb.shape[:2]
    return fb[h // 2, w // 2, 0]     # white quad * f -> red channel == f


def _proj_terms(rc, dist):
    scene = rc._build_scene_device()
    p = np.asarray(scene.proj)
    z = p[2, 2] * dist + p[3, 2]
    w = p[2, 3] * dist + p[3, 3]
    return z, w


class TestFogProjectionModes:
    def test_mode0_view_z_baseline(self):
        ctx, rc = _scene()
        rc.Render()
        f = (20.0 - 5.0) / (20.0 - 2.0)     # view z of the quad is 5
        np.testing.assert_allclose(_center(rc), f, atol=5e-3)

    def test_mode1_projected_depth(self):
        ctx, rc = _scene()
        rm = ctx.GetRenderManager()
        rm.SetRenderOptions("FogProjectionMode", 1)
        try:
            rc.Render()
            sz, sw = _proj_terms(rc, 2.0)
            ez, ew = _proj_terms(rc, 20.0)
            qz, qw = _proj_terms(rc, 5.0)
            start, end, d = sz / sw, ez / ew, qz / qw
            f = np.clip((end - d) / (end - start), 0.0, 1.0)
            np.testing.assert_allclose(_center(rc), f, atol=5e-3)
            assert abs(f - 15.0 / 18.0) > 0.05   # visibly different vs mode0
        finally:
            rm.SetRenderOptions("FogProjectionMode", 0)

    def test_mode2_reference_pair(self):
        ctx, rc = _scene()
        rm = ctx.GetRenderManager()
        rm.SetRenderOptions("FogProjectionMode", 2)
        try:
            rc.Render()
            sz, sw = _proj_terms(rc, 2.0)
            qz, qw = _proj_terms(rc, 5.0)
            start = 1.0 / sw
            end = sz / sw
            d = max(qz / qw, 0.0)
            f = np.clip((end - d) / max(end - start, 1e-12), 0.0, 1.0)
            np.testing.assert_allclose(_center(rc), f, atol=5e-3)
        finally:
            rm.SetRenderOptions("FogProjectionMode", 0)

    def test_mode_switch_no_recompile_needed(self):
        """The projection mode is dynamic state — flipping it between frames
        changes pixels without a topology recompile."""
        ctx, rc = _scene()
        rm = ctx.GetRenderManager()
        rc.Render()
        a = float(_center(rc))
        rm.SetRenderOptions("FogProjectionMode", 1)
        try:
            rc.Render()
            b = float(_center(rc))
        finally:
            rm.SetRenderOptions("FogProjectionMode", 0)
        assert abs(a - b) > 0.02
