"""Framebuffer band sharding (parallel/tile_shard.py): one context's frame
split into horizontal bands over a device mesh must match the single-device
render — the SURVEY §5 "framebuffer tiles of one context span chips" axis."""

import numpy as np

from ckrenderengine_tpu.objects import (
    CKContext, CK3dObject, CKCamera, CKLight, CKMaterial, CKMesh, CKTexture,
)
from ckrenderengine_tpu.raster.types import VXLIGHT


def _scene(width=64, height=64):
    ctx = CKContext()
    rc = ctx.GetRenderManager().CreateRenderContext(width, height)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0.0, 1.0, -5.0))
    rc.AttachViewpointToCamera(cam)
    rc.SetBackgroundColor((0.1, 0.15, 0.2, 1.0))
    rc.SetFogMode(3)
    rc.SetFogStart(2.0)
    rc.SetFogEnd(12.0)

    tex = CKTexture(ctx, "checker")
    img = (np.indices((8, 8)).sum(0) % 2).astype(np.float32)
    tex.SetImage(np.stack([img, img, img, np.ones_like(img)], -1))

    s = 0.8
    verts = np.array([[x, y, z] for x in (-s, s) for y in (-s, s)
                      for z in (-s, s)], np.float32)
    faces = np.array([
        [0, 2, 3], [0, 3, 1], [4, 5, 7], [4, 7, 6], [0, 1, 5], [0, 5, 4],
        [2, 6, 7], [2, 7, 3], [0, 4, 6], [0, 6, 2], [1, 3, 7], [1, 7, 5],
    ], np.int32)
    mesh = CKMesh(ctx, "cube")
    mesh.SetPositions(verts)
    mesh.SetFaces(faces)
    uv = (verts[:, :2] * 0.5 + 0.5).astype(np.float32)
    mesh.SetUVs(uv)
    mesh.BuildNormals()
    mat = CKMaterial(ctx, "m")
    mat.SetDiffuse((0.9, 0.5, 0.3, 1.0))
    mat.SetTexture(tex)
    mesh.ApplyGlobalMaterial(mat)
    cube = CK3dObject(ctx, "cube")
    cube.SetCurrentMesh(mesh)
    cube.Rotate((1, 1, 0), 0.6)

    # a transparent quad in front (exercises the ordered pass per band)
    tq = CKMesh(ctx, "tq")
    tq.SetPositions(np.array([[-1, -1, -1.5], [1, -1, -1.5], [1, 1, -1.5],
                              [-1, 1, -1.5]], np.float32))
    tq.SetFaces(np.array([[0, 2, 1], [0, 3, 2]], np.int32))
    tq.BuildNormals()
    tmat = CKMaterial(ctx, "tm")
    tmat.SetDiffuse((0.2, 0.9, 0.4, 0.5))
    tmat.EnableAlphaBlend(True)
    tq.ApplyGlobalMaterial(tmat)
    tobj = CK3dObject(ctx, "tq")
    tobj.SetCurrentMesh(tq)

    sun = CKLight(ctx, "sun")
    sun.SetType(int(VXLIGHT.DIREC))
    sun.SetOrientation((0.3, -1.0, 0.5))
    return ctx, rc, cube


class TestTileSharding:
    def test_banded_matches_single_device(self):
        ctx, rc, cube = _scene()
        rc.Render()
        ref = rc.framebuffer().copy()
        assert rc.SetTileSharding(8)
        assert rc.GetTileSharding() == 8
        rc.Render()
        banded = rc.framebuffer()
        # Since round 4 bands raster at GLOBAL pixel coordinates (the frame
        # program's row0 iota offset), so no edge coefficient re-rounds per
        # band: the residual is 1 ULP from XLA fusing/FMA-contracting the
        # band executable differently than the full-frame one — NOT from
        # band-edge coverage flips (which were 2e-3-class before).
        np.testing.assert_allclose(banded, ref, atol=2.5e-7, rtol=0)

    def test_banded_composes_with_antialias(self):
        """Antialias no longer silently degrades under band sharding: each
        band renders at 2x and box-resolves locally, matching the unbanded
        supersampled frame exactly."""
        ctx, rc, cube = _scene()
        rm = ctx.GetRenderManager()
        rm.SetRenderOptions("Antialias", 1)
        rc.Render()
        ref = rc.framebuffer().copy()
        assert rc.SetTileSharding(4)
        rc.Render()
        banded = rc.framebuffer()
        np.testing.assert_allclose(banded, ref, atol=2.5e-7, rtol=0)
        # AA is actually on: edge pixels carry fractional coverage vs 1x
        rm.SetRenderOptions("Antialias", 0)
        rc.Render()
        hard = rc.framebuffer()
        assert np.abs(hard - ref).max() > 0.05

    def test_banded_tracks_scene_changes(self):
        ctx, rc, cube = _scene()
        rc.SetTileSharding(4)
        rc.Render()
        fb0 = rc.framebuffer().copy()
        cube.Rotate((0, 1, 0), 0.8)
        rc.Render()
        fb1 = rc.framebuffer()
        assert np.abs(fb1 - fb0).sum() > 1.0

    def test_rejects_bad_band_counts(self):
        ctx, rc, cube = _scene(width=64, height=60)
        assert not rc.SetTileSharding(8)      # 60 % 8 != 0
        assert rc.SetTileSharding(0)          # disable always works

    def test_disable_restores_single_device(self):
        ctx, rc, cube = _scene()
        rc.SetTileSharding(8)
        rc.Render()
        rc.SetTileSharding(0)
        rc.Render()
        assert rc.GetTileSharding() == 0
