"""Cube-environment mapping: 6 faces baked into an octahedral map sampled
via world-space reflection TexGen (effect 4)."""

import numpy as np
import pytest

from ckrenderengine_tpu.objects import (
    CK3dObject, CKCamera, CKContext, CKMaterial, CKMesh, CKTexture,
)

FACE_COLORS = {
    0: (1, 0, 0), 1: (0, 1, 0), 2: (0, 0, 1),
    3: (1, 1, 0), 4: (1, 0, 1), 5: (0, 1, 1),
}


def _faces(s=16):
    faces = []
    for fi in range(6):
        img = np.zeros((s, s, 4), np.float32)
        img[..., :3] = FACE_COLORS[fi]
        img[..., 3] = 1.0
        faces.append(img)
    return faces


class TestOctBake:
    def test_principal_directions_hit_their_faces(self):
        ctx = CKContext()
        tex = CKTexture(ctx, "env")
        tex.SetCubeMapFaces(_faces(), size=64)
        img = tex.current_image()
        assert img.shape == (64, 64, 4)

        def sample_dir(d):
            d = np.asarray(d, np.float32)
            p = d / np.abs(d).sum()
            if p[2] < 0:
                x = (1 - abs(p[1])) * np.sign(p[0])
                y = (1 - abs(p[0])) * np.sign(p[1])
                p = np.array([x, y, p[2]])
            u = int(np.clip((p[0] * 0.5 + 0.5) * 64, 0, 63))
            v = int(np.clip((p[1] * 0.5 + 0.5) * 64, 0, 63))
            return img[v, u, :3]

        np.testing.assert_allclose(sample_dir((1, 0, 0)), FACE_COLORS[0])
        np.testing.assert_allclose(sample_dir((-1, 0, 0)), FACE_COLORS[1])
        np.testing.assert_allclose(sample_dir((0, 1, 0)), FACE_COLORS[2])
        np.testing.assert_allclose(sample_dir((0, -1, 0)), FACE_COLORS[3])
        np.testing.assert_allclose(sample_dir((0, 0, 1)), FACE_COLORS[4])


class TestCubeTexGen:
    def test_mirror_quad_reflects_plus_x_face(self):
        # Quad tilted 45 deg about y: camera rays reflect toward +x, so every
        # vertex's octahedral UV lands in one quadrant (per-vertex oct UVs
        # cannot interpolate across the -z fold — curved mirrors cluster
        # per-quadrant in practice, documented limitation).
        ctx = CKContext()
        mesh = CKMesh(ctx, "q")
        s = 0.7
        mesh.SetPositions(np.array(
            [[-s, -1, -s], [s, -1, s], [s, 1, s], [-s, 1, -s]], np.float32))
        mesh.SetFaces(np.array([[0, 2, 1], [0, 3, 2]], np.int32))
        mesh.SetUVs(np.zeros((4, 2), np.float32))
        mesh.BuildNormals()
        tex = CKTexture(ctx, "env")
        tex.SetCubeMapFaces(_faces(), size=64)
        mat = CKMaterial(ctx, "mirror")
        mat.SetEmissive((1, 1, 1, 1))
        mat.SetTexture(tex)
        from ckrenderengine_tpu.objects.material import VXEFFECT_TEXGEN
        from ckrenderengine_tpu.raster.types import TEXGEN_CUBE
        mat.SetEffect(VXEFFECT_TEXGEN)             # cube-env TexGen
        mat.SetEffectParameter(texgen=TEXGEN_CUBE)
        mat.SetTwoSided(True)
        mesh.ApplyGlobalMaterial(mat)
        obj = CK3dObject(ctx, "o")
        obj.SetCurrentMesh(mesh)
        rm = ctx.GetRenderManager()
        rc = rm.CreateRenderContext(64, 64)
        cam = CKCamera(ctx, "cam")
        cam.SetPosition((0, 0, -4))
        rc.AttachViewpointToCamera(cam)
        rc.Render()
        px = rc.framebuffer()[32, 32, :3]
        # view dir +z reflects off the 45-deg mirror toward +x -> red
        np.testing.assert_allclose(px, FACE_COLORS[0], atol=0.15)


class TestSeamFree:
    def test_flat_mirror_facing_camera_crosses_the_fold(self):
        """A flat mirror facing the camera reflects every ray near -z —
        the octahedral atlas CORNERS. Per-vertex oct UVs would interpolate
        straight across the atlas (through the +z center color); the
        per-pixel reflection path (want_cube) must show only the -z face
        color everywhere."""
        ctx = CKContext()
        mesh = CKMesh(ctx, "q")
        mesh.SetPositions(np.array(
            [[-2, -2, 0], [2, -2, 0], [2, 2, 0], [-2, 2, 0]], np.float32))
        mesh.SetFaces(np.array([[0, 2, 1], [0, 3, 2]], np.int32))
        mesh.SetUVs(np.zeros((4, 2), np.float32))
        mesh.BuildNormals()
        tex = CKTexture(ctx, "env")
        tex.SetCubeMapFaces(_faces(), size=64)    # -z face = FACE_COLORS[5]
        mat = CKMaterial(ctx, "mirror")
        mat.SetEmissive((1, 1, 1, 1))
        mat.SetTexture(tex)
        from ckrenderengine_tpu.objects.material import VXEFFECT_TEXGEN
        from ckrenderengine_tpu.raster.types import TEXGEN_CUBE
        mat.SetEffect(VXEFFECT_TEXGEN)
        mat.SetEffectParameter(texgen=TEXGEN_CUBE)
        mat.SetTwoSided(True)
        mesh.ApplyGlobalMaterial(mat)
        obj = CK3dObject(ctx, "o")
        obj.SetCurrentMesh(mesh)
        rm = ctx.GetRenderManager()
        rc = rm.CreateRenderContext(64, 64)
        cam = CKCamera(ctx, "cam")
        cam.SetPosition((0, 0, -4))
        rc.AttachViewpointToCamera(cam)
        assert True  # compile gate below
        rc.Render()
        fb = rc.framebuffer()
        want = np.asarray(FACE_COLORS[5], np.float32)
        # every covered pixel reflects ~(0,0,-1): the whole quad must be
        # the -z color, not a smear across the atlas
        covered = fb[..., :3].sum(-1) > 0.05
        assert covered.mean() > 0.8
        err = np.abs(fb[..., :3] - want).sum(-1)
        assert (err[covered] < 0.3).mean() > 0.95
