"""User vertex-shader hook: a traced JAX function fused into the frame
program (the TPU-native analogue of the reference's vertex shaders,
CKDX9RasterizerContext.cpp:1445-1553)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ckrenderengine_tpu.objects import (
    CK3dObject, CKCamera, CKContext, CKMaterial, CKMesh,
)


def _scene(ctx):
    mesh = CKMesh(ctx, "q")
    mesh.SetPositions(np.array(
        [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32))
    mesh.SetFaces(np.array([[0, 2, 1], [0, 3, 2]], np.int32))
    mesh.BuildNormals()
    mat = CKMaterial(ctx, "m")
    mat.SetEmissive((1, 0, 0, 1))
    mat.SetTwoSided(True)
    mesh.ApplyGlobalMaterial(mat)
    obj = CK3dObject(ctx, "o")
    obj.SetCurrentMesh(mesh)
    rm = ctx.GetRenderManager()
    rc = rm.CreateRenderContext(64, 64)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0, 0, -4))
    rc.AttachViewpointToCamera(cam)
    return rc


def test_vertex_shader_displaces_geometry():
    ctx = CKContext()
    rc = _scene(ctx)
    rc.Render()
    base = rc.framebuffer().copy()
    assert base[32, 32, 0] > 0.9          # quad covers the center

    def shift_right(posw, nrmw, scene):
        return posw + jnp.array([1.5, 0.0, 0.0]), nrmw

    rc.SetVertexShader(shift_right)
    rc.Render()
    moved = rc.framebuffer()
    assert moved[32, 32].sum() == 0       # center now empty
    assert moved[32, 60, 0] > 0.9         # quad shifted right

    rc.SetVertexShader(None)
    rc.Render()
    np.testing.assert_allclose(rc.framebuffer(), base, atol=1e-5)
