"""End-to-end: object model -> scene compiler -> jitted frame -> pixels.

BASELINE config 1 (flat-shaded cube, one camera, 256x256) plus lighting,
texture, transparency-ordering, and fog checks. Semantics anchored to the
reference per-frame path (RCKRenderContext::Render,
/root/reference/src/CKRenderContext.cpp:767-930).
"""

import numpy as np
import pytest

from ckrenderengine_tpu.objects import (
    CKContext, CK3dObject, CKCamera, CKLight, CKMaterial, CKMesh, CKTexture,
)
from ckrenderengine_tpu.raster.types import VXBLEND, VXLIGHT


def make_cube(ctx, size=1.0):
    mesh = CKMesh(ctx, "cube")
    s = size * 0.5
    verts = np.array(
        [[x, y, z] for x in (-s, s) for y in (-s, s) for z in (-s, s)], np.float32)
    # 12 triangles, CW-front when viewed from outside (left-handed +Z into screen).
    faces = np.array([
        [0, 2, 3], [0, 3, 1],   # -x? (orientation fixed by normals build)
        [4, 5, 7], [4, 7, 6],
        [0, 1, 5], [0, 5, 4],
        [2, 6, 7], [2, 7, 3],
        [0, 4, 6], [0, 6, 2],
        [1, 3, 7], [1, 7, 5],
    ], np.int32)
    mesh.SetPositions(verts)
    mesh.SetFaces(faces)
    mesh.BuildNormals()
    return mesh


def setup_scene(width=128, height=128):
    ctx = CKContext()
    rm = ctx.GetRenderManager()
    rc = rm.CreateRenderContext(width, height)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0.0, 0.0, -3.0))
    cam.SetFrontPlane(0.1)
    cam.SetBackPlane(100.0)
    rc.AttachViewpointToCamera(cam)
    return ctx, rm, rc, cam


def test_flat_cube_renders():
    ctx, rm, rc, cam = setup_scene()
    cube = CK3dObject(ctx, "cube")
    mesh = make_cube(ctx)
    mat = CKMaterial(ctx, "red")
    mat.SetEmissive((1.0, 0.0, 0.0, 1.0))
    mat.SetDiffuse((0.0, 0.0, 0.0, 1.0))
    mat.SetAmbient((0.0, 0.0, 0.0, 1.0))
    mesh.ApplyGlobalMaterial(mat)
    cube.SetCurrentMesh(mesh)

    rc.SetBackgroundColor((0.0, 0.0, 1.0, 1.0))
    rc.Render()
    fb = rc.framebuffer()

    # Center shows the red cube, corner shows blue background.
    cx = fb[64, 64]
    corner = fb[2, 2]
    assert cx[0] > 0.9 and cx[2] < 0.1, f"center {cx}"
    assert corner[2] > 0.9 and corner[0] < 0.1, f"corner {corner}"
    # Depth buffer written under the cube, untouched in the corner.
    zb = rc.zbuffer()
    assert zb[64, 64] < 1.0
    assert zb[2, 2] == 1.0


def test_visibility_toggle():
    ctx, rm, rc, cam = setup_scene()
    cube = CK3dObject(ctx, "cube")
    mesh = make_cube(ctx)
    mat = CKMaterial(ctx, "white")
    mat.SetEmissive((1.0, 1.0, 1.0, 1.0))
    mesh.ApplyGlobalMaterial(mat)
    cube.SetCurrentMesh(mesh)
    rc.Render()
    assert rc.framebuffer()[64, 64, 0] > 0.9
    cube.Show(False)
    rc.Render()
    assert rc.framebuffer()[64, 64, 0] < 0.1
    cube.Show(True)
    rc.Render()
    assert rc.framebuffer()[64, 64, 0] > 0.9


def test_directional_lighting_shades_faces():
    ctx, rm, rc, cam = setup_scene()
    cube = CK3dObject(ctx, "cube")
    mesh = make_cube(ctx)
    mat = CKMaterial(ctx, "lit")
    mat.SetDiffuse((1.0, 1.0, 1.0, 1.0))
    mat.SetAmbient((0.0, 0.0, 0.0, 1.0))
    mesh.ApplyGlobalMaterial(mat)
    cube.SetCurrentMesh(mesh)
    rc.SetAmbientLight(0.0, 0.0, 0.0)

    light = CKLight(ctx, "sun")
    light.SetType(int(VXLIGHT.DIREC))
    light.SetColor((1.0, 1.0, 1.0, 1.0))
    # Direction = row 2 of world matrix; default identity => +Z (toward cube
    # front face which faces -Z toward camera) -> front face is unlit; aim the
    # light at the cube from the camera side instead.
    light.SetOrientation((0.0, 0.0, 1.0))
    rc.Render()
    lit_val = float(rc.framebuffer()[64, 64, 0])
    assert lit_val > 0.5, f"front face should be lit, got {lit_val}"

    # Rotate light to shine from behind: front face goes dark.
    light.SetOrientation((0.0, 0.0, -1.0))
    rc.Render()
    unlit_val = float(rc.framebuffer()[64, 64, 0])
    assert unlit_val < 0.1, f"front face should be dark, got {unlit_val}"


def test_point_light_attenuation():
    ctx, rm, rc, cam = setup_scene()
    cube = CK3dObject(ctx, "cube")
    mesh = make_cube(ctx)
    mat = CKMaterial(ctx, "lit")
    mat.SetDiffuse((1.0, 1.0, 1.0, 1.0))
    mat.SetAmbient((0.0, 0.0, 0.0, 1.0))
    mesh.ApplyGlobalMaterial(mat)
    cube.SetCurrentMesh(mesh)
    rc.SetAmbientLight(0.0, 0.0, 0.0)

    light = CKLight(ctx, "bulb")
    light.SetType(int(VXLIGHT.POINT))
    light.SetPosition((0.0, 0.0, -2.0))
    light.SetRange(100.0)
    near_val = None
    rc.Render()
    near_val = float(rc.framebuffer()[64, 64, 0])

    # Linear attenuation makes it dimmer.
    light.SetConstantAttenuation(0.0)
    light.SetLinearAttenuation(2.0)
    rc.Render()
    dim_val = float(rc.framebuffer()[64, 64, 0])
    assert dim_val < near_val, (near_val, dim_val)

    # Range cutoff kills it entirely.
    light.SetRange(0.5)
    rc.Render()
    cut_val = float(rc.framebuffer()[64, 64, 0])
    assert cut_val < 0.05, cut_val


def test_textured_quad():
    ctx, rm, rc, cam = setup_scene()
    quad = CK3dObject(ctx, "quad")
    mesh = CKMesh(ctx, "quadmesh")
    mesh.SetPositions(np.array(
        [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], np.float32))
    mesh.SetFaces(np.array([[0, 2, 1], [0, 3, 2]], np.int32))
    mesh.SetUVs(np.array([[0, 1], [1, 1], [1, 0], [0, 0]], np.float32))
    mesh.SetLitMode(True)  # prelit: colors stay white, texture shows raw
    mesh.BuildNormals()

    tex = CKTexture(ctx, "checker")
    img = np.zeros((8, 8, 4), np.float32)
    img[:4, :4] = (1, 0, 0, 1)   # top-left red
    img[:4, 4:] = (0, 1, 0, 1)   # top-right green
    img[4:, :4] = (0, 0, 1, 1)
    img[4:, 4:] = (1, 1, 0, 1)
    tex.SetImage(img)

    mat = CKMaterial(ctx, "texmat")
    mat.SetTexture(tex)
    mesh.ApplyGlobalMaterial(mat)
    quad.SetCurrentMesh(mesh)

    rc.Render()
    fb = rc.framebuffer()
    # Quad spans most of the view; UV (0,0) top-left maps texture rows directly.
    # Sample quadrant centers of the projected quad (it covers roughly the
    # middle ~70% of the framebuffer at z=0 from cam z=-3, fov~0.5horiz).
    c_tl = fb[40, 40]   # up-left on screen -> v<0.5,u<0.5 -> red
    c_tr = fb[40, 88]
    c_bl = fb[88, 40]
    c_br = fb[88, 88]
    assert c_tl[0] > 0.6 and c_tl[1] < 0.4, c_tl
    assert c_tr[1] > 0.6 and c_tr[0] < 0.4, c_tr
    assert c_bl[2] > 0.6, c_bl
    assert c_br[0] > 0.6 and c_br[1] > 0.6 and c_br[2] < 0.4, c_br


def test_transparent_sorted_after_opaque():
    """A transparent quad in FRONT drawn after the opaque one behind it:
    blending must see the opaque color (back-to-front transparent pass,
    reference src/CKSceneGraph.cpp:618-752)."""
    ctx, rm, rc, cam = setup_scene()

    def quad(name, z, mat):
        q = CK3dObject(ctx, name)
        m = CKMesh(ctx, name + "m")
        m.SetPositions(np.array(
            [[-1, -1, z], [1, -1, z], [1, 1, z], [-1, 1, z]], np.float32))
        m.SetFaces(np.array([[0, 2, 1], [0, 3, 2]], np.int32))
        m.BuildNormals()
        m.ApplyGlobalMaterial(mat)
        q.SetCurrentMesh(m)
        return q

    opaque_mat = CKMaterial(ctx, "op")
    opaque_mat.SetEmissive((0.0, 1.0, 0.0, 1.0))
    opaque_mat.SetDiffuse((0, 0, 0, 1))
    opaque_mat.SetAmbient((0, 0, 0, 1))

    glass_mat = CKMaterial(ctx, "glass")
    glass_mat.SetEmissive((1.0, 0.0, 0.0, 1.0))
    glass_mat.SetDiffuse((0, 0, 0, 0.5))
    glass_mat.SetAmbient((0, 0, 0, 1))
    glass_mat.EnableAlphaBlend(True)
    glass_mat.SetSourceBlend(int(VXBLEND.SRCALPHA))
    glass_mat.SetDestBlend(int(VXBLEND.INVSRCALPHA))

    # Transparent quad in front (z=0), opaque behind (z=1). Creation order puts
    # the glass first in the stream; the sort must still draw it last.
    quad("glass", 0.0, glass_mat)
    quad("wall", 1.0, opaque_mat)

    rc.SetBackgroundColor((0, 0, 0, 1))
    rc.Render()
    c = rc.framebuffer()[64, 64]
    # 0.5*red + 0.5*green expected.
    assert c[0] > 0.3 and c[1] > 0.3, c


def test_fog_linear():
    ctx, rm, rc, cam = setup_scene()
    cube = CK3dObject(ctx, "cube")
    mesh = make_cube(ctx)
    mat = CKMaterial(ctx, "white")
    mat.SetEmissive((1.0, 1.0, 1.0, 1.0))
    mesh.ApplyGlobalMaterial(mat)
    cube.SetCurrentMesh(mesh)

    rc.SetFogMode(3)  # LINEAR
    rc.SetFogStart(0.0)
    rc.SetFogEnd(4.0)
    rc.SetFogColor((0.0, 0.0, 1.0, 1.0))
    rc.Render()
    c = rc.framebuffer()[64, 64]
    # Cube at ~2.5 units depth with fog end 4 => heavily fogged toward blue.
    assert c[2] > 0.4, c
    assert c[0] < 0.9, c


def test_stats_and_process():
    ctx, rm, rc, cam = setup_scene()
    cube = CK3dObject(ctx, "cube")
    mesh = make_cube(ctx)
    cube.SetCurrentMesh(mesh)
    rm.Process()
    st = rc.GetStats()
    assert st.NbTrianglesDrawn == 12
    assert st.NbVerticesProcessed >= 8
    assert st.FrameTime > 0


def test_pick():
    ctx, rm, rc, cam = setup_scene()
    cube = CK3dObject(ctx, "cube")
    mesh = make_cube(ctx)
    cube.SetCurrentMesh(mesh)
    rc.Render()
    ent, dist = rc.Pick(64, 64)
    assert ent is cube
    assert 2.0 < dist < 3.0
    ent2, _ = rc.Pick(2, 2)
    assert ent2 is None


def test_hierarchy_moves_children():
    ctx, rm, rc, cam = setup_scene()
    parent = CK3dObject(ctx, "parent")
    child = CK3dObject(ctx, "child")
    mesh = make_cube(ctx)
    mat = CKMaterial(ctx, "white")
    mat.SetEmissive((1, 1, 1, 1))
    mesh.ApplyGlobalMaterial(mat)
    child.SetCurrentMesh(mesh)
    child.SetParent(parent)

    rc.Render()
    assert rc.framebuffer()[64, 64, 0] > 0.9
    # Move the PARENT far right: child must follow off-center.
    parent.SetPosition((10.0, 0.0, 0.0))
    rc.Render()
    assert rc.framebuffer()[64, 64, 0] < 0.1
