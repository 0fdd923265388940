"""Demo: a lit, textured, animated scene through the full frame program.

Renders a checker floor, a spinning specular sphere, a skinned two-bone arm
waving under a keyed animation, a chrome-mapped torus section, a billboard,
a HUD text overlay, and a wireframe grid — then writes frames as PNGs.

Run:  python examples/demo_scene.py [--frames 8] [--size 512] [--out /tmp]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ckrenderengine_tpu.objects import (           # noqa: E402
    CK2dEntity, CK3dObject, CKCamera, CKContext, CKLight, CKMaterial, CKMesh,
    CKSprite3D, CKSpriteText, CKTexture,
)
from ckrenderengine_tpu.anim import (              # noqa: E402
    CKANIMATION_LINEAR_POS, CKANIMATION_LINEAR_ROT, CKBodyPart, CKCharacter,
    CKKeyedAnimation, CKObjectAnimation,
)
from ckrenderengine_tpu.raster.types import VXFILL, VXLIGHT  # noqa: E402


def make_sphere(rows, cols, radius):
    th = np.linspace(0, np.pi, rows + 1)
    ph = np.linspace(0, 2 * np.pi, cols, endpoint=False)
    T, P = np.meshgrid(th, ph, indexing="ij")
    pts = np.stack([radius * np.sin(T) * np.cos(P), radius * np.cos(T),
                    radius * np.sin(T) * np.sin(P)], -1).reshape(-1, 3)
    uv = np.stack([P / (2 * np.pi), T / np.pi], -1).reshape(-1, 2)
    faces = []
    for r in range(rows):
        for c in range(cols):
            a, b = r * cols + c, r * cols + (c + 1) % cols
            d, e = (r + 1) * cols + c, (r + 1) * cols + (c + 1) % cols
            faces += [[a, d, b], [b, d, e]]
    return (pts.astype(np.float32), uv.astype(np.float32),
            np.asarray(faces, np.int32))


def build(size):
    ctx = CKContext()
    rm = ctx.GetRenderManager()
    rc = rm.CreateRenderContext(size, size)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0, 2.5, -8))
    cam.SetOrientation((0, -0.2, 1))
    rc.AttachViewpointToCamera(cam)
    rc.SetBackgroundColor((0.08, 0.1, 0.18, 1))
    rc.SetFogMode(3)
    rc.SetFogStart(6.0)
    rc.SetFogEnd(40.0)
    rc.SetFogColor((0.08, 0.1, 0.18))

    # floor
    checker = CKTexture(ctx, "checker")
    img = (np.indices((16, 16)).sum(0) % 2).astype(np.float32)
    checker.SetImage(np.stack([img * .5 + .3] * 3 + [np.ones_like(img)], -1))
    floor_mesh = CKMesh(ctx, "floor")
    floor_mesh.SetPositions(np.array(
        [[-8, 0, -8], [8, 0, -8], [8, 0, 8], [-8, 0, 8]], np.float32))
    floor_mesh.SetFaces(np.array([[0, 2, 1], [0, 3, 2]], np.int32))
    floor_mesh.SetUVs(np.array([[0, 0], [6, 0], [6, 6], [0, 6]], np.float32))
    floor_mesh.BuildNormals()
    fmat = CKMaterial(ctx, "floormat")
    fmat.SetTexture(checker)
    floor_mesh.ApplyGlobalMaterial(fmat)
    CK3dObject(ctx, "floor").SetCurrentMesh(floor_mesh)

    # spinning specular sphere
    pts, uv, faces = make_sphere(16, 24, 1.2)
    smesh = CKMesh(ctx, "sphere")
    smesh.SetPositions(pts)
    smesh.SetUVs(uv)
    smesh.SetFaces(faces)
    smesh.BuildNormals()
    smat = CKMaterial(ctx, "spheremat")
    smat.SetDiffuse((0.9, 0.25, 0.15, 1))
    smat.SetPower(30.0)
    smesh.ApplyGlobalMaterial(smat)
    sphere = CK3dObject(ctx, "sphere")
    sphere.SetCurrentMesh(smesh)
    sphere.SetPosition((-2.5, 1.4, 0))

    # chrome ball (TexGen)
    pts2, uv2, faces2 = make_sphere(12, 18, 0.9)
    cmesh = CKMesh(ctx, "chrome")
    cmesh.SetPositions(pts2)
    cmesh.SetUVs(uv2)
    cmesh.SetFaces(faces2)
    cmesh.BuildNormals()
    env = CKTexture(ctx, "env")
    ramp = np.linspace(0, 1, 32, dtype=np.float32)
    gu, gv = np.meshgrid(ramp, ramp, indexing="ij")
    envimg = np.stack([gu, gv, np.full((32, 32), 0.8, np.float32),
                       np.ones((32, 32), np.float32)], -1)
    env.SetImage(envimg)
    cmat = CKMaterial(ctx, "chromemat")
    cmat.SetTexture(env)
    cmat.SetEmissive((1, 1, 1, 1))
    from ckrenderengine_tpu.objects.material import VXEFFECT_TEXGEN
    from ckrenderengine_tpu.raster.types import TEXGEN_CHROME
    cmat.SetEffect(VXEFFECT_TEXGEN)              # chrome texgen
    cmat.SetEffectParameter(texgen=TEXGEN_CHROME)
    cmesh.ApplyGlobalMaterial(cmat)
    ball = CK3dObject(ctx, "ball")
    ball.SetCurrentMesh(cmesh)
    ball.SetPosition((2.5, 1.2, 0.5))

    # skinned waving arm
    ch = CKCharacter(ctx, "bob")
    root = CKBodyPart(ctx, "shoulder")
    tip = CKBodyPart(ctx, "elbow")
    ch.AddBodyPart(root)
    ch.AddBodyPart(tip)
    root.SetPosition((0, 1.0, 1.5))
    tip.SetPosition((0, 1.2, 0), ref=root)
    apos = np.array([[x * 0.25, y * 1.2, 0] for y in (0, 1, 2)
                     for x in (-1, 1)], np.float32)
    afaces = np.array([[0, 2, 1], [1, 2, 3], [2, 4, 3], [3, 4, 5]], np.int32)
    amesh = CKMesh(ctx, "arm")
    amesh.SetPositions(apos)
    amesh.SetFaces(afaces)
    amesh.BuildNormals()
    amat = CKMaterial(ctx, "armmat")
    amat.SetDiffuse((0.2, 0.7, 0.9, 1))
    amat.SetTwoSided(True)
    amesh.ApplyGlobalMaterial(amat)
    body = CK3dObject(ctx, "armobj")
    body.SetCurrentMesh(amesh)
    body.SetPosition((0, 1.0, 1.5))
    skin = body.CreateSkin()
    skin.SetBoneCount(2)
    for i, b in enumerate((root, tip)):
        bd = skin.GetBoneData(i)
        bd.SetBone(b)
        bd.SetBoneInitialInverseMatrix(np.linalg.inv(b.GetWorldMatrix()))
    skin.SetObjectInitMatrix(body.GetWorldMatrix())
    skin.SetRestPose(apos, amesh.normals)
    for v in range(6):
        skin.SetVertexWeights(v, [0 if v < 4 else 1], [1.0])
    clip = CKKeyedAnimation(ctx, "wave")
    oa = CKObjectAnimation(ctx, "tiptrack")
    oa.Set3dEntity(tip)
    rcn = oa.CreateController(CKANIMATION_LINEAR_ROT)
    for t, ang in ((0, -0.6), (15, 0.6), (30, -0.6)):
        s = np.sin(ang / 2)
        rcn.AddKey(t, (0, 0, s, np.cos(ang / 2)))
    pc = oa.CreateController(CKANIMATION_LINEAR_POS)
    pc.AddKey(0.0, (0, 1.2, 0))
    clip.AddAnimation(oa)
    ch.AddAnimation(clip)
    ch.SetActiveAnimation(clip)

    # wireframe grid
    gmesh = CKMesh(ctx, "wire")
    gmesh.SetPositions(np.array(
        [[-8, 2.5, 8], [8, 2.5, 8], [8, 6, 8], [-8, 6, 8]], np.float32))
    gmesh.SetFaces(np.array([[0, 2, 1], [0, 3, 2]], np.int32))
    gmesh.BuildNormals()
    wmat = CKMaterial(ctx, "wiremat")
    wmat.SetDiffuse((0.2, 0.9, 0.4, 1))
    wmat.SetFillMode(int(VXFILL.WIREFRAME))
    wmat.SetTwoSided(True)
    gmesh.ApplyGlobalMaterial(wmat)
    CK3dObject(ctx, "backwall").SetCurrentMesh(gmesh)

    # billboard
    glow = CKTexture(ctx, "glow")
    yy, xx = np.mgrid[-1:1:32j, -1:1:32j]
    halo = np.clip(1.2 - np.sqrt(xx ** 2 + yy ** 2), 0, 1).astype(np.float32)
    glow.SetImage(np.stack([halo, halo * 0.9, halo * 0.3, halo], -1))
    from ckrenderengine_tpu.raster.types import VXBLEND

    bmat = CKMaterial(ctx, "glowmat")
    bmat.SetTexture(glow)
    bmat.SetEmissive((1, 1, 1, 1))
    bmat.EnableAlphaBlend(True)
    bmat.SetSourceBlend(int(VXBLEND.SRCALPHA))
    bmat.SetDestBlend(int(VXBLEND.INVSRCALPHA))
    bmat.EnableZWrite(False)
    board = CKSprite3D(ctx, "halo")
    board.SetMaterial(bmat)
    board.SetSize((1.6, 1.6))
    board.SetPosition((0, 3.2, 0.5))

    # HUD
    hud = CKSpriteText(ctx, "hud")
    hud.SetSize((200, 20))
    hud.SetText("ckrenderengine_tpu demo")
    hud.SetTextColor((1, 1, 0.2, 1))
    hud.SetPosition((6, 6))

    # lights
    sun = CKLight(ctx, "sun")
    sun.SetType(int(VXLIGHT.DIREC))
    sun.SetOrientation((0.3, -1, 0.5))
    sun.SetSpecularFlag(True)
    fill = CKLight(ctx, "fill")
    fill.SetType(int(VXLIGHT.POINT))
    fill.SetPosition((3, 4, -3))
    fill.SetColor((0.4, 0.5, 1.0, 1))
    fill.SetRange(40)

    return ctx, rc, sphere, ch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--out", default="/tmp")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    ctx, rc, sphere, ch = build(args.size)
    for f in range(args.frames):
        sphere.Rotate((0, 1, 0), 0.25)
        ch.ProcessAnimation(4.0)
        rc.Render()
        path = os.path.join(args.out, f"demo_{f:03d}.png")
        rc.DumpToFile(path)
        s = rc.GetStats()
        print(f"frame {f}: {path}  tris={s.NbTrianglesDrawn} "
              f"frame_ms={s.FrameTime:.1f}")


if __name__ == "__main__":
    main()
