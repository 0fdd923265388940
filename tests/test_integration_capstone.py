"""Capstone integration: a Ballance-style micro-level exercising every major
subsystem in one scene — places with portal clips, a skinned character on a
curve path, billboards, channels, 2D HUD, fog, lights, serialization of the
whole thing, and multi-frame stability."""

import numpy as np
import pytest

from ckrenderengine_tpu.objects import (
    CK2dEntity, CK3dObject, CKCamera, CKContext, CKCurve, CKLight,
    CKMaterial, CKMesh, CKPlace, CKSprite3D, CKSpriteText, CKTexture,
)
from ckrenderengine_tpu.anim import (
    CKANIMATION_LINEAR_POS, CKBodyPart, CKCharacter, CKKeyedAnimation,
    CKObjectAnimation,
)
from ckrenderengine_tpu.raster.types import VXBLEND, VXLIGHT


def build_level(ctx, size=96):
    rm = ctx.GetRenderManager()
    rc = rm.CreateRenderContext(size, size)
    cam = CKCamera(ctx, "cam")
    cam.SetPosition((0, 3, -10))
    cam.SetOrientation((0, -0.2, 1))
    rc.AttachViewpointToCamera(cam)
    rc.SetFogMode(3)
    rc.SetFogStart(5.0)
    rc.SetFogEnd(60.0)

    # room (place) with a floor; the place clips to the left half
    room = CKPlace(ctx, "room")
    floor_mesh = CKMesh(ctx, "floorm")
    floor_mesh.SetPositions(np.array(
        [[-6, 0, -6], [6, 0, -6], [6, 0, 6], [-6, 0, 6]], np.float32))
    floor_mesh.SetFaces(np.array([[0, 2, 1], [0, 3, 2]], np.int32))
    floor_mesh.SetUVs(np.array([[0, 0], [4, 0], [4, 4], [0, 4]], np.float32))
    floor_mesh.BuildNormals()
    tex = CKTexture(ctx, "check")
    img = (np.indices((8, 8)).sum(0) % 2).astype(np.float32)
    tex.SetImage(np.stack([img] * 3 + [np.ones_like(img)], -1))
    fmat = CKMaterial(ctx, "floormat")
    fmat.SetTexture(tex)
    floor_mesh.ApplyGlobalMaterial(fmat)
    floor = CK3dObject(ctx, "floor")
    floor.SetCurrentMesh(floor_mesh)
    floor.SetParent(room)

    # second place + portal
    hall = CKPlace(ctx, "hall")
    portal = CK3dObject(ctx, "door")
    room.AddPortal(hall, portal)

    # skinned character
    ch = CKCharacter(ctx, "bob")
    root = CKBodyPart(ctx, "hips")
    arm = CKBodyPart(ctx, "arm")
    ch.AddBodyPart(root)
    ch.AddBodyPart(arm)
    ch.SetPosition((0, 1, 0))
    apos = np.array([[c * 0.4, r * 0.8, 0] for r in (0, 1, 2)
                     for c in (-1, 1)], np.float32)
    afaces = np.array([[0, 2, 1], [1, 2, 3], [2, 4, 3], [3, 4, 5]], np.int32)
    amesh = CKMesh(ctx, "armm")
    amesh.SetPositions(apos)
    amesh.SetFaces(afaces)
    amesh.BuildNormals()
    amat = CKMaterial(ctx, "armmat")
    amat.SetDiffuse((0.2, 0.7, 0.9, 1))
    amat.SetTwoSided(True)
    amesh.ApplyGlobalMaterial(amat)
    body = CK3dObject(ctx, "body")
    body.SetCurrentMesh(amesh)
    body.SetPosition((0, 1, 0))
    skin = body.CreateSkin()
    skin.SetBoneCount(2)
    for i, b in enumerate((root, arm)):
        bd = skin.GetBoneData(i)
        bd.SetBone(b)
        bd.SetBoneInitialInverseMatrix(np.linalg.inv(b.GetWorldMatrix()))
    skin.SetObjectInitMatrix(body.GetWorldMatrix())
    skin.SetRestPose(apos, amesh.normals)
    for v in range(6):
        skin.SetVertexWeights(v, [0 if v < 4 else 1], [1.0])
    clip = CKKeyedAnimation(ctx, "walk")
    oa = CKObjectAnimation(ctx, "armtrack")
    oa.Set3dEntity(arm)
    pc = oa.CreateController(CKANIMATION_LINEAR_POS)
    pc.AddKey(0.0, (0, 0.8, 0))
    pc.AddKey(10.0, (0.5, 1.2, 0))
    clip.AddAnimation(oa)
    ch.AddAnimation(clip)
    ch.SetActiveAnimation(clip)

    # curve path
    path = CKCurve(ctx, "path")
    for p in [(-4, 0.1, -4), (0, 0.1, 0), (4, 0.1, -2)]:
        path.AddControlPoint(p)
    path.SetColor((1, 1, 0, 1))

    # billboard + channel
    glow = CKTexture(ctx, "glow")
    halo = np.ones((8, 8, 4), np.float32) * 0.8
    glow.SetImage(halo)
    bmat = CKMaterial(ctx, "bmat")
    bmat.SetTexture(glow)
    bmat.SetEmissive((1, 1, 1, 1))
    bmat.EnableAlphaBlend(True)
    bmat.SetSourceBlend(int(VXBLEND.SRCALPHA))
    bmat.SetDestBlend(int(VXBLEND.INVSRCALPHA))
    board = CKSprite3D(ctx, "halo")
    board.SetMaterial(bmat)
    board.SetSize((1.2, 1.2))
    board.SetPosition((2, 2, 0))

    cmat = CKMaterial(ctx, "chanmat")
    cmat.SetEmissive((0.2, 0.4, 0, 1))
    cmat.SetTwoSided(True)
    ci = floor_mesh.AddChannel(cmat)
    floor_mesh.SetChannelSourceBlend(ci, int(VXBLEND.ONE))
    floor_mesh.SetChannelDestBlend(ci, int(VXBLEND.ONE))

    hud = CKSpriteText(ctx, "hud")
    hud.SetSize((80, 14))
    hud.SetText("LEVEL 1")
    hud.SetTextColor((1, 1, 1, 1))
    hud.SetPosition((4, 4))

    sun = CKLight(ctx, "sun")
    sun.SetType(int(VXLIGHT.DIREC))
    sun.SetOrientation((0.3, -1, 0.4))
    return rc, ch, room


class TestCapstone:
    def test_level_renders_and_animates(self):
        ctx = CKContext()
        rc, ch, room = build_level(ctx)
        frames = []
        for _ in range(3):
            ch.ProcessAnimation(4.0)
            rc.Render()
            frames.append(rc.framebuffer().copy())
        assert frames[0].sum() > 0
        assert np.abs(frames[1] - frames[0]).sum() > 0.5   # animation moves px
        # place clip restricts drawing when set
        full_cov = (frames[-1][..., 3] > 0).sum()
        room.ViewportClip((0, 0, 48, 96))
        rc.Render()
        clipped_cov = (rc.framebuffer()[..., 3] > 0).sum()
        assert clipped_cov < full_cov

    def test_level_roundtrips_through_serialization(self, tmp_path):
        ctx = CKContext()
        rc, ch, room = build_level(ctx)
        ch.ProcessAnimation(4.0)
        rc.Render()
        fb1 = rc.framebuffer().copy()
        p = str(tmp_path / "level.ck")
        n = ctx.Save(p)
        assert n > 10

        ctx2 = CKContext()
        ctx2.Load(p)
        rm2 = ctx2.GetRenderManager()
        rc2 = rm2.CreateRenderContext(96, 96)
        rc2.AttachViewpointToCamera(ctx2.GetObjectByName("cam"))
        rc2.SetFogMode(3)
        rc2.SetFogStart(5.0)
        rc2.SetFogEnd(60.0)
        rc2.Render()
        fb2 = rc2.framebuffer()
        # scenes match closely (billboards/lights/skin state all restored)
        assert np.abs(fb2 - fb1).mean() < 0.02
