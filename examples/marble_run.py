"""Marble-run demo: a specular marble follows a TCB curve through two rooms
connected by a portal (automatic portal culling on), tracked by a target
camera — the Ballance-style usage pattern.

Run:  python examples/marble_run.py [--frames 12] [--size 384] [--out /tmp]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ckrenderengine_tpu.objects import (       # noqa: E402
    CK3dObject, CKCamera, CKContext, CKCurve, CKLight, CKMaterial, CKMesh,
    CKPlace, CKTargetCamera, CKTexture,
)
from ckrenderengine_tpu.raster.types import VXLIGHT  # noqa: E402


def make_sphere(rows, cols, radius):
    th = np.linspace(0, np.pi, rows + 1)
    ph = np.linspace(0, 2 * np.pi, cols, endpoint=False)
    T, P = np.meshgrid(th, ph, indexing="ij")
    pts = np.stack([radius * np.sin(T) * np.cos(P), radius * np.cos(T),
                    radius * np.sin(T) * np.sin(P)], -1).reshape(-1, 3)
    faces = []
    for r in range(rows):
        for c in range(cols):
            a, b = r * cols + c, r * cols + (c + 1) % cols
            d, e = (r + 1) * cols + c, (r + 1) * cols + (c + 1) % cols
            faces += [[a, d, b], [b, d, e]]
    return pts.astype(np.float32), np.asarray(faces, np.int32)


def floor_quad(ctx, name, center, size, mat):
    mesh = CKMesh(ctx, f"{name}m")
    cx, cz = center
    s = size
    mesh.SetPositions(np.array(
        [[cx - s, 0, cz - s], [cx + s, 0, cz - s],
         [cx + s, 0, cz + s], [cx - s, 0, cz + s]], np.float32))
    mesh.SetFaces(np.array([[0, 2, 1], [0, 3, 2]], np.int32))
    mesh.SetUVs(np.array([[0, 0], [4, 0], [4, 4], [0, 4]], np.float32))
    mesh.BuildNormals()
    mesh.ApplyGlobalMaterial(mat)
    obj = CK3dObject(ctx, name)
    obj.SetCurrentMesh(mesh)
    return obj


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--size", type=int, default=384)
    ap.add_argument("--out", default="/tmp")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    ctx = CKContext()
    rm = ctx.GetRenderManager()
    rc = rm.CreateRenderContext(args.size, args.size)

    tex = CKTexture(ctx, "checker")
    img = (np.indices((16, 16)).sum(0) % 2).astype(np.float32)
    tex.SetImage(np.stack([img * .4 + .4, img * .35 + .35,
                           img * .3 + .3, np.ones_like(img)], -1))
    fmat = CKMaterial(ctx, "floor")
    fmat.SetTexture(tex)

    # two rooms along +z, portal at the boundary
    room_a = CKPlace(ctx, "roomA")
    floor_quad(ctx, "floorA", (0, 0), 10, fmat).SetParent(room_a)
    room_b = CKPlace(ctx, "roomB")
    floor_quad(ctx, "floorB", (0, 22), 10, fmat).SetParent(room_b)
    door = CK3dObject(ctx, "door")
    dm = CKMesh(ctx, "doorm")
    dm.SetPositions(np.array(
        [[-3, 0, 11], [3, 0, 11], [3, 5, 11], [-3, 5, 11]], np.float32))
    dm.SetFaces(np.zeros((0, 3), np.int32))
    door.SetCurrentMesh(dm)
    room_a.AddPortal(room_b, door)

    # the marble + its path
    pts, faces = make_sphere(14, 20, 1.0)
    mmesh = CKMesh(ctx, "marble")
    mmesh.SetPositions(pts)
    mmesh.SetFaces(faces)
    mmesh.BuildNormals()
    mmat = CKMaterial(ctx, "marblemat")
    mmat.SetDiffuse((0.9, 0.3, 0.15, 1))
    mmat.SetPower(40.0)
    mmesh.ApplyGlobalMaterial(mmat)
    marble = CK3dObject(ctx, "marble")
    marble.SetCurrentMesh(mmesh)
    marble.SetParent(room_a)

    path = CKCurve(ctx, "path")
    for p in [(-6, 1, -6), (5, 1, -2), (-4, 1, 6), (0, 1, 11), (0, 1, 16),
              (4, 1, 22), (-4, 1, 26)]:
        path.AddControlPoint(p)
    path.SetStepCount(120)
    path.SetColor((1, 1, 0.2, 1))

    cam = CKTargetCamera(ctx, "cam")
    cam.SetPosition((0, 9, -16))
    cam.SetTarget(marble)
    cam.SetParent(room_a)
    rc.AttachViewpointToCamera(cam)
    rc.EnablePortalTraversal(True)
    rc.SetBackgroundColor((0.08, 0.09, 0.14, 1))

    sun = CKLight(ctx, "sun")
    sun.SetType(int(VXLIGHT.DIREC))
    sun.SetOrientation((0.4, -1, 0.3))
    sun.SetSpecularFlag(True)

    for f in range(args.frames):
        t = f / max(args.frames - 1, 1)
        pos = path.GetPos(t)
        marble.SetPosition(pos)
        marble.Rotate((0, 0, 1), -0.4)     # rolling spin
        rc.Render()
        p = os.path.join(args.out, f"marble_{f:03d}.png")
        rc.DumpToFile(p)
        print(f"frame {f}: {p} marble at {np.round(pos, 2)}")


if __name__ == "__main__":
    main()
